"""Pallas TPU flash attention (no mask, non-causal — the reference's
FlexAttention is always full attention with score_mod="noop", layers.py:18-20).

Streaming-softmax attention over key/value blocks: scores never materialize in
HBM, the running (max, sum, accumulator) state lives in VMEM scratch. Built for
the long gene-token axes of this model family (S up to ~36k when configs opt
into self-attention over gene tokens); the `sdpa` dispatcher in
scldm_tpu.ops.attention routes short sequences to plain XLA attention instead.

Layout: q (B, M, H, D), k/v (B, S, H, D) -> out (B, M, H, D). Internally heads
fold into the batch grid axis; head_dim pads to the 128-lane tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, kv_len: int, block_kv: int, scale: float, n_kv: int,
):
    """One (batch*head, q_block, kv_block) program. The kv axis is the
    innermost (sequential) grid dimension, so only ONE (block_kv, D) k/v tile
    is VMEM-resident at a time — true streaming, VMEM footprint independent
    of S. The running softmax state (m, l, acc) persists in VMEM scratch
    across the kv steps of each q block."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr[...], _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr[...])
        acc_scr[...] = jnp.zeros_like(acc_scr[...])

    q = q_ref[0].astype(jnp.float32) * scale  # (BM, D)
    k = k_ref[0].astype(jnp.float32)  # (BK, D)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BM, BK)
    # mask padded tail keys of the last block
    kv_ids = j * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kv_ids < kv_len, s, _NEG_INF)

    m_prev = m_scr[...][:, :1]  # lanes hold copies; column 0 is the value
    l_prev = l_scr[...][:, :1]
    acc = acc_scr[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)

    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[...] = acc_new

    @pl.when(j == n_kv - 1)
    def _():
        o_ref[0] = (acc_new / l_new).astype(o_ref.dtype)


from scldm_tpu.ops.tiling import round_up as _round_up  # shared tiling arithmetic


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    block_kv: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T / sqrt(D)) v with streaming softmax in VMEM.

    Shapes: q (B, M, H, D), k/v (B, S, H, D) -> (B, M, H, D).
    """
    B, M, H, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D**0.5)

    # fold heads into batch: (B*H, seq, D)
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, M, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)

    # pad to TPU tiles: lanes 128 on D, sublane-multiples on seq
    Dp = _round_up(max(D, 128), 128)
    bq = min(block_q, _round_up(M, 8))
    Mp = _round_up(M, bq)
    bkv = min(block_kv, _round_up(S, 128))
    Sp = _round_up(S, bkv)
    qf = jnp.pad(qf, ((0, 0), (0, Mp - M), (0, Dp - D)))
    kf = jnp.pad(kf, ((0, 0), (0, Sp - S), (0, Dp - D)))
    vf = jnp.pad(vf, ((0, 0), (0, Sp - S), (0, Dp - D)))

    n_kv = Sp // bkv
    grid = (B * H, Mp // bq, n_kv)  # kv innermost: sequential, scratch carries
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, kv_len=S, block_kv=bkv, scale=scale, n_kv=n_kv
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Mp, Dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, Dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, Dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, Dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # m (running max; lanes = copies)
            pltpu.VMEM((bq, 128), jnp.float32),  # l (running denominator)
            pltpu.VMEM((bq, Dp), jnp.float32),  # acc (unnormalized output)
        ],
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :M, :D].reshape(B, H, M, D).transpose(0, 2, 1, 3)
    return out
