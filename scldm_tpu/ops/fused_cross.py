"""Flash cross-attention for many-query / few-KV attention (decoder unpool).

The VAE decoder's cross block attends G ≈ 36k gene queries into M = 64 latent
tokens (census config; reference layers.py:229-264 + 267-333). XLA's einsum
attention materializes the (B, H, G, M) scores AND probs tensors in HBM
(~1.2 GB f32 each at census shapes) between three batched small-K matmuls.
This kernel streams gene-query tiles through VMEM: scores and probs live only
in registers/VMEM, and only the (B, G, E) attention output reaches HBM.

TPU-native restructuring: per-head matmuls at head_dim = 64 leave the MXU
half-idle (K = N = 64), so the kernel computes ALL heads per tile with two
block-diagonal single-contraction matmuls (same trick as ops/fused_decoder.py,
built outside the kernel so XLA differentiates the layout):

    kblk[b, h*hd+d, h*M+m] = k[b, m, h*hd+d]     scores:  s = qp @ kblk   (K=E)
    vblk[b, h*M+m, h*hd+d] = v[b, m, h*hd+d]     output:  y = p  @ vblk   (K=H*M)

That is 8x the per-head attention FLOPs at census (E = 8*hd) — but attention
here is ~1% of the step's FLOPs, and the dense (bg, 512) @ (512, 512) matmuls
run at full MXU clip while the HBM round-trips disappear.

Backward: the full (B, S, E)-free recompute-VJP was measured a LOSS for wide
attention chains whose activations fit HBM (ROADMAP #flash) — and the
block-diagonal layout would 8x every backward matmul too. So the custom VJP
replays plain XLA attention (jax.vjp of the einsum reference): identical math
and performance to what autodiff would produce for the module path, paying one
extra scores matmul to rebuild probs. The kernel only accelerates the forward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_blockdiag_operands(
    k: jax.Array,  # (B, M, E) projected keys
    v: jax.Array,  # (B, M, E) projected values
    n_head: int,
) -> Tuple[jax.Array, jax.Array]:
    """(kblk (B, E, H*M), vblk (B, H*M, E)) for the two-matmul attention."""
    B, M, E = k.shape
    hd = E // n_head
    k4 = k.reshape(B, M, n_head, hd)
    v4 = v.reshape(B, M, n_head, hd)
    eye = jnp.eye(n_head, dtype=k.dtype)
    # kblk[b, h'*hd+d, h*M+m] = k4[b, m, h, d] * eye[h, h']
    kblk = jnp.einsum("bmhd,gh->bgdhm", k4, eye).reshape(B, E, n_head * M)
    # vblk[b, h*M+m, h'*hd+d] = v4[b, m, h, d] * eye[h, h']
    vblk = jnp.einsum("bmhd,hg->bhmgd", v4, eye).reshape(B, n_head * M, E)
    return kblk, vblk


def _attn_reference(qp: jax.Array, k: jax.Array, v: jax.Array, n_head: int) -> jax.Array:
    """Plain XLA attention, bit-matching ops/attention.sdpa_shared_q on the
    pre-projected operands; the VJP the backward replays."""
    G, E = qp.shape
    B, M, _ = k.shape
    hd = E // n_head
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    q4 = qp.reshape(G, n_head, hd)
    k4 = k.reshape(B, M, n_head, hd)
    v4 = v.reshape(B, M, n_head, hd)
    s = jnp.einsum("ghd,bmhd->bhgm", q4, k4, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    y = jnp.einsum("bhgm,bmhd->bghd", p.astype(v.dtype), v4)
    return y.reshape(B, G, E)


def _fwd_kernel(qp_ref, kblk_ref, vblk_ref, y_ref, *, scale, n_head, bt):
    bf = jnp.bfloat16
    qp = qp_ref[...].astype(bf)  # (bg, E)
    bg, E = qp.shape
    HM = kblk_ref.shape[2]
    M = HM // n_head
    for b in range(bt):
        s = jnp.dot(
            qp, kblk_ref[b].astype(bf), preferred_element_type=jnp.float32
        )  # (bg, H*M)
        # per-head softmax over each M-lane block via static lane slices
        # (Mosaic cannot shape-cast (bg, H*M) -> (bg, H, M) in-kernel)
        parts = []
        for h in range(n_head):
            sh = s[:, h * M : (h + 1) * M] * scale
            e = jnp.exp(sh - jnp.max(sh, axis=-1, keepdims=True))
            parts.append(e / jnp.sum(e, axis=-1, keepdims=True))
        p = jnp.concatenate(parts, axis=-1)  # (bg, H*M)
        y = jnp.dot(
            p.astype(bf), vblk_ref[b].astype(bf),
            preferred_element_type=jnp.float32,
        )  # (bg, E)
        y_ref[b] = y.astype(y_ref.dtype)


def _flash_fwd_impl(qp, k, v, n_head, block_g, block_b, interpret):
    G, E = qp.shape
    B, M, _ = k.shape
    hd = E // n_head
    scale = 1.0 / (hd**0.5)
    kblk, vblk = build_blockdiag_operands(
        k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), n_head
    )
    HM = n_head * M
    bg, bb = min(block_g, G), min(block_b, B)
    # no explicit padding: Pallas masks the ragged last tile itself, and an
    # explicit pad would cost a full (B, G, E) out-slice copy (~1.2 GB at
    # census shapes). Ragged-tile garbage stays within its own query rows
    # (each softmax row is independent) and is dropped on the masked store.
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_head=n_head, bt=bb),
        out_shape=jax.ShapeDtypeStruct((B, G, E), v.dtype),
        grid=(pl.cdiv(G, bg), pl.cdiv(B, bb)),  # gene tiles outer: qp resident
        in_specs=[
            pl.BlockSpec((bg, E), lambda g, b: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, E, HM), lambda g, b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, HM, E), lambda g, b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, bg, E), lambda g, b: (b, g, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qp, kblk, vblk)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_cross_attention(
    qp: jax.Array,  # (G, E) projected batch-shared queries
    k: jax.Array,  # (B, M, E) projected keys
    v: jax.Array,  # (B, M, E) projected values
    n_head: int,
    block_g: int = 1024,
    block_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """softmax(qp_h k_h^T / sqrt(hd)) v_h, concat over heads -> (B, G, E).

    Forward is the Pallas tile kernel; backward replays the XLA einsum
    attention (see module docstring for why)."""
    return _flash_fwd_impl(qp, k, v, n_head, block_g, block_b, interpret)


def _flash_fwd(qp, k, v, n_head, block_g, block_b, interpret):
    y = _flash_fwd_impl(qp, k, v, n_head, block_g, block_b, interpret)
    return y, (qp, k, v)


def _flash_bwd(n_head, block_g, block_b, interpret, res, dy):
    qp, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _attn_reference(a, b, c, n_head), qp, k, v)
    dqp, dk, dv = vjp(dy.astype(v.dtype))
    return dqp.astype(qp.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_cross_attention.defvjp(_flash_fwd, _flash_bwd)
