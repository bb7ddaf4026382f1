"""Fused decoder tail (MCAB unpooling + SwiGLU MLP + NB-head logit) as Pallas
TPU kernels, forward and backward.

The VAE decoder's hot path applies, for every (batch, gene) pair at
G ≈ 17k genes: cross-attention of the gene query into the 16 latent tokens,
the residual SwiGLU MLP, and the NB head's mu projection
(nn/layers.py::CrossAttentionBlock + nn/heads.py, reference layers.py:267-333
+ stochastic_layers.py:76-121). In XLA this materializes the (B, G, E)
activation tensor in HBM a dozen times (profiled at ~26 ms/step of the 50 ms
VAE train step at reference shapes). Here each (gene-tile × batch-tile) block
runs the whole chain in VMEM and only the (B, G) head logits ever reach HBM.

Multi-head attention is restructured into two single-contraction matmuls so
the MXU sees K=E and K=H·M instead of K=head_dim=8 (tiny-K matmuls measured
~2x slower end to end):

    scores: all heads at once via a block-diagonal key layout
        kfull[b, h·M+m, :] = k_h[b, m] embedded in head h's column block
        S[b] = kfull[b] @ qp^T          (K = E)
    output: per-(head, token) value rows pre-projected through W_proj
        vproj[b, h·M+m, :] = v_h[b, m] @ Wproj_h
        y[b] = softmax_m(S)^T-contracted with vproj[b]   (K = H·M)

Both kfull and vproj are built OUTSIDE the kernel from the tiny (B, M, E)
k/v tensors (see ``build_attention_operands``), so their gradients compose
with XLA autodiff; the kernel's custom VJP recomputes the forward per tile
(flash-attention style — no saved residuals) and accumulates dqp/dq across
batch tiles and dkfull/dvproj/dweights across gene tiles.

A second algebraic fusion exploits that the kernel's only output is the
head logit: the SwiGLU down projection contracts immediately with the head's
mu vector, so ``wv = wmlp @ wmu`` (Hd,) replaces the (Hd, E) matmul and the
(.., E) MLP output tensor entirely:

    logit = wmu . h + (silu(h_n w1) * (h_n w2)) . wv + bmu

Weight layout (see ``pack_weights``):
    ln2g/ln2b (1, E)    affine LN of the MLP branch
    w12 (E, 2·Hd)       SwiGLU up projections, concatenated [w1 | w2]
    wv (1, Hd)          wmlp @ wmu — fused down-projection+head vector
    wmu (1, E), bmu (1, 1)   NB head mu projection (bias=True in the head)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WEIGHT_NAMES = ("ln2g", "ln2b", "w12", "wv", "wmu", "bmu")


def _tail_math(qp, q, kfull, vproj, weights, eps: float, scale: float, n_head: int):
    """Math of the decoder tail for one (gene-tile, batch-tile) block.

    qp (Gt, E)          normalized+projected queries (batch-shared)
    q  (Gt, E)          raw queries (residual base, batch-shared)
    kfull (Bt, HM, E)   block-diagonal per-head keys
    vproj (Bt, HM, E)   Wproj-projected per-head values
    -> logits (Bt, Gt) f32
    """
    ln2g, ln2b, w12, wv, wmu, bmu = weights
    Gt, E = q.shape
    Bt, HM, _ = kfull.shape
    M = HM // n_head
    Hd2 = w12.shape[1]
    bf = jnp.bfloat16

    s = jax.lax.dot_general(
        kfull.astype(bf).reshape(Bt * HM, E), qp.astype(bf),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (Bt*HM, Gt)
    p = jax.nn.softmax(s.reshape(Bt * n_head, M, Gt) * scale, axis=1)
    y = jax.lax.dot_general(
        p.reshape(Bt, HM, Gt).astype(bf), vproj.astype(bf),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )  # (Bt, Gt, E)

    h = q[None].astype(jnp.float32) + y
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    hn = (h - mean) * jax.lax.rsqrt(var + eps)
    hn = hn * ln2g.astype(jnp.float32) + ln2b.astype(jnp.float32)

    ab = jnp.dot(
        hn.reshape(Bt * Gt, E).astype(bf), w12.astype(bf),
        preferred_element_type=jnp.float32,
    )
    a, b = ab[:, : Hd2 // 2], ab[:, Hd2 // 2 :]
    g3 = (jax.nn.silu(a) * b).reshape(Bt, Gt, Hd2 // 2)
    mlp_logit = jnp.sum(g3 * wv.astype(jnp.float32)[None], axis=-1)

    logits = (
        jnp.sum(h * wmu.astype(jnp.float32)[None], axis=-1)
        + mlp_logit
        + bmu[0, 0].astype(jnp.float32)
    )
    return logits  # (Bt, Gt)


def _fwd_kernel(qp_ref, q_ref, k_ref, v_ref, *rest, eps, scale, n_head):
    *w_refs, o_ref = rest
    weights = [r[...] for r in w_refs]
    o_ref[...] = _tail_math(
        qp_ref[...], q_ref[...], k_ref[...], v_ref[...], weights, eps, scale, n_head
    )


def _bwd_kernel(qp_ref, q_ref, k_ref, v_ref, *rest, eps, scale, n_head):
    (
        ln2g_ref, ln2b_ref, w12_ref, wv_ref, wmu_ref, bmu_ref,
        dy_ref,
        dqp_ref, dq_ref, dk_ref, dv_ref,
        dln2g_ref, dln2b_ref, dw12_ref, dwv_ref, dwmu_ref, dbmu_ref,
    ) = rest
    weights = [
        r[...] for r in (ln2g_ref, ln2b_ref, w12_ref, wv_ref, wmu_ref, bmu_ref)
    ]

    def f(qp, q, k, v, *ws):
        return _tail_math(qp, q, k, v, ws, eps, scale, n_head)

    _, vjp = jax.vjp(f, qp_ref[...], q_ref[...], k_ref[...], v_ref[...], *weights)
    grads = vjp(dy_ref[...])

    gi, bi = pl.program_id(0), pl.program_id(1)
    first_b = bi == 0  # dq/dqp blocks are revisited across the inner batch loop
    first_all = jnp.logical_and(gi == 0, first_b)

    def accum(ref, g, first):
        @pl.when(first)
        def _():
            ref[...] = g.astype(ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _():
            ref[...] = ref[...] + g.astype(ref.dtype)

    accum(dqp_ref, grads[0], first_b)
    accum(dq_ref, grads[1], first_b)
    # dk/dv: full (B,...) buffers resident across the whole grid; each step
    # touches only its batch-tile rows
    Bt = k_ref.shape[0]

    @pl.when(first_all)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    row = pl.ds(bi * Bt, Bt)
    dk_ref[row] = dk_ref[row] + grads[2].astype(dk_ref.dtype)
    dv_ref[row] = dv_ref[row] + grads[3].astype(dv_ref.dtype)

    dw_refs = (dln2g_ref, dln2b_ref, dw12_ref, dwv_ref, dwmu_ref, dbmu_ref)
    for ref, g in zip(dw_refs, grads[4:]):
        accum(ref, g, first_all)


def build_attention_operands(
    k: jax.Array,  # (B, M, E) cross-attention keys
    v: jax.Array,  # (B, M, E) cross-attention values
    wproj: jax.Array,  # (E, E) attention output projection
    n_head: int,
) -> Tuple[jax.Array, jax.Array]:
    """(kfull, vproj) for the kernel's two-matmul attention (see module doc).

    Cheap XLA ops over (B, M, E) tensors — differentiable, so d(wproj) and
    dk/dv compose with the kernel's custom VJP."""
    B, M, E = k.shape
    hd = E // n_head
    k4 = k.reshape(B, M, n_head, hd).transpose(0, 2, 1, 3)  # (B, H, M, hd)
    v4 = v.reshape(B, M, n_head, hd).transpose(0, 2, 1, 3)
    eye = jnp.eye(n_head, dtype=k.dtype)
    # kfull[b, hM+m, h'hd+d] = k4[b,h,m,d] * eye[h,h']
    kfull = (k4[:, :, :, None, :] * eye[None, :, None, :, None]).reshape(
        B, n_head * M, E
    )
    wproj_r = wproj.reshape(n_head, hd, E)
    vproj = jnp.einsum("bhmd,hde->bhme", v4, wproj_r).reshape(B, n_head * M, E)
    return kfull, vproj


def pack_weights(
    ln2_scale: jax.Array,  # (E,)
    ln2_bias: jax.Array,  # (E,)
    w1: jax.Array,  # (E, Hd)
    w2: jax.Array,  # (E, Hd)
    wmlp: jax.Array,  # (Hd, E)
    wmu: jax.Array,  # (E, 1)
    bmu: jax.Array,  # (1,)
) -> Tuple[jax.Array, ...]:
    """Kernel weight tuple. Differentiable: gradients flow back through the
    concat and the wv = wmlp @ wmu contraction to the original parameters."""
    E = w1.shape[0]
    wv = (wmlp @ wmu.reshape(E, 1)).reshape(1, -1)  # (1, Hd)
    return (
        ln2_scale.reshape(1, E),
        ln2_bias.reshape(1, E),
        jnp.concatenate([w1, w2], axis=1),
        wv,
        wmu.reshape(1, E),
        bmu.reshape(1, 1),
    )


from scldm_tpu.ops.tiling import pad_axis as _pad_axis  # shared tiling arithmetic


# Largest batch the backward kernel compiles at with the batch-aware tiles
# below: Mosaic's scoped-VMEM stack grows with the bwd tile area and (weakly,
# via the full-resident dk/dv accumulators) with batch. B=512 at dentate
# shapes exceeds the limit even at the smallest swept tiles (90.6 MB asked
# vs 72.3 MB, v5e 2026-08-18); B=256 compiles and runs at (512, 8).
# Dispatchers must route B > MAX_FUSED_BATCH to the module path.
MAX_FUSED_BATCH = 256


def default_bwd_tiles(n_genes: int, batch: int) -> Tuple[int, int]:
    """(bwd_block_g, bwd_block_b) per shape, from the round-4 v5e sweep
    (benchmarks/tune_fused_tail.py over {dentate, parse1m} x {128, 256} x
    five tile configs, REVALIDATION round 4):

      - B > 128: only (512, 8) compiles everywhere ((1024, 8) and any bb=16
        exceed scoped VMEM at B=256: 65.8-114.2 MB asked vs 64 MB);
        measured 102.8 ms dentate / 46.8 ms parse1m fwd+bwd — better per
        cell than B=128 in isolation.
      - B <= 128, wide gene axis: (512, 16) beats the old (1024, 8) default
        61.2 vs 67.2 ms at dentate (17k genes).
      - B <= 128, narrow gene axis: (1024, 8) stays best (41.4 vs 51.9 ms
        for (512, 16) at parse1m's 2k genes).
    """
    if batch > 128:
        return (512, 8)
    if n_genes > 4096:
        return (512, 16)
    return (1024, 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def fused_decoder_tail(
    qp: jax.Array,  # (G, E) normalized+projected queries
    q: jax.Array,  # (G, E) raw queries
    kfull: jax.Array,  # (B, H*M, E) from build_attention_operands
    vproj: jax.Array,  # (B, H*M, E)
    weights: Tuple[jax.Array, ...],  # pack_weights order
    n_head: int = 4,
    eps: float = 1e-8,
    block_g: int = 512,
    block_b: int = 16,
    bwd_block_g: int = 1024,  # swept on v5e: 15.9 ms vs 17.3 at (256,8); 2048 fails compile
    bwd_block_b: int = 8,  # sublane dim of the (Bt, Gt) dy block: must be 8k
    interpret: bool = False,
) -> jax.Array:
    """Decoder tail -> NB-head mu logits (B, G) f32, Pallas fwd + bwd."""
    return _fwd(qp, q, kfull, vproj, weights, n_head, eps, block_g, block_b, interpret)


def _fwd(qp, q, kfull, vproj, weights, n_head, eps, block_g, block_b, interpret):
    G, E = qp.shape
    B, HM, _ = kfull.shape
    hd = E // n_head
    scale = 1.0 / (hd**0.5)
    bg, bb = min(block_g, G), min(block_b, B)
    qp_p = _pad_axis(qp, 0, bg)
    q_p = _pad_axis(q, 0, bg)
    k_p = _pad_axis(kfull, 0, bb)
    v_p = _pad_axis(vproj, 0, bb)
    Gp, Bp = qp_p.shape[0], k_p.shape[0]

    full = lambda a: pl.BlockSpec(a.shape, lambda g, b: (0,) * a.ndim, memory_space=pltpu.VMEM)
    gtile = pl.BlockSpec((bg, E), lambda g, b: (g, 0), memory_space=pltpu.VMEM)
    btile = pl.BlockSpec((bb, HM, E), lambda g, b: (b, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, scale=scale, n_head=n_head),
        out_shape=jax.ShapeDtypeStruct((Bp, Gp), jnp.float32),
        grid=(Gp // bg, Bp // bb),  # gene tiles outer: qp/q stay resident
        in_specs=[gtile, gtile, btile, btile, *[full(w) for w in weights]],
        out_specs=pl.BlockSpec((bb, bg), lambda g, b: (b, g), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp_p, q_p, k_p, v_p, *weights)
    return out[:B, :G]


def _fused_fwd(qp, q, kfull, vproj, weights, n_head, eps, block_g, block_b,
               bwd_block_g, bwd_block_b, interpret):
    out = _fwd(qp, q, kfull, vproj, weights, n_head, eps, block_g, block_b, interpret)
    return out, (qp, q, kfull, vproj, weights)


def _fused_bwd(n_head, eps, block_g, block_b, bwd_block_g, bwd_block_b, interpret,
               res, dy):
    qp, q, kfull, vproj, weights = res
    G, E = qp.shape
    B, HM, _ = kfull.shape
    hd = E // n_head
    scale = 1.0 / (hd**0.5)
    bg, bb = min(bwd_block_g, G), min(bwd_block_b, B)
    qp_p = _pad_axis(qp, 0, bg)
    q_p = _pad_axis(q, 0, bg)
    k_p = _pad_axis(kfull, 0, bb)
    v_p = _pad_axis(vproj, 0, bb)
    dy_p = _pad_axis(_pad_axis(dy, 0, bb), 1, bg)  # zero rows -> zero cotangents
    Gp, Bp = qp_p.shape[0], k_p.shape[0]

    full = lambda a: pl.BlockSpec(a.shape, lambda g, b: (0,) * a.ndim, memory_space=pltpu.VMEM)
    gtile = pl.BlockSpec((bg, E), lambda g, b: (g, 0), memory_space=pltpu.VMEM)
    btile = pl.BlockSpec((bb, HM, E), lambda g, b: (b, 0, 0), memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((Gp, E), jnp.float32),  # dqp
        jax.ShapeDtypeStruct((Gp, E), jnp.float32),  # dq
        jax.ShapeDtypeStruct(k_p.shape, jnp.float32),  # dkfull
        jax.ShapeDtypeStruct(v_p.shape, jnp.float32),  # dvproj
        *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, scale=scale, n_head=n_head),
        out_shape=out_shapes,
        grid=(Gp // bg, Bp // bb),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[
            gtile, gtile, btile, btile,
            *[full(w) for w in weights],
            pl.BlockSpec((bb, bg), lambda g, b: (b, g), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            gtile, gtile, full(k_p), full(v_p), *[full(w) for w in weights],
        ),
        interpret=interpret,
    )(qp_p, q_p, k_p, v_p, *weights, dy_p)
    dqp, dq, dk, dv, *dws = outs
    dweights = tuple(g.astype(w.dtype) for g, w in zip(dws, weights))
    return (
        dqp[:G].astype(qp.dtype),
        dq[:G].astype(q.dtype),
        dk[:B].astype(kfull.dtype),
        dv[:B].astype(vproj.dtype),
        dweights,
    )


fused_decoder_tail.defvjp(_fused_fwd, _fused_bwd)
