"""Fused encoder pooling (input embedding + MCAB attention) as Pallas TPU
kernels, forward and backward — gather/scatter-free.

The VAE encoder embeds each expressed gene token (embedding-table gather over
(B, S) indices), then one MCAB cross-attention pools the S tokens into 16
latent queries (nn/layers.py::CrossAttentionBlock with inducing points;
reference nnets.py:81-144, layers.py:267-333). On TPU the gather and its
scatter-add backward dominate (profiled ~8.5 ms/step of 40 at reference
shapes): XLA's row-gather of (B·S) 32-wide rows runs at ~20 GB/s and the
backward scatter-add is worse.

This kernel removes the gather entirely by working in the DENSE gene axis:
with the ``log1p`` count transform, a token with count 0 has embedding
exactly 0 (table row × log1p(0)), so the attention contribution of every
zero-count position is one shared closed form. Attention over the packed
S-window (nnz expressed genes + (S - nnz) zero padding rows) equals attention
over ALL G genes (nnz expressed + (G - nnz) zero rows) minus exactly
``G - S`` zero-row contributions — independent of nnz:

    out_i = (num_i - (G-S)·e^{s0_i - m_i}·v0) / (den_i - (G-S)·e^{s0_i - m_i})

where s0/v0 are the score/value of a zero-embedding row (nonzero because the
pre-attention LayerNorm is affine: ln(0) = bias) — computed in plain jnp
outside. The kernel streams counts (B, G) tile by tile, builds the embedding
in VMEM (table row × log1p(count) — table rows align with the gene axis, no
indices), applies the per-token LN, projects k/v, and accumulates
flash-attention-style online-max (m, den, num) per (batch row, query).

Query layout uses the same block-diagonal trick as ops/fused_decoder.py:
qfull (Q·H, E) holds each head's projected query in its head column block, so
scores for all heads are one K=E matmul.

The backward kernel uses the flash decomposition: out = num/den with
cotangents dnum = dout/den and dden = -(Σ_e dout·out)/den; per tile,
(num_tile, den_tile) are plain sums given the saved row max m, so one
in-kernel jax.vjp accumulates dtable across batch tiles and dWk/dWv/dqfull/dln
across everything. counts are data (never differentiated) — the backward
returns a symbolic zero for them and computes nothing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WEIGHT_NAMES = ("ln1g", "ln1b", "wk", "wv")


def _ln_kv_scores(x, qfull, weights, eps: float, scale: float):
    """LN -> k/v projection -> per-head scores for one (batch, token) tile —
    the math both pooling variants share (their only difference upstream is
    how the (bt, t, E) embedding tile is built).

    x (bt, t, E) f32 -> (s (bt, t, QH) scaled scores, v (bt, t, E)). All
    matmuls run on the (bt*t)-row folded axis so the MXU sees one large GEMM
    per projection instead of bt skinny ones."""
    ln1g, ln1b, wk, wv = weights
    bf = jnp.bfloat16
    bt, t, E = x.shape
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    x = x * ln1g.astype(jnp.float32).reshape(1, 1, E) + ln1b.astype(
        jnp.float32
    ).reshape(1, 1, E)
    x2 = x.reshape(bt * t, E)
    k = jnp.dot(x2.astype(bf), wk.astype(bf), preferred_element_type=jnp.float32)
    v = jnp.dot(x2.astype(bf), wv.astype(bf), preferred_element_type=jnp.float32)
    s = jax.lax.dot_general(
        k.astype(bf), qfull.astype(bf), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bt*t, QH)
    return s.reshape(bt, t, -1) * scale, v.reshape(bt, t, E)


def _online_update(m_ref, den_ref, num_ref, s, v, bt: int):
    """Streaming-softmax accumulate of one tile's (scores, values) into the
    per-batch (m, den, num) carries (flash decomposition: out = num/den)."""
    bf = jnp.bfloat16
    for b in range(bt):
        sb = s[b]  # (t, QH)
        m_old = m_ref[b]
        m_new = jnp.maximum(m_old, jnp.max(sb, axis=0))
        e = jnp.exp(sb - m_new[None, :])
        den = jnp.sum(e, axis=0)  # (QH,)
        num = jax.lax.dot_general(
            e.astype(bf), v[b].astype(bf), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (QH, E)
        alpha = jnp.exp(m_old - m_new)  # 0 when m_old = -inf
        den_ref[b] = den_ref[b] * alpha + den
        num_ref[b] = num_ref[b] * alpha[:, None] + num
        m_ref[b] = m_new


def _numden_given_m(s, v, m_ref, bt: int):
    """One tile's (num, den) given the FORWARD's saved row max: with m fixed
    the per-tile contributions are plain sums, so this is the function whose
    in-kernel jax.vjp yields the backward (no max recomputation)."""
    bf = jnp.bfloat16
    nums, dens = [], []
    for b in range(bt):
        e = jnp.exp(s[b] - m_ref[b][None, :])
        dens.append(jnp.sum(e, axis=0))
        nums.append(
            jax.lax.dot_general(
                e.astype(bf), v[b].astype(bf), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.stack(nums), jnp.stack(dens)


def _accum(ref, g, first):
    """Initialize-or-add a gradient block revisited across grid steps."""

    @pl.when(first)
    def _():
        ref[...] = g.astype(ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        ref[...] = ref[...] + g.astype(ref.dtype)


def _tile_fold(counts, table, qfull, weights, eps: float, scale: float):
    """Dense-variant tile: build the embedding from (counts, table) — token
    embedding = table row x log1p(count), rows aligned with the gene axis so
    no gather — then the shared fold.

    counts (bt, Gt) f32, table (Gt, E) -> (s (bt, Gt, QH), v (bt, Gt, E))."""
    emb = table.astype(jnp.float32)[None] * jnp.log1p(
        counts.astype(jnp.float32)
    )[:, :, None]
    return _ln_kv_scores(emb, qfull, weights, eps, scale)


def _fwd_kernel(
    counts_ref, table_ref, qfull_ref, ln1g_ref, ln1b_ref, wk_ref, wv_ref,
    m_ref, den_ref, num_ref,
    *, eps, scale, bt,
):
    gi = pl.program_id(1)
    weights = (ln1g_ref[...], ln1b_ref[...], wk_ref[...], wv_ref[...])

    @pl.when(gi == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        den_ref[...] = jnp.zeros_like(den_ref)
        num_ref[...] = jnp.zeros_like(num_ref)

    s, v = _tile_fold(
        counts_ref[...], table_ref[...], qfull_ref[...], weights, eps, scale
    )
    _online_update(m_ref, den_ref, num_ref, s, v, bt)


def _bwd_kernel(
    counts_ref, table_ref, qfull_ref, ln1g_ref, ln1b_ref, wk_ref, wv_ref,
    m_ref, dnum_ref, dden_ref,
    dtable_ref, dqfull_ref, dln1g_ref, dln1b_ref, dwk_ref, dwv_ref,
    *, eps, scale, bt,
):
    gi, bi = pl.program_id(0), pl.program_id(1)
    weights = tuple(
        r[...].astype(jnp.float32) for r in (ln1g_ref, ln1b_ref, wk_ref, wv_ref)
    )
    qfull = qfull_ref[...].astype(jnp.float32)
    table = table_ref[...].astype(jnp.float32)

    def f(table, qfull, *ws):
        s, v = _tile_fold(counts_ref[...], table, qfull, ws, eps, scale)
        return _numden_given_m(s, v, m_ref, bt)

    _, vjp = jax.vjp(f, table, qfull, *weights)
    dtable, dqfull, dln1g, dln1b, dwk, dwv = vjp(
        (dnum_ref[...].astype(jnp.float32), dden_ref[...].astype(jnp.float32))
    )

    first_b = bi == 0  # dtable blocks are revisited across the inner batch loop
    first_all = jnp.logical_and(gi == 0, first_b)

    _accum(dtable_ref, dtable, first_b)
    for ref, g in zip(
        (dqfull_ref, dln1g_ref, dln1b_ref, dwk_ref, dwv_ref),
        (dqfull, dln1g, dln1b, dwk, dwv),
    ):
        _accum(ref, g, first_all)


from scldm_tpu.ops.tiling import pad_axis as _pad_axis  # shared tiling arithmetic


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_encoder_pool(
    counts: jax.Array,  # (B, G) dense counts — data, never differentiated
    table: jax.Array,  # (G, E) gene-embedding rows 1..G (canonical order)
    qfull: jax.Array,  # (Q*H, E) block-diagonal per-head projected queries
    weights: Tuple[jax.Array, ...],  # (ln1g (1,E), ln1b (1,E), wk (E,E), wv (E,E))
    scale: float,
    eps: float = 1e-8,
    block_g: int = 1024,
    block_b: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dense flash pooling -> (num (B, QH, E), den (B, QH), m (B, QH)).

    Caller applies the zero-row correction and num/den division (plain jnp)."""
    return _fwd(counts, table, qfull, weights, scale, eps, block_g, block_b, interpret)


def _fwd(counts, table, qfull, weights, scale, eps, block_g, block_b, interpret):
    B, G = counts.shape
    QH, E = qfull.shape
    bg, bb = min(block_g, G), min(block_b, B)
    counts_p = _pad_axis(_pad_axis(counts, 1, bg), 0, bb)
    # padded gene rows: table row 0 + count 0 -> zero contribution? No: a
    # zero TABLE row with count 0 gives emb=0, same closed form as real zero
    # rows — they inflate the zero-row count deterministically, so pad the
    # gene axis BEFORE computing the correction: caller passes padded G via
    # `g_padded` bookkeeping. We instead keep it exact by padding table with
    # zero rows and letting the caller subtract (Gp - S) zero contributions.
    table_p = _pad_axis(table, 0, bg)
    Bp, Gp = counts_p.shape

    full = lambda a: pl.BlockSpec(a.shape, lambda b, g: (0,) * a.ndim, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, scale=scale, bt=bb),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, QH), jnp.float32),  # m
            jax.ShapeDtypeStruct((Bp, QH), jnp.float32),  # den
            jax.ShapeDtypeStruct((Bp, QH, E), jnp.float32),  # num
        ),
        grid=(Bp // bb, Gp // bg),  # batch outer: m/den/num revisited over g
        in_specs=[
            pl.BlockSpec((bb, bg), lambda b, g: (b, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, E), lambda b, g: (g, 0), memory_space=pltpu.VMEM),
            full(qfull),
            *[full(w) for w in weights],
        ],
        out_specs=(
            pl.BlockSpec((bb, QH), lambda b, g: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, QH), lambda b, g: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, QH, E), lambda b, g: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(counts_p, table_p, qfull, *weights)
    m, den, num = outs
    return num[:B], den[:B], m[:B]


def _fused_fwd(counts, table, qfull, weights, scale, eps, block_g, block_b, interpret):
    out = _fwd(counts, table, qfull, weights, scale, eps, block_g, block_b, interpret)
    return out, (counts, table, qfull, weights, out[2])


def _fused_bwd(scale, eps, block_g, block_b, interpret, res, cts):
    counts, table, qfull, weights, m = res
    dnum, dden, _dm = cts  # m is a saved statistic; its cotangent is unused
    B, G = counts.shape
    QH, E = qfull.shape
    bg, bb = min(block_g, G), min(block_b, B)
    counts_p = _pad_axis(_pad_axis(counts, 1, bg), 0, bb)
    table_p = _pad_axis(table, 0, bg)
    m_p = _pad_axis(m, 0, bb)
    dnum_p = _pad_axis(dnum, 0, bb)
    dden_p = _pad_axis(dden, 0, bb)
    Bp, Gp = counts_p.shape

    full = lambda a: pl.BlockSpec(a.shape, lambda g, b: (0,) * a.ndim, memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((Gp, E), jnp.float32),  # dtable
        jax.ShapeDtypeStruct((QH, E), jnp.float32),  # dqfull
        *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, scale=scale, bt=bb),
        out_shape=out_shapes,
        grid=(Gp // bg, Bp // bb),  # gene outer: dtable revisited over b
        in_specs=[
            pl.BlockSpec((bb, bg), lambda g, b: (b, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, E), lambda g, b: (g, 0), memory_space=pltpu.VMEM),
            full(qfull),
            *[full(w) for w in weights],
            pl.BlockSpec((bb, QH), lambda g, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, QH, E), lambda g, b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, QH), lambda g, b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bg, E), lambda g, b: (g, 0), memory_space=pltpu.VMEM),
            full(qfull),
            *[full(w) for w in weights],
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(counts_p, table_p, qfull, *weights, m_p, dnum_p, dden_p)
    dtable, dqfull, *dws = outs
    dweights = tuple(g.astype(w.dtype) for g, w in zip(dws, weights))
    return (
        jnp.zeros_like(counts),  # counts are data; XLA DCEs this
        dtable[:G].astype(table.dtype),
        dqfull.astype(qfull.dtype),
        dweights,
    )


fused_encoder_pool.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# window-input variant: flash pooling over the PACKED token window
# ---------------------------------------------------------------------------
#
# Same math as the dense kernel minus the embedding construction and the
# zero-row correction: the input is the already-gathered (B, S, E) embedding
# window (input_layer output), and padding rows are processed as real tokens —
# exactly what the module MCAB does (it applies no mask; reference
# layers.py:267-333). This is the default-config consumer of the flash
# machinery: the encoder pooling is (q=16, kv=S≈6k), below the standalone
# flash kernel's q-length floor, but fusing LN + k/v projection + streaming
# softmax here beats XLA's materialized attention chain.


def _wtile_fold(emb, qfull, weights, eps: float, scale: float):
    """Window-variant tile: the embedding arrives pre-gathered (input_layer
    output), so the tile IS the shared fold.

    emb (bt, st, E) -> (s (bt, st, QH) scaled scores, v (bt, st, E))"""
    return _ln_kv_scores(emb.astype(jnp.float32), qfull, weights, eps, scale)


def _wfwd_kernel(
    emb_ref, qfull_ref, ln1g_ref, ln1b_ref, wk_ref, wv_ref,
    m_ref, den_ref, num_ref,
    *, eps, scale, bt,
):
    si = pl.program_id(1)
    weights = (ln1g_ref[...], ln1b_ref[...], wk_ref[...], wv_ref[...])

    @pl.when(si == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        den_ref[...] = jnp.zeros_like(den_ref)
        num_ref[...] = jnp.zeros_like(num_ref)

    s, v = _wtile_fold(emb_ref[...], qfull_ref[...], weights, eps, scale)
    _online_update(m_ref, den_ref, num_ref, s, v, bt)


def _wbwd_kernel(
    emb_ref, qfull_ref, ln1g_ref, ln1b_ref, wk_ref, wv_ref,
    m_ref, dnum_ref, dden_ref,
    demb_ref, dqfull_ref, dln1g_ref, dln1b_ref, dwk_ref, dwv_ref,
    *, eps, scale, bt,
):
    si, bi = pl.program_id(0), pl.program_id(1)
    weights = tuple(
        r[...].astype(jnp.float32) for r in (ln1g_ref, ln1b_ref, wk_ref, wv_ref)
    )
    qfull = qfull_ref[...].astype(jnp.float32)

    def f(emb, qfull, *ws):
        s, v = _wtile_fold(emb, qfull, ws, eps, scale)
        return _numden_given_m(s, v, m_ref, bt)

    _, vjp = jax.vjp(f, emb_ref[...].astype(jnp.float32), qfull, *weights)
    demb, dqfull, dln1g, dln1b, dwk, dwv = vjp(
        (dnum_ref[...].astype(jnp.float32), dden_ref[...].astype(jnp.float32))
    )

    demb_ref[...] = demb.astype(demb_ref.dtype)  # each (s, b) block visited once
    first_all = jnp.logical_and(si == 0, bi == 0)
    for ref, g in zip(
        (dqfull_ref, dln1g_ref, dln1b_ref, dwk_ref, dwv_ref),
        (dqfull, dln1g, dln1b, dwk, dwv),
    ):
        _accum(ref, g, first_all)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_window_pool(
    emb: jax.Array,  # (B, S, E) gathered token embeddings (input_layer output)
    qfull: jax.Array,  # (Q*H, E) block-diagonal per-head projected queries
    weights: Tuple[jax.Array, ...],  # (ln1g (1,E), ln1b (1,E), wk (E,E), wv (E,E))
    scale: float,
    eps: float = 1e-8,
    block_s: int = 1024,
    block_b: int = 8,
    bwd_block_s: int = 0,  # 0 = same as block_s; the bwd's VJP recompute
    # roughly doubles the per-tile working set, so census width needs a
    # smaller token tile in backward than forward
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Flash pooling over the packed window -> (num (B,QH,E), den (B,QH), m).

    Window padding rows inside S are processed as real tokens (the module
    path applies no mask — reference layers.py:267-333). The caller subtracts
    only the KERNEL's own (ceil(S/bs)*bs - S) zero-emb pad rows via the same
    closed-form correction as the dense variant, then divides num/den."""
    return _wfwd(emb, qfull, weights, scale, eps, block_s, block_b, interpret)


def _wfwd(emb, qfull, weights, scale, eps, block_s, block_b, interpret):
    B, S, E = emb.shape
    QH = qfull.shape[0]
    bs, bb = min(block_s, S), min(block_b, B)
    # kernel-pad token rows are exactly-zero embeddings; like the dense
    # variant, the caller subtracts their (Sp - S) closed-form contributions
    # (window padding rows inside S are REAL tokens here — the module path
    # processes them too, unmasked)
    emb_p = _pad_axis(_pad_axis(emb, 1, bs), 0, bb)
    Bp, Sp = emb_p.shape[0], emb_p.shape[1]

    full = lambda a: pl.BlockSpec(a.shape, lambda b, s: (0,) * a.ndim, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_wfwd_kernel, eps=eps, scale=scale, bt=bb),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, QH), jnp.float32),  # m
            jax.ShapeDtypeStruct((Bp, QH), jnp.float32),  # den
            jax.ShapeDtypeStruct((Bp, QH, E), jnp.float32),  # num
        ),
        grid=(Bp // bb, Sp // bs),  # batch outer: m/den/num revisited over s
        in_specs=[
            pl.BlockSpec((bb, bs, E), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            full(qfull),
            *[full(w) for w in weights],
        ],
        out_specs=(
            pl.BlockSpec((bb, QH), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, QH), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, QH, E), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(emb_p, qfull, *weights)
    m, den, num = outs
    return num[:B], den[:B], m[:B]


def _wfused_fwd(emb, qfull, weights, scale, eps, block_s, block_b, bwd_block_s,
                interpret):
    out = _wfwd(emb, qfull, weights, scale, eps, block_s, block_b, interpret)
    return out, (emb, qfull, weights, out[2])


def _wfused_bwd(scale, eps, block_s, block_b, bwd_block_s, interpret, res, cts):
    emb, qfull, weights, m = res
    dnum, dden, _dm = cts
    B, S, E = emb.shape
    QH = qfull.shape[0]
    bb = min(block_b, B)
    # The function being differentiated is the FORWARD's: it includes exactly
    # (roundup(S, fwd bs) - S) zero-emb pad rows, whose contributions the
    # caller's closed-form correction (and its autodiff) assumes. The backward
    # must pad the token axis to that SAME length — a different roundup (e.g.
    # bwd_block_s=256 vs block_s=512 with S%512 in [1,256]) silently biases
    # every weight/query gradient by the differing pad rows' vjp terms. The
    # smaller bwd tile then subdivides the forward-padded length; if it
    # doesn't divide it, fall back to the forward tile (correctness first).
    bs_f = min(block_s, S)
    emb_p = _pad_axis(_pad_axis(emb, 1, bs_f), 0, bb)
    bs = min(bwd_block_s or bs_f, emb_p.shape[1])
    if emb_p.shape[1] % bs:
        bs = bs_f
    m_p = _pad_axis(m, 0, bb)
    dnum_p = _pad_axis(dnum, 0, bb)
    dden_p = _pad_axis(dden, 0, bb)
    Bp, Sp = emb_p.shape[0], emb_p.shape[1]

    full = lambda a: pl.BlockSpec(a.shape, lambda s, b: (0,) * a.ndim, memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((Bp, Sp, E), jnp.float32),  # demb
        jax.ShapeDtypeStruct((QH, E), jnp.float32),  # dqfull
        *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
    )
    outs = pl.pallas_call(
        functools.partial(_wbwd_kernel, eps=eps, scale=scale, bt=bb),
        out_shape=out_shapes,
        grid=(Sp // bs, Bp // bb),
        in_specs=[
            pl.BlockSpec((bb, bs, E), lambda s, b: (b, s, 0), memory_space=pltpu.VMEM),
            full(qfull),
            *[full(w) for w in weights],
            pl.BlockSpec((bb, QH), lambda s, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, QH, E), lambda s, b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, QH), lambda s, b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, bs, E), lambda s, b: (b, s, 0), memory_space=pltpu.VMEM),
            full(qfull),
            *[full(w) for w in weights],
        ),
        # the recompute-VJP working set at census width (bb=8, bs=256, E=512)
        # peaks near the 64M default; v5e has 128M of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(emb_p, qfull, *weights, m_p, dnum_p, dden_p)
    demb, dqfull, *dws = outs
    dweights = tuple(g.astype(w.dtype) for g, w in zip(dws, weights))
    return (
        demb[:B, :S].astype(emb.dtype),
        dqfull.astype(qfull.dtype),
        dweights,
    )


fused_window_pool.defvjp(_wfused_fwd, _wfused_bwd)


def build_query_operand(q16: jax.Array, n_head: int) -> jax.Array:
    """qfull (Q·H, E): row (h·Q + i) holds query i's head-h slice in head h's
    column block (zeros elsewhere) — all heads' scores in one K=E matmul."""
    Q, E = q16.shape
    hd = E // n_head
    q4 = q16.reshape(Q, n_head, hd).transpose(1, 0, 2)  # (H, Q, hd)
    eye = jnp.eye(n_head, dtype=q16.dtype)
    return (q4[:, :, None, :] * eye[:, None, :, None]).reshape(n_head * Q, E)
