"""Fused SwiGLU up-projection + gate as a Pallas TPU kernel.

Target (docs/performance.md, census profile): XLA compiles the cross block's
``silu(x@w1) * (x@w2)`` as a matmul-plus-gate fusion that measures ~2.16x the
bare up-projection matmul — the gate's (R, H) f32 intermediates round-trip
HBM. Here each (row-tile x hidden-tile) block computes both partial matmuls
on the MXU and applies the gate while the accumulators are still in VMEM,
writing only the gated bf16 output (reference math: the SwiGLU MLP of
/root/reference/src/scldm/layers.py:161-174; this kernel fuses its first two
Linears + the elementwise gate).

Backward is recompute-style (no saved u1/u2 activations — trades two extra
MXU passes for the (R, H) residual traffic) and is split into two kernels so
each output's accumulation revisits are grid-consecutive:
  - dx:   grid (rows, hidden) with hidden innermost — dx row-tile resident
  - dw:   grid (hidden, rows) with rows innermost  — dw1/dw2 column-tiles resident
Whether the trade wins on v5e is measured by benchmarks/bench_swiglu.py; the
kernel ships opt-in until the measurement says otherwise (see the kernel
ledger's meta-lesson in docs/performance.md).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scldm_tpu.ops.tiling import pad_axis as _pad_axis


def _silu_and_grads(u1, u2, dg):
    """du1, du2 for g = silu(u1) * u2 given upstream dg (all f32)."""
    s = jax.nn.sigmoid(u1)
    silu = u1 * s
    du1 = dg * u2 * (s + silu * (1.0 - s))  # d silu = s*(1 + u1*(1-s))
    du2 = dg * silu
    return du1, du2


def _fwd_kernel(x_ref, w1_ref, w2_ref, out_ref):
    x = x_ref[:]
    u1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    u2 = jnp.dot(x, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (jax.nn.silu(u1) * u2).astype(out_ref.dtype)


def _dx_kernel(x_ref, w1_ref, w2_ref, dg_ref, dx_ref):
    j = pl.program_id(1)
    x = x_ref[:]
    u1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    u2 = jnp.dot(x, w2_ref[:], preferred_element_type=jnp.float32)
    du1, du2 = _silu_and_grads(u1, u2, dg_ref[:].astype(jnp.float32))
    part = jnp.dot(
        du1.astype(x.dtype), w1_ref[:].T, preferred_element_type=jnp.float32
    ) + jnp.dot(du2.astype(x.dtype), w2_ref[:].T, preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dx_ref[:] = part

    @pl.when(j > 0)
    def _():
        dx_ref[:] = dx_ref[:] + part


def _dw_kernel(x_ref, w1_ref, w2_ref, dg_ref, dw1_ref, dw2_ref):
    i = pl.program_id(1)  # row tiles innermost: dw tiles stay resident
    x = x_ref[:]
    u1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    u2 = jnp.dot(x, w2_ref[:], preferred_element_type=jnp.float32)
    du1, du2 = _silu_and_grads(u1, u2, dg_ref[:].astype(jnp.float32))
    p1 = jnp.dot(x.T, du1.astype(x.dtype), preferred_element_type=jnp.float32)
    p2 = jnp.dot(x.T, du2.astype(x.dtype), preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = p1
        dw2_ref[:] = p2

    @pl.when(i > 0)
    def _():
        dw1_ref[:] = dw1_ref[:] + p1
        dw2_ref[:] = dw2_ref[:] + p2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_swiglu_gate(
    x: jax.Array,     # (R, E)
    w1: jax.Array,    # (E, H)
    w2: jax.Array,    # (E, H)
    block_r: int = 512,
    block_h: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """silu(x @ w1) * (x @ w2) in x.dtype, gate applied in VMEM."""
    return _fwd(x, w1, w2, block_r, block_h, interpret)


def _fwd(x, w1, w2, block_r, block_h, interpret):
    R, E = x.shape
    H = w1.shape[1]
    br, bh = min(block_r, R), min(block_h, H)
    x_p = _pad_axis(x, 0, br)
    w1_p = _pad_axis(w1, 1, bh)
    w2_p = _pad_axis(w2, 1, bh)
    Rp, Hp = x_p.shape[0], w1_p.shape[1]

    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, Hp), x.dtype),
        grid=(Rp // br, Hp // bh),
        in_specs=[
            pl.BlockSpec((br, E), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, bh), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_p, w1_p, w2_p)
    return out[:R, :H]


def _fused_fwd(x, w1, w2, block_r, block_h, interpret):
    return _fwd(x, w1, w2, block_r, block_h, interpret), (x, w1, w2)


def _fused_bwd(block_r, block_h, interpret, res, dg):
    x, w1, w2 = res
    R, E = x.shape
    H = w1.shape[1]
    br, bh = min(block_r, R), min(block_h, H)
    x_p = _pad_axis(x, 0, br)
    w1_p = _pad_axis(w1, 1, bh)
    w2_p = _pad_axis(w2, 1, bh)
    dg_p = _pad_axis(_pad_axis(dg, 0, br), 1, bh)
    Rp, Hp = x_p.shape[0], w1_p.shape[1]

    dx = pl.pallas_call(
        _dx_kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, E), jnp.float32),
        grid=(Rp // br, Hp // bh),  # hidden innermost: dx tile resident
        in_specs=[
            pl.BlockSpec((br, E), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, bh), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, E), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_p, w1_p, w2_p, dg_p)

    dw1, dw2 = pl.pallas_call(
        _dw_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((E, Hp), jnp.float32),
            jax.ShapeDtypeStruct((E, Hp), jnp.float32),
        ),
        grid=(Hp // bh, Rp // br),  # rows innermost: dw tiles resident
        in_specs=[
            pl.BlockSpec((br, E), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, bh), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, bh), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, bh), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((E, bh), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, bh), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x_p, w1_p, w2_p, dg_p)

    return (
        dx[:R].astype(x.dtype),
        dw1[:, :H].astype(w1.dtype),
        dw2[:, :H].astype(w2.dtype),
    )


fused_swiglu_gate.defvjp(_fused_fwd, _fused_bwd)


def swiglu_reference(x, w1, w2):
    """Plain XLA formulation (what flax nn.layers.MLP emits pre-down-proj)."""
    u1 = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    u2 = jnp.dot(x, w2, preferred_element_type=jnp.float32)
    return (jax.nn.silu(u1) * u2).astype(x.dtype)


# -- SwiGLU + vector head contraction ------------------------------------------
# The algebraic cross+head tail (training/vae_task.py::_algebraic_tail) folds
# the MLP down projection into the NB head's mu vector, so the gate's only
# consumer is `g @ wv` with wv an (H, 1) VECTOR. XLA's backward then saves the
# (R, 2H) up-projection and (R, H) gate tensors in HBM — 6.1 GB + 2 x 3.1 GB
# at census B=32, the allocations that OOM it (b32 memory analysis, round 4).
# This kernel computes s = (silu(x@w1) * (x@w2)) @ wv per row tile entirely in
# VMEM and recomputes in the backward: nothing (R, H)-shaped ever exists.


def _vec_fwd_kernel(x_ref, w12_ref, wv_ref, out_ref):
    x = x_ref[:]
    u = jnp.dot(x, w12_ref[:], preferred_element_type=jnp.float32)
    H = wv_ref.shape[0]
    g = jax.nn.silu(u[:, :H]) * u[:, H:]
    out_ref[:] = jnp.dot(
        g.astype(x.dtype), wv_ref[:], preferred_element_type=jnp.float32
    )


def _vec_bwd_kernel(x_ref, w12_ref, wv_ref, ds_ref, dx_ref, dw12_ref, dwv_ref):
    i = pl.program_id(0)
    x = x_ref[:]
    u = jnp.dot(x, w12_ref[:], preferred_element_type=jnp.float32)
    H = wv_ref.shape[0]
    u1, u2 = u[:, :H], u[:, H:]
    s = jax.nn.sigmoid(u1)
    silu = u1 * s
    g = silu * u2
    ds = ds_ref[:].astype(jnp.float32)  # (br, 1)
    dg = ds * wv_ref[:].astype(jnp.float32).T  # (br, H)
    du1 = dg * u2 * (s + silu * (1.0 - s))
    du2 = dg * silu
    du = jnp.concatenate([du1, du2], axis=1).astype(x.dtype)  # (br, 2H)
    dx_ref[:] = jnp.dot(du, w12_ref[:].T, preferred_element_type=jnp.float32)
    p_w12 = jnp.dot(x.T, du, preferred_element_type=jnp.float32)
    p_wv = jnp.dot(
        g.astype(x.dtype).T, ds.astype(x.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(i == 0)
    def _():
        dw12_ref[:] = p_w12
        dwv_ref[:] = p_wv

    @pl.when(i > 0)
    def _():
        dw12_ref[:] = dw12_ref[:] + p_w12
        dwv_ref[:] = dwv_ref[:] + p_wv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def swiglu_vec(
    x: jax.Array,    # (R, E)
    w12: jax.Array,  # (E, 2H) — w1 | w2 concatenated
    wv: jax.Array,   # (H, 1) — folded down-proj @ head vector
    block_r: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """(silu(x @ w1) * (x @ w2)) @ wv -> (R, 1) f32, gate never in HBM."""
    return _vec_fwd(x, w12, wv, block_r, interpret)


def _vec_fwd(x, w12, wv, block_r, interpret):
    R, E = x.shape
    br = min(block_r, R)
    x_p = _pad_axis(x, 0, br)
    Rp = x_p.shape[0]
    out = pl.pallas_call(
        _vec_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
        grid=(Rp // br,),
        in_specs=[
            pl.BlockSpec((br, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w12.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wv.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_p, w12, wv)
    return out[:R]


def _vec_fused_fwd(x, w12, wv, block_r, interpret):
    return _vec_fwd(x, w12, wv, block_r, interpret), (x, w12, wv)


def _vec_fused_bwd(block_r, interpret, res, ds):
    x, w12, wv = res
    R, E = x.shape
    br = min(block_r, R)
    x_p = _pad_axis(x, 0, br)
    ds_p = _pad_axis(ds, 0, br)  # zero rows -> zero cotangents
    Rp = x_p.shape[0]
    dx, dw12, dwv = pl.pallas_call(
        _vec_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Rp, E), jnp.float32),
            jax.ShapeDtypeStruct(w12.shape, jnp.float32),
            jax.ShapeDtypeStruct(wv.shape, jnp.float32),
        ),
        # the recompute temporaries (u/du/dg/g, ~20 MB f32 at br=512, H=1408)
        # exceed Mosaic's 16 MB default scoped-vmem budget; 64 MB matches the
        # decoder-tail kernel's setting and fits v5e
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        grid=(Rp // br,),
        in_specs=[
            pl.BlockSpec((br, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w12.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wv.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w12.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wv.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x_p, w12, wv, ds_p)
    return (
        dx[:R].astype(x.dtype),
        dw12.astype(w12.dtype),
        dwv.astype(wv.dtype),
    )


swiglu_vec.defvjp(_vec_fused_fwd, _vec_fused_bwd)


def swiglu_vec_reference(x, w12, wv):
    """Plain XLA formulation of the same contraction (equivalence target)."""
    u = jnp.dot(x, w12, preferred_element_type=jnp.float32)
    H = wv.shape[0]
    g = jax.nn.silu(u[:, :H]) * u[:, H:]
    return jnp.dot(g.astype(x.dtype), wv, preferred_element_type=jnp.float32)
