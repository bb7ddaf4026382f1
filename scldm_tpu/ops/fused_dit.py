"""Fused adaLN-zero DiT block as a single Pallas TPU kernel.

Profiling the CFG sampler shows the DiT forward is bound by the elementwise
adaLN chain (LN -> modulate -> gate -> residual, twice per block): each block
makes ~30 HBM round-trips over the activation tensor. This kernel computes one
whole Block (nn/layers.py::Block with use_adaln=True, elementwise_affine=False
— the DiT configuration) per grid step with everything resident in VMEM:

    mod  = silu(c) @ W_ada + b_ada                 (6E modulation)
    h    = modulate(LN(x), mod) ; attn over the (tiny) token axis
    x    = x + gate_a * attn ; h2 = modulate(LN(x), mod)
    x    = x + gate_m * SwiGLU(h2)

Activations load once and store once per block. Forward-only (sampling is the
hot consumer); training keeps the XLA path. Equivalence-tested against the
flax Block in tests/test_fused_dit.py.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x: jax.Array, eps: float) -> jax.Array:
    """Non-affine layernorm over the last dim, f32 math."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


#: fused-kernel weight ordering (biases pre-reshaped to (1, dim))
WEIGHT_NAMES = ("wada", "bada", "wqkv", "bqkv", "wproj", "bproj", "w1", "w2", "wmlp")


def _block_math(x, c, weights, n_head: int, eps: float):
    """Pure f32 math of one adaLN-zero Block — shared by the forward kernel and
    the backward kernel (which differentiates it via in-kernel jax.vjp)."""
    wada, bada, wqkv, bqkv, wproj, bproj, w1, w2, wmlp = [
        w.astype(jnp.float32) for w in weights
    ]
    R, T, E = x.shape
    x = x.astype(jnp.float32)
    c = c.astype(jnp.float32)

    mod = jax.nn.silu(c) @ wada + bada
    # chunk roles follow the reference's swapped-modulate quirk (its
    # layers.py:146-153, preserved in nn/layers.py::Block): chunk 0 multiplies,
    # chunk 1 shifts.
    scale_a, shift_a, gate_a, scale_m, shift_m, gate_m = jnp.split(mod, 6, axis=-1)

    # -- attention branch ---------------------------------------------------
    h = _ln(x, eps) * (1.0 + scale_a[:, None, :]) + shift_a[:, None, :]
    qkv = h.reshape(R * T, E) @ wqkv + bqkv
    hd = E // n_head
    scale = 1.0 / hd**0.5
    # Mosaic-friendly attention: only 2-D column slices, leading-dim reshapes,
    # and 3-D batched matmuls (batch over rows). n_head/static -> unrolled.
    batched_qk = (((2,), (2,)), ((0,), (0,)))  # contract hd, batch R
    batched_pv = (((2,), (1,)), ((0,), (0,)))  # contract S, batch R
    head_outs = []
    for hidx in range(n_head):
        qh = qkv[:, hidx * hd : (hidx + 1) * hd].reshape(R, T, hd)
        kh = qkv[:, E + hidx * hd : E + (hidx + 1) * hd].reshape(R, T, hd)
        vh = qkv[:, 2 * E + hidx * hd : 2 * E + (hidx + 1) * hd].reshape(R, T, hd)
        s = jax.lax.dot_general(qh, kh, batched_qk, preferred_element_type=jnp.float32)
        ph = jax.nn.softmax(s * scale, axis=-1)  # (R, T, T)
        head_outs.append(
            jax.lax.dot_general(ph, vh, batched_pv, preferred_element_type=jnp.float32)
        )
    attn = jnp.concatenate([o.reshape(R * T, hd) for o in head_outs], axis=-1)
    attn = attn @ wproj + bproj
    x = x + gate_a[:, None, :] * attn.reshape(R, T, E)

    # -- MLP branch (SwiGLU, no biases) ---------------------------------------
    h2 = _ln(x, eps) * (1.0 + scale_m[:, None, :]) + shift_m[:, None, :]
    h2f = h2.reshape(R * T, E)
    a = h2f @ w1
    b = h2f @ w2
    mlp = (jax.nn.silu(a) * b) @ wmlp
    return x + gate_m[:, None, :] * mlp.reshape(R, T, E)


def _block_kernel(
    x_ref, c_ref,
    wada_ref, bada_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    w1_ref, w2_ref, wmlp_ref,
    o_ref,
    *, n_head: int, eps: float,
):
    weights = [
        r[...] for r in (
            wada_ref, bada_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            w1_ref, w2_ref, wmlp_ref,
        )
    ]
    # c rides as (br, 1, E): 3-D blocks keep the row dim free of the
    # (8, 128) last-two-dims tiling constraint at small row blocks
    out = _block_math(x_ref[...], c_ref[...][:, 0, :], weights, n_head, eps)
    o_ref[...] = out.astype(o_ref.dtype)


def _block_bwd_kernel(
    x_ref, c_ref,
    wada_ref, bada_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    w1_ref, w2_ref, wmlp_ref,
    dy_ref,
    dx_ref, dc_ref,
    dwada_ref, dbada_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
    dw1_ref, dw2_ref, dwmlp_ref,
    *, n_head: int, eps: float,
):
    """Backward of one block, entirely in VMEM: jax.vjp traces the shared
    _block_math inside the kernel, so every residual stays on-chip. Weight
    grads accumulate across the row-block grid (init on step 0)."""
    weights = [
        r[...].astype(jnp.float32) for r in (
            wada_ref, bada_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            w1_ref, w2_ref, wmlp_ref,
        )
    ]

    def f(x, c, *ws):
        return _block_math(x, c, ws, n_head, eps)

    _, vjp = jax.vjp(
        f, x_ref[...].astype(jnp.float32),
        c_ref[...][:, 0, :].astype(jnp.float32), *weights,
    )
    grads = vjp(dy_ref[...].astype(jnp.float32))
    dx_ref[...] = grads[0].astype(dx_ref.dtype)
    dc_ref[...] = grads[1][:, None, :].astype(dc_ref.dtype)

    first = pl.program_id(0) == 0
    dw_refs = (
        dwada_ref, dbada_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
        dw1_ref, dw2_ref, dwmlp_ref,
    )
    for ref, g in zip(dw_refs, grads[2:]):
        @pl.when(first)
        def _(ref=ref, g=g):
            ref[...] = g.astype(ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, g=g):
            ref[...] = ref[...] + g.astype(ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "eps", "block_rows", "interpret"))
def fused_dit_block(
    x: jax.Array,  # (R, T, E)
    c: jax.Array,  # (R, E) conditioning (t_embedding rows)
    params: Dict[str, jax.Array],
    n_head: int,
    eps: float = 1e-8,
    block_rows: int | None = None,  # None = auto-sized to the ~16M VMEM scoped stack
    interpret: bool = False,
) -> jax.Array:
    R, T, E = x.shape
    if block_rows is None:
        # working set scales with block_rows*T; 64 rows validated at T=16
        block_rows = max(1, 1024 // T)
    br = min(block_rows, R)
    pad = (-R) % br
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        c = jnp.pad(c, ((0, pad), (0, 0)))
    Rp = x.shape[0]
    c = c[:, None, :]  # (Rp, 1, E): row dim free of the (8,128) tiling rule

    hidden = params["w1"].shape[1]
    # biases as (1, dim) for friendly TPU tiling
    weights = [
        params["wada"],
        params["bada"].reshape(1, -1),
        params["wqkv"],
        params["bqkv"].reshape(1, -1),
        params["wproj"],
        params["bproj"].reshape(1, -1),
        params["w1"],
        params["w2"],
        params["wmlp"],
    ]
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_block_kernel, n_head=n_head, eps=eps),
        out_shape=jax.ShapeDtypeStruct((Rp, T, E), x.dtype),
        grid=(Rp // br,),
        in_specs=[
            pl.BlockSpec((br, T, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[full(a) for a in weights],
        ],
        out_specs=pl.BlockSpec((br, T, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, c, *weights)
    return out[:R]


def _bwd_pallas(x, c, params, dy, n_head, eps, block_rows, interpret):
    R, T, E = x.shape
    if block_rows is None:
        # the in-kernel vjp's residual stack scales with block_rows*T; 16 rows
        # validated at T=16 (the reference LDM seq_len); T=64 (census latent)
        # needs 4 to stay under the 16M scoped-vmem limit
        block_rows = max(1, 256 // T)
    br = min(block_rows, R)
    pad = (-R) % br
    if pad:  # zero-padded rows contribute zero cotangents
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        c = jnp.pad(c, ((0, pad), (0, 0)))
        dy = jnp.pad(dy, ((0, pad), (0, 0), (0, 0)))
    Rp = x.shape[0]
    c = c[:, None, :]  # (Rp, 1, E): see fused_dit_block
    weights = [
        params["wada"], params["bada"].reshape(1, -1),
        params["wqkv"], params["bqkv"].reshape(1, -1),
        params["wproj"], params["bproj"].reshape(1, -1),
        params["w1"], params["w2"], params["wmlp"],
    ]
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    row3 = pl.BlockSpec((br, T, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    row2 = pl.BlockSpec((br, 1, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((Rp, T, E), x.dtype),   # dx
        jax.ShapeDtypeStruct((Rp, 1, E), c.dtype),   # dc
        *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
    )
    outs = pl.pallas_call(
        functools.partial(_block_bwd_kernel, n_head=n_head, eps=eps),
        out_shape=out_shapes,
        grid=(Rp // br,),
        in_specs=[row3, row2, *[full(w) for w in weights], row3],
        out_specs=(row3, row2, *[full(w) for w in weights]),
        # the in-kernel vjp's weight-grad working set is fixed (~E*hidden
        # terms) regardless of row block; the 16M scoped-stack default is
        # ~1M short at E=256/T=64, so raise the cap (v5e has 128M VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, c, *weights, dy)
    dx, dc, *dws = outs
    dparams = {
        name: (g.reshape(params[name].shape)).astype(params[name].dtype)
        for name, g in zip(WEIGHT_NAMES, dws)
    }
    return dx[:R], dc[:R, 0], dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_dit_block_trainable(
    x, c, params, n_head, eps=1e-8, block_rows=None, bwd_block_rows=None, interpret=False
):
    """Differentiable fused block: Pallas forward AND backward kernels
    (gradients verified against jax.grad of the flax Block)."""
    return fused_dit_block(
        x, c, params, n_head, eps=eps, block_rows=block_rows, interpret=interpret
    )


def _trainable_fwd(x, c, params, n_head, eps, block_rows, bwd_block_rows, interpret):
    out = fused_dit_block(
        x, c, params, n_head, eps=eps, block_rows=block_rows, interpret=interpret
    )
    return out, (x, c, params)


def _trainable_bwd(n_head, eps, block_rows, bwd_block_rows, interpret, res, dy):
    x, c, params = res
    dx, dc, dparams = _bwd_pallas(
        x, c, params, dy, n_head, eps, bwd_block_rows, interpret
    )
    return dx, dc, dparams


fused_dit_block_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def fused_dit_forward(
    params: Dict,
    x: jax.Array,  # (R, T, E_in)
    t: jax.Array,  # (R,)
    cond_vals: Dict[str, jax.Array],  # name -> (R,) int ids (nulls included)
    *,
    n_layer: int,
    n_head: int,
    n_embed: int,
    seq_len: int,
    eps: float = 1e-8,
    interpret: bool = False,
) -> jax.Array:
    """Full DiT forward over the raw param tree with every block as one Pallas
    kernel. Condition embedding = no-dropout sum over class tables (the
    sampling semantics; see DiT.forward_with_cfg_batched). Equivalence-tested
    against the flax module."""
    from scldm_tpu.nn.layers import TimestepEmbedder, get_1d_sincos_pos_embed

    p = params["params"] if "params" in params else params

    def dense(tree, h):
        out = h @ tree["kernel"].astype(jnp.float32)
        if "bias" in tree:
            out = out + tree["bias"].astype(jnp.float32)
        return out

    # timestep embedding MLP
    t_freq = TimestepEmbedder.timestep_embedding(t, 256)
    t_emb = dense(p["t_embedder"]["mlp_2"], jax.nn.silu(dense(p["t_embedder"]["mlp_0"], t_freq)))
    # class-embedding sum (null rows hit the null token's row)
    for name, vals in cond_vals.items():
        table = p[f"class_embedding_{name}"]["embedding"].astype(jnp.float32)
        t_emb = t_emb + table[vals.astype(jnp.int32)]

    h = dense(p["input_proj"], x.astype(jnp.float32))
    h = h + jnp.asarray(get_1d_sincos_pos_embed(n_embed, seq_len))[None]

    h = h.astype(x.dtype)
    c = t_emb.astype(x.dtype)
    for i in range(n_layer):
        kp = extract_block_params(p[f"block_{i}"])
        h = fused_dit_block(h, c, kp, n_head=n_head, eps=eps, interpret=interpret)

    # final layer: adaLN shift/scale + non-affine LN + linear (zero-init)
    fl = p["final_layer"]
    mod = dense(fl["adaln_modulation"], jax.nn.silu(t_emb))
    shift, scale = jnp.split(mod, 2, axis=-1)
    hf = _ln(h.astype(jnp.float32), eps) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    return dense(fl["linear"], hf).astype(jnp.float32)


def fused_dit_train_apply(
    params: Dict,
    x: jax.Array,  # (R, T, E_in)
    t_embedding: jax.Array,  # (R, E) from DiT.embed_condition (rng-correct)
    *,
    n_layer: int,
    n_head: int,
    n_embed: int,
    seq_len: int,
    eps: float = 1e-8,
    block_rows: int | None = None,  # None = auto-sized by seq_len (VMEM stack)
    bwd_block_rows: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable DiT trunk with every block as a fused Pallas kernel
    (forward + backward). Input proj / positional table / final layer are plain
    jnp on the raw param tree so autodiff composes with the blocks' custom VJP.
    """
    from scldm_tpu.nn.layers import get_1d_sincos_pos_embed

    p = params["params"] if "params" in params else params

    def dense(tree, h):
        out = h @ tree["kernel"].astype(jnp.float32)
        if "bias" in tree:
            out = out + tree["bias"].astype(jnp.float32)
        return out

    h = dense(p["input_proj"], x.astype(jnp.float32))
    h = h + jnp.asarray(get_1d_sincos_pos_embed(n_embed, seq_len))[None]
    c = t_embedding.astype(jnp.float32)

    for i in range(n_layer):
        kp = extract_block_params(p[f"block_{i}"])
        h = fused_dit_block_trainable(
            h, c, kp, n_head, eps, block_rows, bwd_block_rows, interpret
        )

    fl = p["final_layer"]
    mod = dense(fl["adaln_modulation"], jax.nn.silu(c))
    shift, scale = jnp.split(mod, 2, axis=-1)
    hf = _ln(h, eps) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    return dense(fl["linear"], hf)


def extract_block_params(block_tree: Dict) -> Dict[str, jax.Array]:
    """Pull the fused-kernel weight dict out of one flax Block param subtree."""
    return {
        "wada": block_tree["adaln_modulation"]["kernel"],
        "bada": block_tree["adaln_modulation"]["bias"],
        "wqkv": block_tree["attn"]["c_attn"]["kernel"],
        "bqkv": block_tree["attn"]["c_attn"].get(
            "bias", jnp.zeros(block_tree["attn"]["c_attn"]["kernel"].shape[1])
        ),
        "wproj": block_tree["attn"]["c_proj"]["kernel"],
        "bproj": block_tree["attn"]["c_proj"].get(
            "bias", jnp.zeros(block_tree["attn"]["c_proj"]["kernel"].shape[1])
        ),
        "w1": block_tree["mlp"]["w1"]["kernel"],
        "w2": block_tree["mlp"]["w2"]["kernel"],
        "wmlp": block_tree["mlp"]["c_proj"]["kernel"],
    }
