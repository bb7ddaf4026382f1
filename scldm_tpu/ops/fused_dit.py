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


def _block_kernel(
    x_ref, c_ref,
    wada_ref, bada_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    w1_ref, w2_ref, wmlp_ref,
    o_ref,
    *, n_head: int, eps: float,
):
    R, T, E = x_ref.shape
    x = x_ref[...].astype(jnp.float32)  # (R, T, E)
    c = c_ref[...].astype(jnp.float32)  # (R, E)

    mod = jax.nn.silu(c) @ wada_ref[...].astype(jnp.float32) + bada_ref[...].astype(
        jnp.float32
    )
    shift_a, scale_a, gate_a, shift_m, scale_m, gate_m = jnp.split(mod, 6, axis=-1)

    # -- attention branch ---------------------------------------------------
    h = _ln(x, eps) * (1.0 + scale_a[:, None, :]) + shift_a[:, None, :]
    qkv = h.reshape(R * T, E) @ wqkv_ref[...].astype(jnp.float32) + bqkv_ref[
        ...
    ].astype(jnp.float32)
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
    attn = attn.reshape(R, T, E)
    attn = attn.reshape(R * T, E) @ wproj_ref[...].astype(jnp.float32) + bproj_ref[
        ...
    ].astype(jnp.float32)
    x = x + gate_a[:, None, :] * attn.reshape(R, T, E)

    # -- MLP branch (SwiGLU, no biases) ---------------------------------------
    h2 = _ln(x, eps) * (1.0 + scale_m[:, None, :]) + shift_m[:, None, :]
    h2f = h2.reshape(R * T, E)
    a = h2f @ w1_ref[...].astype(jnp.float32)
    b = h2f @ w2_ref[...].astype(jnp.float32)
    mlp = (jax.nn.silu(a) * b) @ wmlp_ref[...].astype(jnp.float32)
    x = x + gate_m[:, None, :] * mlp.reshape(R, T, E)

    o_ref[...] = x.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "eps", "block_rows", "interpret"))
def fused_dit_block(
    x: jax.Array,  # (R, T, E)
    c: jax.Array,  # (R, E) conditioning (t_embedding rows)
    params: Dict[str, jax.Array],
    n_head: int,
    eps: float = 1e-8,
    block_rows: int = 64,  # f32 working set must fit the ~16M VMEM scoped stack
    interpret: bool = False,
) -> jax.Array:
    R, T, E = x.shape
    br = min(block_rows, R)
    pad = (-R) % br
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        c = jnp.pad(c, ((0, pad), (0, 0)))
    Rp = x.shape[0]

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
            pl.BlockSpec((br, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[full(a) for a in weights],
        ],
        out_specs=pl.BlockSpec((br, T, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, c, *weights)
    return out[:R]


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
