"""Fused plain-Block trunk (all L blocks) as a single Pallas TPU kernel.

The encoder/decoder trunks of the TransformerVAE (nn/nnets.py, mirroring
reference nnets.py:81-144/147-208) are `n_layer` pre-LN transformer Blocks
(reference layers.py:177-226, non-adaLN) over a tiny (B, T=16, E=32) token
tensor. At these shapes XLA is dispatch/fusion-glue bound, not FLOP bound:
the round-2 profile attributed ~6 ms/step of the 36.8 ms dentate step to the
16 trunk blocks' op chains (ROADMAP.md "trunk blocks + glue"). This kernel is
the non-adaLN analog of ops/fused_dit.py taken one step further: ONE
pallas_call runs the ENTIRE trunk — activations load once and store once for
all L blocks, with every intermediate resident in VMEM (the full working set,
activations + all stacked weights, is well under 1 MB at reference shapes).

    for i in range(L):                       # statically unrolled
        x = x + attn(ln1_i(x))               # affine LN, fused-qkv attention
        x = x + swiglu(ln2_i(x))             # SwiGLU MLP, no biases

Backward is a chain of per-layer Pallas kernels (layer L-1 .. 0), each
recomputing ONE block's forward in-VMEM via in-kernel jax.vjp (the
recompute-VJP pattern proven by fused_dit / fused_decoder). The forward
kernel additionally writes each layer's input x_i — L tiny (R, T, E)
tensors, ~2 MB total at reference shapes — so no per-layer recompute chain
is needed. A single monolithic all-L backward kernel was tried first and
CANNOT compile on real TPU: Mosaic allocates VMEM stack per unrolled vjp
intermediate without cross-layer reuse (80 MB needed vs the 24 MB scoped
limit at L=8, failing at every row-block size). Weight grads accumulate
across the row-block grid per layer.

Only the reference trunk configuration is supported (bias=False attention/MLP,
elementwise-affine LN, no dropout at train time defaults) — callers gate on
`trunk_kernel_ok` below. Equivalence + gradients tested against the flax
Encoder/Decoder trunks in tests/test_fused_trunk.py.

MEASURED RESULT (round 3, real v5e, benchmarks/ablate_trunk.py): at the
reference dentate shapes this kernel is a net LOSS — 41.6 vs 40.5 ms/step
for the full train step — because XLA's saved-activation backward beats the
recompute VJP + weight stack/unstack glue when the (B, 16, 32) activations
are this small. It is therefore OPT-IN (`VAETask(fused_trunk=True)`), kept
for deeper/narrower trunk configs where the L-proportional glue dominates.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: stacked (L, ...) weight ordering for the fused trunk kernel
TRUNK_WEIGHT_NAMES = ("g1", "b1", "wqkv", "wproj", "g2", "b2", "w1", "w2", "wmlp")


def _ln_affine(x: jax.Array, g: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def _trunk_math(x, weights, n_layer: int, n_head: int, eps: float):
    """Pure f32 math of the whole L-block trunk — shared by the forward kernel
    and the backward kernel (which differentiates it via in-kernel jax.vjp).

    `weights` are the stacked arrays in TRUNK_WEIGHT_NAMES order; layer i's
    slice is weights[k][i]. Attention uses the Mosaic-friendly layout from
    ops/fused_dit.py: 2-D column slices, leading-dim reshapes, 3-D batched
    matmuls, statically unrolled heads.
    """
    g1s, b1s, wqkvs, wprojs, g2s, b2s, w1s, w2s, wmlps = [
        w.astype(jnp.float32) for w in weights
    ]
    R, T, E = x.shape
    x = x.astype(jnp.float32)
    hd = E // n_head
    scale = 1.0 / hd**0.5
    batched_qk = (((2,), (2,)), ((0,), (0,)))  # contract hd, batch R
    batched_pv = (((2,), (1,)), ((0,), (0,)))  # contract T, batch R

    for i in range(n_layer):
        # -- attention branch -------------------------------------------------
        h = _ln_affine(x, g1s[i], b1s[i], eps)
        qkv = h.reshape(R * T, E) @ wqkvs[i]
        head_outs = []
        for hidx in range(n_head):
            qh = qkv[:, hidx * hd : (hidx + 1) * hd].reshape(R, T, hd)
            kh = qkv[:, E + hidx * hd : E + (hidx + 1) * hd].reshape(R, T, hd)
            vh = qkv[:, 2 * E + hidx * hd : 2 * E + (hidx + 1) * hd].reshape(R, T, hd)
            s = jax.lax.dot_general(
                qh, kh, batched_qk, preferred_element_type=jnp.float32
            )
            ph = jax.nn.softmax(s * scale, axis=-1)  # (R, T, T)
            head_outs.append(
                jax.lax.dot_general(
                    ph, vh, batched_pv, preferred_element_type=jnp.float32
                )
            )
        attn = jnp.concatenate([o.reshape(R * T, hd) for o in head_outs], axis=-1)
        x = x + (attn @ wprojs[i]).reshape(R, T, E)

        # -- MLP branch (SwiGLU, no biases) ------------------------------------
        h2 = _ln_affine(x, g2s[i], b2s[i], eps).reshape(R * T, E)
        a = h2 @ w1s[i]
        b = h2 @ w2s[i]
        x = x + ((jax.nn.silu(a) * b) @ wmlps[i]).reshape(R, T, E)
    return x


def _trunk_kernel(x_ref, *rest, n_layer: int, n_head: int, eps: float, save: bool):
    if save:
        *w_refs, o_ref, xs_ref = rest
    else:
        *w_refs, o_ref = rest
    weights = [r[...] for r in w_refs]
    if save:
        x = x_ref[...].astype(jnp.float32)
        for i in range(n_layer):
            xs_ref[i] = x.astype(xs_ref.dtype)
            x = _trunk_math(x, [w[i : i + 1] for w in weights], 1, n_head, eps)
        o_ref[...] = x.astype(o_ref.dtype)
    else:
        out = _trunk_math(x_ref[...], weights, n_layer, n_head, eps)
        o_ref[...] = out.astype(o_ref.dtype)


def _trunk_bwd_kernel(xs_ref, *rest, n_head: int, eps: float):
    """Whole-trunk backward in ONE kernel: grid (L, R/br) walks layers top-down
    (index maps reverse the layer axis), recomputing one layer per grid step
    via in-kernel jax.vjp over its saved input block. The dx cotangent chain
    lives in a VMEM scratch accumulator — it never round-trips HBM between
    layers — and per-layer weight grads accumulate across the row blocks
    (same-block-index revisiting, init at r == 0). This keeps the Mosaic VMEM
    stack at single-layer size (the monolithic all-L vjp needed 80 MB and
    cannot compile) while paying exactly one kernel launch."""
    n_w = len(TRUNK_WEIGHT_NAMES)
    w_refs = rest[:n_w]
    dy_ref = rest[n_w]
    dx_ref = rest[n_w + 1]
    dw_refs = rest[n_w + 2 : n_w + 2 + n_w]
    scratch = rest[-1]
    l = pl.program_id(0)
    r = pl.program_id(1)
    br = dy_ref.shape[0]
    weights = [w[0].astype(jnp.float32) for w in w_refs]

    def f(x, *ws):
        return _trunk_math(x, [w[None] for w in ws], 1, n_head, eps)

    # incoming cotangent: dy at the topmost layer, else the chained scratch
    g_in = jnp.where(
        l == 0,
        dy_ref[...].astype(jnp.float32),
        scratch[pl.ds(r * br, br)],
    )
    _, vjp = jax.vjp(f, xs_ref[0].astype(jnp.float32), *weights)
    grads = vjp(g_in)
    scratch[pl.ds(r * br, br)] = grads[0]
    # every step writes its layer's dx; the final (l == L-1) write per row
    # block is layer 0's input grad — the one that persists
    dx_ref[...] = grads[0].astype(dx_ref.dtype)

    first = r == 0
    for ref, g in zip(dw_refs, grads[1:]):
        @pl.when(first)
        def _(ref=ref, g=g):
            ref[0] = g.astype(ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, g=g):
            ref[0] = ref[0] + g.astype(ref.dtype)


def _stacked_weights(params: Dict[str, jax.Array]):
    return [params[name] for name in TRUNK_WEIGHT_NAMES]


@functools.partial(
    jax.jit, static_argnames=("n_head", "eps", "block_rows", "interpret")
)
def fused_trunk_blocks(
    x: jax.Array,  # (R, T, E)
    params: Dict[str, jax.Array],  # stacked (L, ...) arrays, TRUNK_WEIGHT_NAMES
    n_head: int,
    eps: float = 1e-8,
    block_rows: int = 64,
    interpret: bool = False,
) -> jax.Array:
    R, T, E = x.shape
    n_layer = params["wqkv"].shape[0]
    br = min(block_rows, R)
    pad = (-R) % br
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    Rp = x.shape[0]

    weights = _stacked_weights(params)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _trunk_kernel, n_layer=n_layer, n_head=n_head, eps=eps, save=False
        ),
        out_shape=jax.ShapeDtypeStruct((Rp, T, E), x.dtype),
        grid=(Rp // br,),
        in_specs=[
            pl.BlockSpec((br, T, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[full(a) for a in weights],
        ],
        out_specs=pl.BlockSpec((br, T, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, *weights)
    return out[:R]


def _fwd_saving(x, params, n_head, eps, block_rows, interpret):
    """Forward pass that also returns every layer's input x_i (f32, (L, R, T, E))
    for the per-layer backward chain."""
    R, T, E = x.shape
    n_layer = params["wqkv"].shape[0]
    br = min(block_rows, R)
    pad = (-R) % br
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    Rp = x.shape[0]
    weights = _stacked_weights(params)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    row3 = pl.BlockSpec((br, T, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out, xs = pl.pallas_call(
        functools.partial(
            _trunk_kernel, n_layer=n_layer, n_head=n_head, eps=eps, save=True
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, T, E), x.dtype),
            jax.ShapeDtypeStruct((n_layer, Rp, T, E), jnp.float32),
        ),
        grid=(Rp // br,),
        in_specs=[row3, *[full(a) for a in weights]],
        out_specs=(
            row3,
            pl.BlockSpec(
                (n_layer, br, T, E), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(x, *weights)
    return out[:R], xs[:, :R]


def _bwd_pallas(xs, params, dy, n_head, eps, block_rows, interpret):
    """Whole-trunk backward over the saved layer inputs xs (L, R, T, E):
    one pallas_call, grid (L, R/br), layers walked in reverse."""
    n_layer, R, T, E = xs.shape
    br = min(block_rows, R)
    pad = (-R) % br
    if pad:  # zero-padded rows contribute zero cotangents
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dy = jnp.pad(dy, ((0, pad), (0, 0), (0, 0)))
    Rp = xs.shape[1]
    weights = _stacked_weights(params)
    L = n_layer

    def layer_spec(a):
        # one layer's slice per grid step, layer axis reversed (top-down)
        return pl.BlockSpec(
            (1, *a.shape[1:]),
            lambda l, r, _n=a.ndim: (L - 1 - l,) + (0,) * (_n - 1),
            memory_space=pltpu.VMEM,
        )

    row3 = pl.BlockSpec((br, T, E), lambda l, r: (r, 0, 0), memory_space=pltpu.VMEM)
    xs_spec = pl.BlockSpec(
        (1, br, T, E), lambda l, r: (L - 1 - l, r, 0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = (
        jax.ShapeDtypeStruct((Rp, T, E), jnp.float32),  # dx
        *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
    )
    outs = pl.pallas_call(
        functools.partial(_trunk_bwd_kernel, n_head=n_head, eps=eps),
        out_shape=out_shapes,
        grid=(L, Rp // br),
        in_specs=[xs_spec, *[layer_spec(w) for w in weights], row3],
        out_specs=(row3, *[layer_spec(w) for w in weights]),
        scratch_shapes=[pltpu.VMEM((Rp, T, E), jnp.float32)],
        interpret=interpret,
    )(xs, *weights, dy)
    dx, *dws = outs
    dparams = {
        name: g.astype(params[name].dtype)
        for name, g in zip(TRUNK_WEIGHT_NAMES, dws)
    }
    return dx[:R], dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_trunk_blocks_trainable(
    x, params, n_head, eps=1e-8, block_rows=64, bwd_block_rows=16, interpret=False
):
    """Differentiable fused trunk: Pallas forward AND backward kernels
    (gradients verified against jax.grad of the flax trunk)."""
    return fused_trunk_blocks(
        x, params, n_head, eps=eps, block_rows=block_rows, interpret=interpret
    )


def _trainable_fwd(x, params, n_head, eps, block_rows, bwd_block_rows, interpret):
    out, xs = _fwd_saving(x, params, n_head, eps, block_rows, interpret)
    # zero-size carrier records the primal dtype for the cotangent cast
    return out, (xs, params, jnp.zeros((0,), x.dtype))


def _trainable_bwd(n_head, eps, block_rows, bwd_block_rows, interpret, res, dy):
    xs, params, dtype_carrier = res
    dx, dparams = _bwd_pallas(xs, params, dy, n_head, eps, bwd_block_rows, interpret)
    return dx.astype(dtype_carrier.dtype), dparams


fused_trunk_blocks_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def extract_trunk_params(tree: Dict, n_layer: int) -> Dict[str, jax.Array]:
    """Stack the per-layer Block param subtrees (`block_0`..`block_{L-1}` of an
    Encoder/Decoder param tree) into the fused kernel's (L, ...) weight dict.

    LN scale/bias are reshaped to (1, E) per layer so the stacked arrays are
    (L, 1, E) — 2-D per-layer slices tile onto TPU memory cleanly. Safe to
    call inside a loss function: jnp.stack's VJP routes the kernel's stacked
    weight grads back to the per-block flax params."""
    def stack(path):
        leaves = []
        for i in range(n_layer):
            node = tree[f"block_{i}"]
            for k in path:
                node = node[k]
            leaves.append(node)
        return jnp.stack(leaves)

    E = tree["block_0"]["ln_1"]["LayerNorm_0"]["scale"].shape[-1]
    return {
        "g1": stack(("ln_1", "LayerNorm_0", "scale")).reshape(n_layer, 1, E),
        "b1": stack(("ln_1", "LayerNorm_0", "bias")).reshape(n_layer, 1, E),
        "wqkv": stack(("attn", "c_attn", "kernel")),
        "wproj": stack(("attn", "c_proj", "kernel")),
        "g2": stack(("ln_2", "LayerNorm_0", "scale")).reshape(n_layer, 1, E),
        "b2": stack(("ln_2", "LayerNorm_0", "bias")).reshape(n_layer, 1, E),
        "w1": stack(("mlp", "w1", "kernel")),
        "w2": stack(("mlp", "w2", "kernel")),
        "wmlp": stack(("mlp", "c_proj", "kernel")),
    }


def trunk_kernel_ok(n_embed: int, bias: bool, dropout: float, use_adaln: bool) -> bool:
    """Static conditions under which the fused trunk matches the flax Blocks
    and its VMEM working set fits: the reference trunk config (bias-free
    attention/MLP, affine LN, no dropout, non-adaLN) at narrow width. At
    census width (E=512) XLA's MXU-shaped matmuls are the right path."""
    return (not bias) and dropout == 0.0 and (not use_adaln) and n_embed <= 128
