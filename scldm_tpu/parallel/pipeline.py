"""GPipe pipeline parallelism for the DiT trunk over the mesh "model" axis.

The reference's only distribution strategy is DDP (SURVEY.md §2.6); this is
the TPU-native scaling axis for diffusion backbones too deep/wide for one
chip: contiguous block ranges ("stages") live on successive devices of the
"model" axis, microbatches stream through them, and the stage hop is a single
`lax.ppermute` riding ICI. Composes with DP over "data" (each data row runs
an independent pipeline).

Design notes (the XLA-semantics version of GPipe):

- The L identical adaLN-zero Blocks' params are STACKED on a leading L axis
  (`stack_block_params`) and sharded over "model", so each device holds
  L/n_stages blocks — exactly the pipeline's parameter-memory win.
- Inside `jax.shard_map`, every device runs the same `lax.scan` over
  M + S - 1 ticks. Per tick each stage applies its local blocks (an inner
  scan) to the microbatch it holds and ppermutes the result to the next
  stage; stage 0 ingests fresh microbatches, the last stage records results.
  Bubble fraction = (S-1)/(M+S-1): pick n_micro >= 4 * n_stages.
- The conditioning rows `c` are replicated over "model", so each stage reads
  its current microbatch's (b, E) rows locally (stage s holds microbatch
  t - s at tick t) — no second ppermute stream.
- Devices compute garbage on zero inputs during fill/drain ticks; the
  validity masks keep garbage out of the output buffer. This wastes the
  bubble's FLOPs but keeps control flow static — the XLA-friendly trade.
- Gradients flow through the whole schedule (`ppermute` transposes to the
  inverse permutation; the scan transposes to the reverse-time scan), so
  `jax.grad` of a pipelined loss is the standard GPipe backward. Activation
  stash = one microbatch per live tick, the GPipe memory profile.

Not wired into any default config: reference-scale DiTs (8 blocks, E<=512)
fit one chip with room to spare (ROADMAP #9), so this is the
correctness-proven scaffold for when model growth demands it. Parity +
gradient tests: tests/test_pipeline.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from scldm_tpu.ops.fused_dit import (
    WEIGHT_NAMES,
    _block_math,
    _ln,
    extract_block_params,
)


def stack_block_params(params: Dict, n_layer: int) -> Dict[str, jax.Array]:
    """Stack block_0..block_{n_layer-1} flax subtrees on a leading L axis."""
    p = params["params"] if "params" in params else params
    kps = [extract_block_params(p[f"block_{i}"]) for i in range(n_layer)]
    return {k: jnp.stack([kp[k] for kp in kps]) for k in WEIGHT_NAMES}


def pipeline_blocks(
    x: jax.Array,  # (B, T, E) — batch sharded over "data"
    c: jax.Array,  # (B, E) adaLN conditioning rows
    stacked: Dict[str, jax.Array],  # (L, ...) stacked block params
    *,
    mesh: Mesh,
    n_micro: int,
    n_head: int,
    eps: float,
) -> jax.Array:
    """Run the L stacked Blocks as a GPipe pipeline over the "model" axis."""
    n_stages = mesh.shape["model"]
    n_layer = stacked["wqkv"].shape[0]
    if n_layer % n_stages:
        raise ValueError(f"n_layer={n_layer} must divide into {n_stages} stages")
    if x.shape[0] % (mesh.shape["data"] * n_micro):
        raise ValueError(
            f"batch {x.shape[0]} must split into {n_micro} microbatches "
            f"per data shard (data axis {mesh.shape['data']})"
        )
    out_dtype = x.dtype

    def per_device(xb: jax.Array, cb: jax.Array, wstack: Dict) -> jax.Array:
        # xb: (B_local, T, E) full local batch (replicated over "model");
        # wstack leaves: (L/S, ...) this stage's blocks
        M = n_micro
        S = n_stages
        b = xb.shape[0] // M
        micro_x = xb.reshape(M, b, *xb.shape[1:]).astype(jnp.float32)
        micro_c = cb.reshape(M, b, cb.shape[-1]).astype(jnp.float32)
        stage = jax.lax.axis_index("model")
        perm = [(i, (i + 1) % S) for i in range(S)]

        def stage_fn(xm, cm):
            def body(h, w):
                return _block_math(h, cm, [w[k] for k in WEIGHT_NAMES], n_head, eps), None

            h, _ = jax.lax.scan(body, xm, wstack)
            return h

        def tick(carry, t):
            buf_x, outs = carry
            # stage 0 ingests microbatch t while t < M (zeros afterwards —
            # drain ticks compute garbage that the masks below discard)
            ingest = (stage == 0) & (t < M)
            idx = jnp.clip(t, 0, M - 1)
            inx = jnp.where(ingest, jax.lax.dynamic_index_in_dim(micro_x, idx, keepdims=False), buf_x)
            # conditioning rows are replicated over "model" (micro_c is the
            # full local batch on every device), so stage s reads microbatch
            # t - s locally instead of streaming a second ppermute; invalid
            # ticks read a clipped row whose output the masks discard (and
            # whose cotangent the output `where` zeroes)
            cidx = jnp.clip(t - stage, 0, M - 1)
            inc = jax.lax.dynamic_index_in_dim(micro_c, cidx, keepdims=False)
            y = stage_fn(inx, inc)
            # the last stage finished microbatch t - (S-1) this tick
            oidx = t - (S - 1)
            valid = (stage == S - 1) & (oidx >= 0)
            slot = jnp.clip(oidx, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, slot, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, cur), slot, 0
            )
            # hand this tick's result to the next stage; the wraparound edge
            # last->0 is dead: stage 0 only reads buf_x once ingest goes
            # false, by which point every real microbatch has entered the pipe
            buf_x = jax.lax.ppermute(y, "model", perm)
            return (buf_x, outs), None

        zeros_x = jnp.zeros_like(micro_x[0])
        outs0 = jnp.zeros_like(micro_x)
        (_, outs), _ = jax.lax.scan(
            tick, (zeros_x, outs0), jnp.arange(M + S - 1)
        )
        # only the last stage holds real outputs; the psum (zeros elsewhere)
        # re-replicates them over "model" so downstream GSPMD sees the same
        # layout as the un-pipelined trunk
        outs = jax.lax.psum(outs, "model")
        return outs.reshape(xb.shape).astype(out_dtype)

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("model")),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(x, c, stacked)


def pipeline_dit_apply(
    params: Dict,
    x: jax.Array,  # (B, T, E_in)
    t_embedding: jax.Array,  # (B, E) from DiT.embed_condition (rng-correct)
    *,
    mesh: Mesh,
    n_micro: int,
    n_layer: int,
    n_head: int,
    n_embed: int,
    seq_len: int,
    eps: float = 1e-8,
) -> jax.Array:
    """Differentiable DiT apply with the trunk as a GPipe pipeline.

    Mirrors ops.fused_dit.fused_dit_train_apply: input proj / positional
    table / final layer are plain jnp on the raw param tree (cheap, computed
    replicated over "model"), the L-block trunk streams through
    `pipeline_blocks`."""
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

    stacked = stack_block_params(params, n_layer)
    h = pipeline_blocks(
        h, c, stacked, mesh=mesh, n_micro=n_micro, n_head=n_head, eps=eps
    )

    fl = p["final_layer"]
    mod = dense(fl["adaln_modulation"], jax.nn.silu(c))
    shift, scale = jnp.split(mod, 2, axis=-1)
    hf = _ln(h.astype(jnp.float32), eps) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    return dense(fl["linear"], hf)
