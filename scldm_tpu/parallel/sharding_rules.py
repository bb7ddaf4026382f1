"""Parameter sharding rules: data-parallel replication + optional Megatron-style
tensor parallelism over the mesh "model" axis + optional FSDP-style parameter /
optimizer-state sharding over the "data" axis.

The reference only ever does DDP (SURVEY.md §2.6); these rules are the
TPU-native superset for larger configs (census 270M VAE): annotate parameter
shardings once and let GSPMD insert the collectives —

- column-parallel: qkv / q projections, SwiGLU w1/w2, adaLN modulation heads
  (output-feature dim over "model"); their biases shard the same axis;
- row-parallel: attention c_proj and SwiGLU c_proj (input-feature dim over
  "model"), XLA inserting the psum that Megatron does by hand;
- embeddings: feature dim over "model" (the vocab gather stays local);
- everything else (layernorms, heads, inducing points): replicated.

With `fsdp=True` each parameter additionally shards its largest remaining
(divisible) dim over "data" — the ZeRO-3 layout. Optimizer state created from
the sharded params inherits the same layout, so Adam moments shrink by the
data-axis size per chip; GSPMD inserts the all-gather before use and the
reduce-scatter on the gradients (the XLA-native equivalent of
torch.distributed FSDP, which the reference never needed at its scales).

With a model axis of size 1 and fsdp off, every rule degenerates to
replication, so the same code path serves pure DP.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_PARALLEL = ("c_attn", "c_attn_q", "w1", "w2", "adaln_modulation", "adaln_modulation_q")
_ROW_PARALLEL = ("c_proj",)
_EMBEDDINGS = ("gene_embedding", "theta")


def param_pspec(path: Tuple[str, ...]) -> P:
    """Tensor-parallel PartitionSpec for one parameter path (tree-key tuple)."""
    parts = [str(p) for p in path]
    leaf = parts[-1]
    parent = parts[-2] if len(parts) >= 2 else ""

    if leaf == "kernel":
        if parent in _COLUMN_PARALLEL:
            return P(None, "model")
        if parent in _ROW_PARALLEL:
            return P("model", None)
        return P()
    if leaf == "bias":
        if parent in _COLUMN_PARALLEL:
            return P("model")
        return P()
    if leaf == "embedding":
        if parent in _EMBEDDINGS or parent.startswith("class_embedding"):
            # theta is (vocab, 1): too narrow to split
            if parent == "theta":
                return P()
            return P(None, "model")
        return P()
    return P()


def _fit_spec(spec: P, shape: Tuple[int, ...], mesh: Mesh, fsdp: bool) -> P:
    """Drop axes that don't divide evenly; optionally add the "data" axis on
    the largest still-unsharded divisible dim (FSDP)."""
    model_size = mesh.shape.get("model", 1)
    axes = list(spec) + [None] * (len(shape) - len(spec))
    for dim, axis in enumerate(axes):
        if axis == "model" and shape[dim] % model_size != 0:
            axes[dim] = None
    if fsdp:
        data_size = mesh.shape.get("data", 1)
        if data_size > 1:
            free = [d for d in range(len(shape)) if axes[d] is None and shape[d] % data_size == 0]
            if free:
                best = max(free, key=lambda d: shape[d])
                # don't bother sharding tiny leaves (scalars / short biases):
                # the all-gather latency outweighs the memory win
                if shape[best] >= data_size and math.prod(shape) >= 1024:
                    axes[best] = "data"
    while axes and axes[-1] is None:
        axes.pop()
    return P(*axes)


def shard_params(params, mesh: Mesh, fsdp: bool = False, megatron: bool = True):
    """device_put a param pytree with the TP/DP (+ optional FSDP) rules.

    ``megatron=False`` replicates every parameter over the "model" axis
    (FSDP still applies): the layout for gene/sequence parallelism, where
    the "model" axis carries the decode ACTIVATION gene axis instead of
    parameter columns — both uses of the axis at once would force GSPMD to
    re-gather operands inside every cross-block matmul."""

    def put(path, leaf):
        keys = tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        spec = param_pspec(keys) if megatron else P()
        spec = _fit_spec(spec, leaf.shape, mesh, fsdp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
