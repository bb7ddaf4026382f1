"""Parameter sharding rules: data-parallel replication + optional Megatron-style
tensor parallelism over the mesh "model" axis.

The reference only ever does DDP (SURVEY.md §2.6); these rules are the
TPU-native superset for larger configs (census 270M VAE): annotate parameter
shardings once and let GSPMD insert the collectives —

- column-parallel: qkv / q projections, SwiGLU w1/w2, adaLN modulation heads
  (output-feature dim over "model"); their biases shard the same axis;
- row-parallel: attention c_proj and SwiGLU c_proj (input-feature dim over
  "model"), XLA inserting the psum that Megatron does by hand;
- embeddings: feature dim over "model" (the vocab gather stays local);
- everything else (layernorms, heads, inducing points): replicated.

With a model axis of size 1 every rule degenerates to replication, so the same
code path serves pure DP.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_PARALLEL = ("c_attn", "c_attn_q", "w1", "w2", "adaln_modulation", "adaln_modulation_q")
_ROW_PARALLEL = ("c_proj",)
_EMBEDDINGS = ("gene_embedding", "theta")


def param_pspec(path: Tuple[str, ...]) -> P:
    """PartitionSpec for one parameter path (tuple of tree keys)."""
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


def shard_params(params, mesh: Mesh):
    """device_put a param pytree with the TP/DP rules over `mesh`."""

    def put(path, leaf):
        keys = tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        spec = param_pspec(keys)
        # drop specs that don't divide evenly (tiny dims) -> replicate
        axis_size = mesh.shape.get("model", 1)
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % axis_size != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
