"""Device mesh + sharding helpers.

The reference's only distribution strategy is DDP over NCCL (SURVEY.md §2.6);
the TPU-native equivalent is a named mesh with the batch axis sharded over
ICI ("data") and parameters replicated. Everything flows through `jax.jit`
with NamedShardings — XLA inserts the psum for the loss/metric means and the
gradient all-reduce, which is exactly DDP's semantics without any NCCL-like
code.

The mesh is built with a trailing "model" axis (size 1 by default) so tensor-
parallel shardings for larger configs (census 270M VAE) drop in without
re-plumbing callers.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Mesh with axes ("data", "model"). Defaults to all devices on data."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_stacked_batch(stacked: dict, mesh: Mesh) -> dict:
    """Device-put a (K, batch, ...) stacked batch dict: leading step axis
    replicated, batch axis sharded over "data"."""
    sharding = NamedSharding(mesh, P(None, "data"))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x), stacked
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), stacked)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Put a host batch dict on device with the batch axis sharded over "data".

    Single-host: a plain device_put. Multi-host (DCN): each process contributes
    its locally-loaded batch as its shard of the global array
    (global batch = local batch x process_count), which is the reference's
    per-rank-batch DDP semantics (SURVEY.md §2.6).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x), batch
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
