"""Multi-host bootstrap.

The reference's multi-node story is Lightning DDP: torch.distributed init from
WORLD_SIZE/RANK env (experiments/scripts/train.py:22-23,63). The JAX analog is
`jax.distributed.initialize()`, which must run before any backend use on every
process of a multi-host job. This module makes that an idempotent, guarded
entry hook so single-host runs are untouched.
"""

from __future__ import annotations

import os

from scldm_tpu.utils.logger import logger

_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed iff this looks like one process of many.

    Triggers (checked before jax touches the backend):
    - explicit JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES + JAX_PROCESS_ID
      (any launcher: slurm wrapper, mpirun env remap, manual);
    - cloud-TPU pod env (TPU_WORKER_HOSTNAMES / MEGASCALE_COORDINATOR_ADDRESS),
      where jax.distributed.initialize() auto-detects everything.

    Returns True if distributed is (now) initialized; False for single-process
    runs. Safe to call more than once.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if coord and nproc and pid:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=int(nproc), process_id=int(pid)
        )
        _INITIALIZED = True
        logger.info(f"jax.distributed initialized: process {pid}/{nproc} @ {coord}")
        return True

    # TPU pod auto-detection — only when there is actually more than one
    # worker (single-chip hosts export TPU_WORKER_HOSTNAMES=localhost too)
    workers = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h.strip()]
    if len(workers) > 1 or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()  # TPU pod: full auto-detection
        except RuntimeError as e:
            # backend already up (e.g. a library touched jax.devices() first)
            logger.warning(f"jax.distributed.initialize skipped: {e}")
            return False
        _INITIALIZED = True
        logger.info(
            f"jax.distributed auto-initialized: process {jax.process_index()}"
            f"/{jax.process_count()}"
        )
        return True

    return False
