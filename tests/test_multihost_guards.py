"""Multi-host hardening (round-2): guarded jax.distributed bootstrap and the
orbax shared-directory check. True multi-process behavior can't run here; the
guards' single-process and fail-fast paths are what these pin."""

from unittest import mock

import pytest


def test_maybe_initialize_distributed_noop_single_process(monkeypatch):
    from scldm_tpu.parallel import distributed

    for var in (
        "JAX_COORDINATOR_ADDRESS",
        "JAX_NUM_PROCESSES",
        "JAX_PROCESS_ID",
        "TPU_WORKER_HOSTNAMES",
        "MEGASCALE_COORDINATOR_ADDRESS",
    ):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(distributed, "_INITIALIZED", False)
    assert distributed.maybe_initialize_distributed() is False


def test_maybe_initialize_distributed_uses_explicit_env(monkeypatch):
    from scldm_tpu.parallel import distributed

    monkeypatch.setattr(distributed, "_INITIALIZED", False)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    with mock.patch("jax.distributed.initialize") as init:
        assert distributed.maybe_initialize_distributed() is True
    init.assert_called_once_with(
        coordinator_address="10.0.0.1:1234", num_processes=4, process_id=2
    )
    # idempotent: second call must not re-initialize
    with mock.patch("jax.distributed.initialize") as init2:
        assert distributed.maybe_initialize_distributed() is True
    init2.assert_not_called()


def test_checkpoint_rejects_host_local_dir_multiprocess(tmp_path):
    from scldm_tpu.training.checkpoint import CheckpointManager

    with mock.patch("jax.process_count", return_value=4):
        with pytest.raises(ValueError, match="host-local"):
            CheckpointManager("/tmp/ckpts-multihost-test")
    # single-process: /tmp is fine (the whole test suite relies on it)
    mgr = CheckpointManager(tmp_path / "ok")
    mgr.close()
