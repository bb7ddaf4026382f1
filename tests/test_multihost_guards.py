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


class TestInferenceShardingHelpers:
    """Mesh-first inference input sharding (cli/inference.py): divisible
    batches shard over "data", short final batches stay replicated."""

    def _mesh(self):
        import jax
        from scldm_tpu.parallel.mesh import make_mesh

        return make_mesh(devices=jax.devices()[:4])

    def test_divisible_inputs_shard_over_data(self):
        import jax.numpy as jnp
        from scldm_tpu.cli.inference import _shard_inputs

        mesh = self._mesh()
        cond = {"clusters": jnp.arange(8)}
        genes = jnp.ones((8, 16), jnp.int32)
        cond2, genes2 = _shard_inputs(mesh, cond, genes)
        assert "data" in str(cond2["clusters"].sharding.spec)
        assert "data" in str(genes2.sharding.spec)

    def test_canonical_gene_row_replicates(self):
        import jax.numpy as jnp
        from scldm_tpu.cli.inference import _shard_inputs

        mesh = self._mesh()
        cond = {"clusters": jnp.arange(8)}
        genes = jnp.arange(1, 17)  # 1-D canonical row: batch-free
        cond2, genes2 = _shard_inputs(mesh, cond, genes)
        assert "data" in str(cond2["clusters"].sharding.spec)
        assert "data" not in str(genes2.sharding.spec)

    def test_short_final_batch_stays_replicated(self):
        import jax.numpy as jnp
        import numpy as np
        from scldm_tpu.cli.inference import _shard_inputs, _shard_batch_if_divisible

        mesh = self._mesh()
        cond = {"clusters": jnp.arange(6)}  # 6 % 4 != 0
        genes = jnp.ones((6, 16), jnp.int32)
        cond2, genes2 = _shard_inputs(mesh, cond, genes)
        assert "data" not in str(getattr(cond2["clusters"].sharding, "spec", ""))
        dev = {"counts": jnp.ones((6, 16))}
        dev2 = _shard_batch_if_divisible(mesh, dev)
        assert "data" not in str(getattr(dev2["counts"].sharding, "spec", ""))
        np.testing.assert_array_equal(np.asarray(dev2["counts"]), np.asarray(dev["counts"]))

    def test_batch_dict_shards_when_divisible(self):
        import jax.numpy as jnp
        from scldm_tpu.cli.inference import _shard_batch_if_divisible

        mesh = self._mesh()
        dev = {"counts": jnp.ones((8, 16)), "library_size": jnp.ones((8, 1))}
        dev2 = _shard_batch_if_divisible(mesh, dev)
        assert all("data" in str(v.sharding.spec) for v in dev2.values())
