"""Preemption (SIGTERM) handling: the guard flips on signal, fit
checkpoints-and-exits at the next dispatch boundary, and auto-resume
continues from the preempted step. The reference has no analog — its
Lightning run dies mid-epoch on spot-node preemption."""

import os
import signal

import jax
import numpy as np
import pytest

from scldm_tpu.nn.vae import build_transformer_vae
from scldm_tpu.training.checkpoint import CheckpointManager
from scldm_tpu.training.loop import fit
from scldm_tpu.training.preemption import PreemptionGuard
from scldm_tpu.training.vae_task import VAETask

N_GENES = 24
B = 8


def make_batch(seed):
    rng = np.random.default_rng(seed)
    counts = rng.poisson(2.0, (B, N_GENES)).astype(np.float32)
    genes = np.tile(np.arange(1, N_GENES + 1)[None], (B, 1))
    return {
        "counts": counts,
        "genes": genes,
        "library_size": counts.sum(1, keepdims=True),
        "counts_subset": counts[:, :12],
        "genes_subset": genes[:, :12],
    }


class StubDataModule:
    """10 deterministic batches per epoch; optionally trips the guard after
    `trip_after` batches of epoch 0 (simulating SIGTERM arriving mid-epoch)."""

    steps_per_epoch = 10
    n_val_batches = 0

    def __init__(self, guard=None, trip_after=None):
        self._guard = guard
        self._trip_after = trip_after

    def train_batches(self, epoch):
        for i in range(self.steps_per_epoch):
            if (
                self._guard is not None
                and epoch == 0
                and i == self._trip_after
            ):
                os.kill(os.getpid(), signal.SIGTERM)  # the real delivery path
            yield make_batch(epoch * 1000 + i)

    def val_batches(self):
        return iter(())


@pytest.fixture(scope="module")
def tiny_task():
    vae = build_transformer_vae(
        n_genes=N_GENES, n_embed=16, n_embed_latent=8, n_layer=1,
        n_inducing_points=4, n_head=2, n_head_cross=2,
    )
    return VAETask(vae, num_training_steps=100, mesh=None)


class TestGuard:
    def test_sigterm_sets_flag(self):
        with PreemptionGuard() as g:
            assert not g.stop_requested
            os.kill(os.getpid(), signal.SIGTERM)
            assert g.stop_requested
            assert g.stop_requested_global()

    def test_uninstall_restores_previous_handler(self):
        prev = signal.getsignal(signal.SIGTERM)
        g = PreemptionGuard().install()
        assert signal.getsignal(signal.SIGTERM) == g._on_signal
        g.uninstall()
        assert signal.getsignal(signal.SIGTERM) == prev

    def test_install_idempotent(self):
        g = PreemptionGuard().install()
        try:
            h = signal.getsignal(signal.SIGTERM)
            g.install()
            assert signal.getsignal(signal.SIGTERM) == h
        finally:
            g.uninstall()

    def test_programmatic_request(self):
        g = PreemptionGuard()  # never installed — still usable as a flag
        g.request_stop()
        assert g.stop_requested_global()


class TestFitPreemption:
    def test_checkpoint_and_exit_then_resume(self, tiny_task, tmp_path):
        """SIGTERM after 3 batches -> fit saves at step 3 and returns; a
        relaunch auto-resumes from 3 and runs to max_steps."""
        with PreemptionGuard() as guard:
            dm = StubDataModule(guard=guard, trip_after=3)
            mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
            state = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
            state = fit(
                tiny_task, dm, state, max_steps=15, epochs=5,
                ckpt_manager=mgr, log_every_steps=100,
                save_every_epochs=100,  # only the preemption save fires
                preemption=guard,
            )
        assert int(state.step) == 3
        assert mgr.latest_step() == 3
        mgr.close()

        # relaunch: fresh state, same ckpt dir -> resumes at 3, finishes
        mgr2 = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        fresh = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
        final = fit(
            tiny_task, StubDataModule(), fresh, max_steps=15, epochs=5,
            ckpt_manager=mgr2, log_every_steps=100, save_every_epochs=100,
        )
        assert int(final.step) == 15

    def test_no_guard_runs_to_completion(self, tiny_task, tmp_path):
        state = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
        final = fit(
            tiny_task, StubDataModule(), state, max_steps=5, epochs=1,
            log_every_steps=100,
        )
        assert int(final.step) == 5

    def test_preempted_before_first_step(self, tiny_task, tmp_path):
        """Flag already set at entry: zero steps run, step-0 state returns."""
        guard = PreemptionGuard()
        guard.request_stop()
        state = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
        final = fit(
            tiny_task, StubDataModule(), state, max_steps=5, epochs=1,
            log_every_steps=100, preemption=guard,
        )
        assert int(final.step) == 0


class SkipAwareDataModule(StubDataModule):
    """Records each (epoch, skip) request; yields steps_per_epoch - skip
    batches, tagging each with its within-epoch index via the seed."""

    def __init__(self, guard=None, trip_after=None):
        super().__init__(guard=guard, trip_after=trip_after)
        self.requests = []

    def train_batches(self, epoch, skip=0):
        self.requests.append((epoch, skip))
        for i in range(skip, self.steps_per_epoch):
            if (
                self._guard is not None
                and epoch == 0
                and i == self._trip_after
            ):
                os.kill(os.getpid(), signal.SIGTERM)
            yield make_batch(epoch * 1000 + i)


class TestMidEpochResume:
    def test_resume_fast_forwards_consumed_batches(self, tiny_task, tmp_path):
        """Preempt at step 3 of a 10-step epoch; the relaunch must request
        skip=3 for epoch 0 (no replayed batches) and land the epoch boundary
        exactly at step 10."""
        with PreemptionGuard() as guard:
            dm = SkipAwareDataModule(guard=guard, trip_after=3)
            mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
            state = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
            state = fit(
                tiny_task, dm, state, max_steps=25, epochs=5,
                ckpt_manager=mgr, log_every_steps=100,
                save_every_epochs=100, preemption=guard,
            )
        assert int(state.step) == 3
        mgr.close()

        mgr2 = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        dm2 = SkipAwareDataModule()
        fresh = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
        final = fit(
            tiny_task, dm2, fresh, max_steps=25, epochs=5,
            ckpt_manager=mgr2, log_every_steps=100, save_every_epochs=100,
        )
        mgr2.close()
        assert int(final.step) == 25
        # epoch 0 resumed with skip=3 (7 remaining batches -> step 10 at its
        # end), later epochs from batch 0
        assert dm2.requests == [(0, 3), (1, 0), (2, 0)]

    def test_stub_without_skip_still_resumes(self, tiny_task, tmp_path):
        """Datamodules without the skip parameter fall back to replay."""
        mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        state = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
        state = fit(
            tiny_task, StubDataModule(), state, max_steps=3, epochs=1,
            ckpt_manager=mgr, log_every_steps=100, save_every_epochs=100,
        )
        mgr.close()
        mgr2 = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        fresh = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
        final = fit(
            tiny_task, StubDataModule(), fresh, max_steps=8, epochs=2,
            ckpt_manager=mgr2, log_every_steps=100, save_every_epochs=100,
        )
        mgr2.close()
        assert int(final.step) == 8


class TestPollCadence:
    def test_allgather_runs_at_cadence_and_latches(self, monkeypatch):
        """Multi-process: the allgather fires once per poll_every calls;
        between refreshes the cached (global) decision is returned, never
        the bare local flag; True latches."""
        import numpy as np
        from jax.experimental import multihost_utils

        import scldm_tpu.training.preemption as P

        calls = {"n": 0}
        peer_flag = {"set": False}

        def fake_allgather(x):
            calls["n"] += 1
            return np.asarray([[bool(x[0])], [peer_flag["set"]]])

        monkeypatch.setattr(P.jax, "process_count", lambda: 2)
        monkeypatch.setattr(
            multihost_utils, "process_allgather", fake_allgather
        )

        g = PreemptionGuard(poll_every=4)
        for _ in range(10):
            assert not g.stop_requested_global()
        assert calls["n"] == 3  # counters 0, 4, 8 refreshed

        # local signal between refreshes: stays False until the next cadence
        # point (peers have not agreed yet), then latches True
        g.request_stop()
        results = [g.stop_requested_global() for _ in range(5)]
        assert results[:2] == [False, False]  # counters 10, 11: cached
        assert results[2:] == [True, True, True]  # counter 12 refreshed; latched
        assert calls["n"] == 4

    def test_peer_preemption_propagates(self, monkeypatch):
        """A peer's flag (not ours) stops this host at the next refresh."""
        import numpy as np
        from jax.experimental import multihost_utils

        import scldm_tpu.training.preemption as P

        peer = {"set": True}
        monkeypatch.setattr(P.jax, "process_count", lambda: 2)
        monkeypatch.setattr(
            multihost_utils,
            "process_allgather",
            lambda x: np.asarray([[bool(x[0])], [peer["set"]]]),
        )
        g = PreemptionGuard(poll_every=3)
        assert g.stop_requested_global()  # call 0 is a refresh point


class TestPreemptionDropsPending:
    def test_pending_dispatch_group_not_flushed(self, tiny_task, tmp_path):
        """SIGTERM with a partial K-step dispatch group pending: the pending
        batches are DROPPED (step never counted them; resume replays them
        bit-identically) rather than flushed as single steps — flushing would
        burn the grace window on avoidable train steps, worst case a fresh
        XLA compile of the never-dispatched single-step program."""
        with PreemptionGuard() as guard:
            # batches 0-3 dispatch as one group (step=4); batch 4 goes
            # pending; SIGTERM fires before batch 5 is processed
            dm = StubDataModule(guard=guard, trip_after=5)
            mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
            state = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
            state = fit(
                tiny_task, dm, state, max_steps=20, epochs=2,
                ckpt_manager=mgr, log_every_steps=100,
                save_every_epochs=100, steps_per_dispatch=4,
                preemption=guard,
            )
        assert int(state.step) == 4, "pending batch must not be flushed"
        assert mgr.latest_step() == 4
        mgr.close()

        # resume completes, replaying the dropped batch
        mgr2 = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        fresh = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
        final = fit(
            tiny_task, StubDataModule(), fresh, max_steps=20, epochs=2,
            ckpt_manager=mgr2, log_every_steps=100, save_every_epochs=100,
            steps_per_dispatch=4,
        )
        assert int(final.step) == 20
        mgr2.close()

    @pytest.mark.parametrize("k", [1, 4])
    def test_max_steps_never_overshot(self, tiny_task, k):
        """max_steps cuts through a dispatch group (18 % 4 != 0 with
        10-batch epochs): the loop must clamp the final group to the budget,
        never train past it (reference: max_steps = epochs*n_cells//
        (batch*world), trainer stops exactly there)."""
        state = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
        final = fit(
            tiny_task, StubDataModule(), state, max_steps=18, epochs=2,
            log_every_steps=100, steps_per_dispatch=k,
        )
        assert int(final.step) == 18

    def test_epoch_end_flush_still_happens_unpreempted(self, tiny_task):
        """Without preemption the partial group still flushes at epoch end
        (10 batches, K=4 -> 2 dispatches + 2 single-step flushes)."""
        state = tiny_task.init_state(jax.random.PRNGKey(0), make_batch(0))
        final = fit(
            tiny_task, StubDataModule(), state, max_steps=10, epochs=1,
            log_every_steps=100, steps_per_dispatch=4,
        )
        assert int(final.step) == 10


class TestOffMainThreadInstall:
    def test_install_degrades_without_signal_handlers(self):
        """install() from a worker thread (notebook runners, orchestration
        harnesses) must not raise — it degrades to programmatic-flag mode."""
        import threading

        result = {}

        def worker():
            try:
                g = PreemptionGuard().install()
                g.request_stop()
                result["stop"] = g.stop_requested
                g.uninstall()
                result["ok"] = True
            except Exception as e:  # pragma: no cover
                result["error"] = repr(e)

        t = threading.Thread(target=worker)
        t.start()
        t.join()
        assert result.get("ok"), result.get("error")
        assert result["stop"] is True
