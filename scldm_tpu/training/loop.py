"""Generic fit loop: epochs over the datamodule, jitted steps, validation,
CSV logging, orbax checkpointing with auto-resume.

The functional replacement for pytorch_lightning.Trainer.fit as the reference
uses it (train.py:62-88): max-step budget, per-epoch validation, save-last +
monitor-val_loss checkpoints, epoch-reshuffled streams via set_epoch parity.
"""

from __future__ import annotations

import csv
import time
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import numpy as np

from scldm_tpu.parallel.mesh import shard_batch, shard_stacked_batch
from scldm_tpu.training.checkpoint import CheckpointManager
from scldm_tpu.utils.logger import logger


class _StackBuffers:
    """Reusable host staging buffers for multi-step dispatch stacking.

    Fresh large numpy allocations are mmap-backed and page-fault on first
    touch — pathological on some virtualized hosts (measured seconds per
    ~40MB). Copying into persistent buffers touches the pages once, ever.
    device_put copies synchronously, so reuse across dispatches is safe.
    """

    def __init__(self):
        self._bufs: Dict[str, np.ndarray] = {}

    def stack(self, batches):
        out = {}
        for k in batches[0]:
            first = np.asarray(batches[0][k])
            shape = (len(batches),) + first.shape
            buf = self._bufs.get(k)
            if buf is None or buf.shape != shape or buf.dtype != first.dtype:
                buf = np.empty(shape, first.dtype)
                self._bufs[k] = buf
            for i, b in enumerate(batches):
                np.copyto(buf[i], b[k])
            out[k] = buf
        return out


class CSVLogger:
    """Append-only metrics CSV that tolerates heterogeneous rows.

    Training and validation log DIFFERENT column sets through the same file
    (train_loss/grad_norm/... vs val_loss/val_pcc/...), so the header cannot
    be frozen from the first row: when a row introduces new columns, the file
    is rewritten once with the widened header (files are small — one row per
    log_every_steps). Missing cells stay empty."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fieldnames: Optional[list] = None
        if self.path.exists():  # resume: adopt the existing header
            with self.path.open(newline="") as f:
                reader = csv.reader(f)
                header = next(reader, None)
            if header:
                self._fieldnames = list(header)

    def log(self, row: Dict):
        row = {k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v)
               for k, v in row.items()}
        if self._fieldnames is None:
            self._fieldnames = list(row.keys())
            with self.path.open("a", newline="") as f:
                csv.DictWriter(f, fieldnames=self._fieldnames).writeheader()
        new_keys = [k for k in row if k not in self._fieldnames]
        if new_keys:
            widened = self._fieldnames + new_keys
            with self.path.open(newline="") as f:
                existing = list(csv.DictReader(f))
            with self.path.open("w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=widened)
                w.writeheader()
                w.writerows(existing)
            self._fieldnames = widened
        with self.path.open("a", newline="") as f:
            csv.DictWriter(f, fieldnames=self._fieldnames).writerow(row)


def fit(
    task,
    datamodule,
    state,
    *,
    max_steps: int,
    epochs: int,
    mesh=None,
    ckpt_manager: Optional[CheckpointManager] = None,
    csv_logger: Optional[CSVLogger] = None,
    log_every_steps: int = 50,
    val_every_epochs: int = 1,
    save_every_epochs: int = 1,
    eval_rng_seed: int = 0,
    steps_per_dispatch: int = 1,
    on_validation_end: Optional[Callable] = None,  # (epoch, val_metrics, state)
    wandb_logger=None,  # utils.wandb_logger.WandbLogger (rank-0 no-op safe)
    profile_dir: Optional[str] = None,  # capture a post-compile step trace here
    profile_steps: int = 3,
    preemption=None,  # training.preemption.PreemptionGuard (installed by caller)
):
    """Run training until max_steps or epochs exhaust — or a preemption
    signal arrives (the guard's flag is polled at dispatch boundaries; on
    stop the loop checkpoints through the normal collective-safe path and
    returns, so auto-resume continues from the preempted step). Returns
    final state."""
    start_step = int(state.step)
    if ckpt_manager is not None:
        state, resumed = ckpt_manager.maybe_restore(state)
        if resumed:
            start_step = int(state.step)
            logger.info(f"auto-resumed from checkpoint at step {start_step}")

    step = start_step
    start_epoch = 0 if datamodule.steps_per_epoch == 0 else step // max(
        datamodule.steps_per_epoch, 1
    )
    # mid-epoch resume (e.g. after a preemption save): fast-forward the first
    # epoch's stream past the already-consumed batches so data order stays
    # aligned with the step counter (no replays, exact epoch boundaries).
    resume_skip = (
        step - start_epoch * datamodule.steps_per_epoch
        if datamodule.steps_per_epoch > 0
        else 0
    )
    if resume_skip:
        import inspect

        if "skip" in inspect.signature(datamodule.train_batches).parameters:
            logger.info(
                f"mid-epoch resume: skipping {resume_skip} consumed batches "
                f"of epoch {start_epoch}"
            )
        else:  # stub datamodules without fast-forward: replay (old behavior)
            resume_skip = 0
    t_last = time.perf_counter()
    cells_seen = 0
    last_logged = step

    import jax.numpy as jnp

    from scldm_tpu.utils.profiling import StepProfiler

    stackers = _StackBuffers()
    profiler = StepProfiler(profile_dir, profile_steps)
    preempted = False

    def run_single(b):
        """One un-stacked optimizer step (ragged tails, budget clamps, epoch-
        end flushes all dispatch through here so the bookkeeping cannot
        drift between the call sites)."""
        nonlocal state, step, cells_seen
        dev_b = shard_batch(b, mesh) if mesh is not None else b
        state, m = task.train_step(state, dev_b)
        profiler.tick(m)
        step += 1
        cells_seen += len(b["library_size"])
        return m

    def flush_log(metrics, epoch, force=False):
        """Cadenced metric logging + the non-finite fail-fast (reference
        models.py:1049-1051 raises on NaN losses; here it guards every task).
        `force` flushes regardless of cadence — used when the run is about to
        end (max_steps clamp) so the final steps are always inspected before
        the last checkpoint write."""
        nonlocal last_logged, t_last, cells_seen
        if not force and step - last_logged < log_every_steps:
            return
        if step == last_logged:
            # a forced flush landing on a step the cadence already logged
            # (max_steps coinciding with log_every_steps) has nothing new to
            # inspect and would emit a 0-cells/near-zero-window noise row
            return
        last_logged = step
        metrics = {k: float(v) for k, v in metrics.items()}
        if not np.isfinite(metrics.get("train_loss", 0.0)):
            raise FloatingPointError(
                f"non-finite train_loss at step {step}: {metrics['train_loss']}"
            )
        now = time.perf_counter()
        if cells_seen:
            metrics["cells_per_sec"] = cells_seen / (now - t_last)
        t_last, cells_seen = now, 0
        metrics.update(step=step, epoch=epoch)
        logger.info(
            f"step {step} epoch {epoch} "
            + " ".join(f"{k}={v:.4g}" for k, v in metrics.items() if k not in ("step", "epoch"))
        )
        if csv_logger:
            csv_logger.log(metrics)
        if wandb_logger:
            wandb_logger.log(metrics, step=step)

    metrics: Optional[Dict] = None
    epoch = start_epoch
    for epoch in range(start_epoch, epochs):
        if step >= max_steps or preempted:
            break
        pending = []
        epoch_skip = resume_skip if epoch == start_epoch else 0
        batches = (
            datamodule.train_batches(epoch, skip=epoch_skip)
            if epoch_skip
            else datamodule.train_batches(epoch)
        )
        for batch in batches:
            if step >= max_steps:
                break
            if preemption is not None and preemption.stop_requested_global():
                preempted = True
                break
            if steps_per_dispatch > 1 and hasattr(task, "train_steps"):
                # amortize dispatch latency: K optimizer steps per compiled call.
                # A ragged batch (short tail with drop_incomplete_batch=False)
                # cannot stack with full-size ones — run the pending group's
                # batches singly rather than crash in np.copyto, then let the
                # short batch take the single-step path too.
                if pending and batch["library_size"].shape[0] != (
                    pending[0]["library_size"].shape[0]
                ):
                    for b in pending:
                        if step >= max_steps:
                            break
                        metrics = run_single(b)
                    pending = []
                pending.append(batch)
                if len(pending) < steps_per_dispatch:
                    continue
                if step + len(pending) > max_steps:
                    # the max_steps budget cuts through this group: dispatch
                    # only the remaining allowance as single steps so a
                    # resumed run never trains past max_steps (reference
                    # contract: max_steps = epochs*n_cells//(batch*world),
                    # /root/reference/src/scldm/_utils.py:62-108).
                    for b in pending:
                        if step >= max_steps:
                            break
                        metrics = run_single(b)
                    pending = []
                    # the budget is exhausted and the loop is about to exit:
                    # force-flush so these final steps hit the non-finite
                    # guard + loggers before the last checkpoint save
                    flush_log(metrics, epoch, force=True)
                    continue
                stacked = stackers.stack(pending)
                dev = (
                    shard_stacked_batch(stacked, mesh)
                    if mesh is not None
                    else {k: jnp.asarray(v) for k, v in stacked.items()}
                )
                state, metrics = task.train_steps(state, dev)
                profiler.tick(metrics)
                step += len(pending)
                cells_seen += sum(len(b["library_size"]) for b in pending)
                pending = []
            else:
                metrics = run_single(batch)
            flush_log(metrics, epoch)

        # flush a partial dispatch group at epoch end as single steps — but
        # NOT on preemption: `step` never counted the pending batches, so
        # mid-epoch resume replays them bit-identically, and flushing here
        # would burn the SIGTERM grace window on avoidable train steps (worst
        # case a fresh XLA compile of the never-yet-dispatched single-step
        # program) instead of reaching the checkpoint write.
        for batch in pending if not preempted else ():
            if step >= max_steps:
                break
            metrics = run_single(batch)
            flush_log(metrics, epoch)

        if preempted:
            logger.info(
                f"preemption signal: checkpointing at step {step} and exiting"
            )
            break

        # -- validation (raw + EMA where the task supports it) -----------------
        if (epoch + 1) % val_every_epochs == 0 and datamodule.n_val_batches > 0:
            val_metrics = validate(task, datamodule, state, mesh, seed=eval_rng_seed)
            logger.info(
                f"epoch {epoch} validation "
                + " ".join(f"{k}={v:.4g}" for k, v in val_metrics.items())
            )
            if csv_logger:
                csv_logger.log({"step": step, "epoch": epoch, **val_metrics})
            if wandb_logger:
                wandb_logger.log({"epoch": epoch, **val_metrics}, step=step)
            if on_validation_end is not None:
                on_validation_end(epoch, val_metrics, state)
        else:
            val_metrics = {}

        if ckpt_manager is not None and (epoch + 1) % save_every_epochs == 0:
            ckpt_manager.save(step, state, metrics=val_metrics or None)

    # final flush: a run ending on a full stacked dispatch that exactly
    # consumes max_steps (or a stream drying up between log cadences) must
    # still pass its last metrics through the non-finite guard + loggers
    # before the final checkpoint write. No-op when the cadence already
    # logged this step, or on zero-step runs (metrics never bound).
    if metrics is not None:
        flush_log(metrics, epoch, force=True)
    profiler.close()  # run shorter than 1+profile_steps dispatches
    if ckpt_manager is not None:
        ckpt_manager.save(step, state)
    return state


def validate(task, datamodule, state, mesh=None, seed: int = 0) -> Dict[str, float]:
    """Average task.eval_step metrics over the val stream (raw + EMA when the
    task has an EMA, mirroring reference BaseModel.validation_step)."""
    sums: Dict[str, float] = {}
    count = 0
    has_ema = getattr(state, "ema", None) is not None
    for i, batch in enumerate(datamodule.val_batches()):
        dev_batch = shard_batch(batch, mesh) if mesh is not None else batch
        rng = jax.random.PRNGKey(seed * 100_003 + i)
        metrics = dict(task.eval_step(state, dev_batch, rng))
        if has_ema:
            metrics.update(task.eval_step(state, dev_batch, rng, ema=True))
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
    return {k: v / max(count, 1) for k, v in sums.items()}
