"""Orbax checkpointing with auto-resume.

Replaces Lightning's ModelCheckpoint + resume-from-last.ckpt flow
(reference training/default.yaml:42-52, train.py:81-88): full train-state
pytrees (params, optimizer state, EMA, rng, step) saved per step, plus a JSON
config snapshot beside the checkpoints.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


def _guard_multihost_directory(directory: Path) -> None:
    """Orbax multi-host saves require every process to write into the SAME
    (shared-filesystem or object-store) directory; a host-local path silently
    produces per-host partial checkpoints. Fail fast on the obvious cases."""
    import jax

    if jax.process_count() <= 1:
        return
    s = str(directory)
    if s.startswith(("/tmp/", "/var/", "/dev/shm/")):
        raise ValueError(
            f"checkpoint dir {s} is host-local but this is a "
            f"{jax.process_count()}-process run; use a shared filesystem "
            "(NFS/GCS-fuse) or object-store path visible to every host"
        )


class CheckpointManager:
    """Save-last retention for resume, plus optional best-k-by-monitored-metric
    retention in a `best/` subdirectory — the orbax equivalent of Lightning's
    ModelCheckpoint(save_last=True, save_top_k=k, monitor="val_loss")
    (reference training/default.yaml:42-52). Keeping the two retention policies
    in separate orbax managers means auto-resume always sees the true latest
    step while `best/` independently keeps the k best validation snapshots.
    """

    def __init__(
        self,
        directory: str | Path,
        max_to_keep: int = 3,
        monitor: Optional[str] = None,
        save_top_k: int = 1,
        mode: str = "min",
        async_save: bool = False,
    ):
        """``async_save=True`` overlaps checkpoint writes with training:
        orbax snapshots device arrays to host, then serializes in a
        background thread (multi-host coordination included) — at census
        scale the train state is ~2.5 GB and a blocking write stalls the
        chip for its full duration. Off by default: synchronous saves keep
        save-then-read-back flows (tests, scripts that immediately restore)
        trivially correct; ``close()`` always drains pending writes."""
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        _guard_multihost_directory(self.directory)
        self.async_save = async_save
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=async_save,
            ),
        )
        self.monitor = monitor
        self._best = None
        if monitor and save_top_k:
            self._best = ocp.CheckpointManager(
                self.directory / "best",
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=save_top_k,
                    best_fn=lambda m: m[monitor],
                    best_mode=mode,
                    create=True,
                    enable_async_checkpointing=async_save,
                ),
            )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        if not self.async_save:
            self._mgr.wait_until_finished()
        if self._best is not None and self.monitor in metrics:
            self._best.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
            if not self.async_save:
                self._best.wait_until_finished()

    def wait_until_finished(self) -> None:
        """Drain in-flight async writes (no-op for synchronous saves)."""
        self._mgr.wait_until_finished()
        if self._best is not None:
            self._best.wait_until_finished()

    def best_step(self) -> Optional[int]:
        """Step of the best checkpoint by the monitored metric (None if no
        monitored saves happened)."""
        if self._best is None:
            return None
        if self.async_save:  # an in-flight save must be visible to readers
            self._best.wait_until_finished()
        return self._best.best_step()

    def restore_best(self, template: Any) -> Any:
        step = self.best_step()
        if step is None:
            raise FileNotFoundError(f"no best checkpoint in {self.directory / 'best'}")
        return self._best.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        if self.async_save:  # an in-flight save must be visible to readers
            self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of `template` (a matching
        abstract or concrete train state)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def maybe_restore(self, template: Any) -> tuple[Any, int]:
        """Auto-resume: restore the latest checkpoint if one exists
        (reference train.py:81-88), else return the template unchanged."""
        step = self.latest_step()
        if step is None:
            return template, 0
        return self.restore(template, step), step

    def save_config(self, config: dict, name: str = "config.json") -> None:
        (self.directory / name).write_text(json.dumps(config, indent=2, default=str))

    def load_config(self, name: str = "config.json") -> Optional[dict]:
        p = self.directory / name
        return json.loads(p.read_text()) if p.exists() else None

    def close(self):
        self.wait_until_finished()
        self._mgr.close()
        if self._best is not None:
            self._best.close()
