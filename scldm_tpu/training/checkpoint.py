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


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
            ),
        )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
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
        self._mgr.close()
