"""Optional Weights & Biases logging (reference training/default.yaml:19-36
runs a rank-0 WandbLogger). wandb is not installed in all environments, so
this degrades to a no-op; enable with `training.wandb.enabled=true`."""

from __future__ import annotations

from typing import Dict, Optional

from scldm_tpu.utils.logger import logger


class WandbLogger:
    def __init__(self, project: str = "scldm-tpu", name: Optional[str] = None,
                 config: Optional[dict] = None, enabled: bool = True):
        self._run = None
        if not enabled:
            return
        try:
            import jax
            import wandb

            if jax.process_index() == 0:  # rank-0 only, reference parity
                self._run = wandb.init(project=project, name=name, config=config)
        except Exception as e:  # missing package / no network
            logger.warning(f"wandb disabled: {e}")

    def log(self, metrics: Dict, step: Optional[int] = None):
        if self._run is not None:
            self._run.log(metrics, step=step)

    def finish(self):
        if self._run is not None:
            self._run.finish()
