"""Shared CLI wiring: checkpoint-manager and wandb-logger construction from
the `training:` config group (reference training/default.yaml:26-52 — rank-0
WandbLogger + ModelCheckpoint monitor/save_top_k/save_last)."""

from __future__ import annotations

from typing import Dict, Optional

from scldm_tpu.training.checkpoint import CheckpointManager
from scldm_tpu.training.preemption import PreemptionGuard
from scldm_tpu.utils.wandb_logger import WandbLogger


def make_checkpoint_manager(cfg: Dict, ckpt_dir) -> CheckpointManager:
    ck = cfg["training"]["checkpoint"]
    return CheckpointManager(
        ckpt_dir,
        max_to_keep=int(ck.get("max_to_keep", 3)),
        monitor=ck.get("monitor"),
        save_top_k=int(ck.get("save_top_k", 1) or 0),
        mode=ck.get("mode", "min"),
        async_save=bool(ck.get("async_save", False)),
    )


def make_preemption_guard(cfg: Dict) -> Optional[PreemptionGuard]:
    """Install the SIGTERM checkpoint-and-exit guard unless the config opts
    out (`training.handle_preemption: false`). Returns the installed guard
    (caller passes it to fit and uninstalls after) or None."""
    if not bool(cfg["training"].get("handle_preemption", True)):
        return None
    return PreemptionGuard().install()


def make_wandb_logger(cfg: Dict) -> Optional[WandbLogger]:
    wb = cfg["training"].get("wandb") or {}
    if not wb.get("enabled"):
        return None
    return WandbLogger(
        project=wb.get("project") or "scldm-tpu",
        name=wb.get("name") or cfg.get("experiment_name"),
        config=cfg,
    )
