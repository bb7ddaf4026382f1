"""scVI-baseline training entry point (reference models.VAEScvi via train.py)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import numpy as np

from scldm_tpu.config.build import (
    build_datamodule,
    build_scvi_task,
    build_vocabulary_encoder,
    compute_max_steps,
)
from scldm_tpu.parallel.distributed import maybe_initialize_distributed
from scldm_tpu.config.loader import load_config, merge_overrides, resolve
from scldm_tpu.parallel.mesh import make_mesh
from scldm_tpu.cli._common import (
    make_checkpoint_manager,
    make_preemption_guard,
    make_wandb_logger,
)
from scldm_tpu.training.loop import CSVLogger, fit
from scldm_tpu.utils.logger import logger

DEFAULT_CONFIG = Path(__file__).parent.parent.parent / "configs" / "vae_scvi_training.yaml"


def main(argv=None) -> int:
    maybe_initialize_distributed()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=str(DEFAULT_CONFIG))
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])
    cfg = resolve(merge_overrides(load_config(args.config), args.overrides))

    seed = int(cfg.get("seed", 42))
    np.random.seed(seed)
    n_devices = len(jax.devices())
    n_hosts = jax.process_count()
    mesh = make_mesh() if n_devices > 1 else None

    vocab = build_vocabulary_encoder(cfg)
    datamodule = build_datamodule(
        cfg, vocab, num_hosts=n_hosts, host_index=jax.process_index()
    )
    datamodule.setup("fit")
    max_steps = compute_max_steps(cfg, datamodule.n_cells, world_size=n_hosts)
    base_lr = float(cfg["model"]["optimizer"]["lr"])
    cfg["model"]["optimizer"]["lr"] = base_lr * n_hosts

    task = build_scvi_task(cfg, max_steps, mesh=mesh)
    example = next(iter(datamodule.train_batches(0)))
    state = task.init_state(jax.random.PRNGKey(seed), example)

    ckpt_dir = cfg.get("checkpoint_dir", "outputs/checkpoints/scvi")
    mgr = make_checkpoint_manager(cfg, ckpt_dir)
    # snapshot records the PER-HOST lr: a relaunch from this config
    # re-applies the world scaling itself (saving the scaled value would
    # double-scale)
    cfg["model"]["optimizer"]["lr"] = base_lr
    mgr.save_config(cfg)
    cfg["model"]["optimizer"]["lr"] = base_lr * n_hosts
    wandb_logger = make_wandb_logger(cfg)
    preemption = make_preemption_guard(cfg)

    state = fit(
        task,
        datamodule,
        state,
        max_steps=max_steps,
        epochs=int(cfg.get("epochs", 100)),
        mesh=mesh,
        ckpt_manager=mgr,
        csv_logger=CSVLogger(Path(ckpt_dir) / "metrics.csv"),
        log_every_steps=int(cfg["training"].get("log_every_steps", 50)),
        val_every_epochs=int(cfg["training"].get("val_every_epochs", 1)),
        save_every_epochs=int(cfg["training"]["checkpoint"].get("save_every_epochs", 1)),
        eval_rng_seed=seed,
        steps_per_dispatch=int(cfg["training"].get("steps_per_dispatch", 1)),
        profile_dir=cfg["training"].get("profile_dir") or None,
        profile_steps=int(cfg["training"].get("profile_steps", 3)),
        wandb_logger=wandb_logger,
        preemption=preemption,
    )
    if preemption is not None:
        preemption.uninstall()
    mgr.close()  # drain in-flight (async) checkpoint writes before exit
    if wandb_logger is not None:
        wandb_logger.finish()
    logger.info(f"done at step {int(state.step)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
