"""LDM training entry point (reference experiments/scripts/train_ldm.py).

Loads the trained VAE from its orbax checkpoint directory, grafts the VAE
architecture from the checkpoint's config snapshot into this run's config
(reference _utils.py:336-370 checkpoint surgery), freezes it as the tokenizer,
and trains the DiT with the SiT flow-matching loss.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import numpy as np

from scldm_tpu.config.build import (
    build_datamodule,
    build_dit,
    build_ldm_task,
    build_vae,
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
from scldm_tpu.training.checkpoint import CheckpointManager
from scldm_tpu.training.loop import CSVLogger, fit
from scldm_tpu.utils.logger import logger

DEFAULT_CONFIG = Path(__file__).parent.parent.parent / "configs" / "ldm_training.yaml"


def load_vae_from_checkpoint(cfg: dict, example_batch: dict):
    """Restore VAE params + graft its architecture into cfg['model']['vae'].

    Returns (vae_module, vae_params). The DiT's n_embed_input/seq_len follow
    from the VAE latent dims via config interpolation, matching
    _utils.py:363-369.
    """
    vae_dir = cfg["vae_checkpoint_dir"]
    vae_mgr = CheckpointManager(vae_dir)
    vae_cfg = vae_mgr.load_config()
    if vae_cfg is not None:
        cfg["model"]["vae"] = vae_cfg["model"]["vae"]
        cfg["model"]["decoder_name"] = vae_cfg["model"].get(
            "decoder_name", "negative_binomial_shared_theta"
        )
        # keep DiT latent dims in sync with the grafted VAE
        cfg["model"]["diffusion_model"]["n_embed_input"] = cfg["model"]["vae"][
            "n_embed_latent"
        ]
        cfg["model"]["diffusion_model"]["seq_len"] = cfg["model"]["vae"][
            "n_inducing_points"
        ]
    vae = build_vae(cfg)
    import jax.numpy as jnp

    b = example_batch["library_size"].shape[0]
    n_genes = cfg["model"]["vae"]["n_genes"]
    counts = jnp.asarray(
        example_batch.get("counts", jnp.zeros((b, n_genes), jnp.float32))
    )
    genes = jnp.asarray(
        example_batch.get(
            "genes",
            jnp.broadcast_to(jnp.arange(1, n_genes + 1, dtype=jnp.int32), (b, n_genes)),
        )
    )
    init_params = jax.jit(vae.init)(
        jax.random.PRNGKey(0),
        counts=counts,
        genes=genes,
        library_size=jnp.asarray(example_batch["library_size"]),
        counts_subset=jnp.asarray(example_batch.get("counts_subset", counts)),
        genes_subset=jnp.asarray(example_batch.get("genes_subset", genes)),
    )
    # restore only the params subtree of the VAE train state
    step = vae_mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no VAE checkpoint in {vae_dir}")
    restored = vae_mgr._mgr.restore(
        step,
        args=__import__("orbax.checkpoint", fromlist=["args"]).args.StandardRestore(None),
    )
    params = restored["params"] if "params" in restored else restored
    # normalize device placement: the checkpoint carries the sharding it was
    # saved with (e.g. an 8-device mesh), which may not match this run's
    params = jax.tree_util.tree_map(lambda a: jax.device_put(np.asarray(a)), params)
    vae_mgr.close()
    logger.info(f"loaded frozen VAE from {vae_dir} @ step {step}")
    # structure AND shape check against a fresh init (tree_map alone only
    # validates the tree structure)
    def _check(a, b):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"VAE checkpoint param shape {np.shape(b)} does not match the "
                f"grafted architecture's {np.shape(a)} — wrong checkpoint or "
                "config drift"
            )

    jax.tree_util.tree_map(_check, init_params, params)
    return vae, params


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

    example = next(iter(datamodule.train_batches(0)))
    vae, vae_params = load_vae_from_checkpoint(cfg, example)
    dit = build_dit(cfg)
    task = build_ldm_task(cfg, vae, vae_params, dit, max_steps, mesh=mesh)
    state = task.init_state(jax.random.PRNGKey(seed), example)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info(f"DiT params: {n_params:,}; max_steps={max_steps}")

    ckpt_dir = cfg.get("checkpoint_dir", "outputs/checkpoints/ldm")
    mgr = make_checkpoint_manager(cfg, ckpt_dir)
    # snapshot records the PER-HOST lr: a relaunch from this config
    # re-applies the world scaling itself (saving the scaled value would
    # double-scale)
    cfg["model"]["optimizer"]["lr"] = base_lr
    mgr.save_config(cfg)
    cfg["model"]["optimizer"]["lr"] = base_lr * n_hosts
    wandb_logger = make_wandb_logger(cfg)
    preemption = make_preemption_guard(cfg)

    # periodic generation eval during validation (models.py:849-939 parity)
    gen_cfg = cfg["model"].get("eval_generation") or {}
    on_validation_end = None
    if gen_cfg.get("enabled"):
        from scldm_tpu.evals.generation_eval import run_generation_eval, should_run
        from scldm_tpu.sampling.size_factors import SizeFactorSampler

        sfs = SizeFactorSampler(vocab, vocab.condition_strategy)
        gen_sample_fn = task.make_sample_fn(
            sfs,
            guidance_weight=None,
            sampling_method=gen_cfg.get("sampling_method", "dopri5"),
            num_steps=int(gen_cfg.get("timesteps", 50)),
            use_ema=True,
        )
        gen_csv = CSVLogger(Path(ckpt_dir) / "generation_eval.csv")

        def on_validation_end(epoch, val_metrics, current_state):
            if not should_run(epoch, gen_cfg):
                return
            mets = run_generation_eval(
                gen_sample_fn,
                current_state,
                datamodule.val_batches(),
                sample_size=int(gen_cfg.get("sample_size", 1024)),
                rng_seed=seed + epoch,
            )
            gen_csv.log({"epoch": epoch, **mets})

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
        on_validation_end=on_validation_end,
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
