"""Generation / latent-inference entry point (reference experiments/scripts/inference.py).

Two modes, selected by the config (generation.yaml vs inference.yaml):
- generation_args set: sample cells with CFG from the trained LDM, write
  {dataset}_generated_{i}.h5ad with unconditional/conditional halves;
- inference_args set: encode (and optionally reconstruct) the test or external
  AnnData, write {dataset}_inference_{i}.h5ad with z in obsm.
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
    build_vocabulary_encoder,
)
from scldm_tpu.parallel.distributed import maybe_initialize_distributed
from scldm_tpu.config.loader import load_config, merge_overrides, resolve
from scldm_tpu.constants import NON_CONDITION_KEYS, ModelEnum
from scldm_tpu.sampling.size_factors import SizeFactorSampler
from scldm_tpu.training.checkpoint import CheckpointManager
from scldm_tpu.utils.logger import logger
from scldm_tpu.utils.output import (
    create_anndata_from_inference_output,
    process_generation_output,
)

DEFAULT_CONFIG = Path(__file__).parent.parent.parent / "configs" / "generation.yaml"
COUNTS = ModelEnum.COUNTS.value


def main(argv=None) -> int:
    maybe_initialize_distributed()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=str(DEFAULT_CONFIG))
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])
    cfg = resolve(merge_overrides(load_config(args.config), args.overrides))

    vocab = build_vocabulary_encoder(cfg)
    datamodule = build_datamodule(cfg, vocab)
    if cfg.get("adata_inference"):
        datamodule.allow_missing_train = True
        datamodule.adata_inference = cfg["adata_inference"]
    datamodule.setup("predict")

    # restore the frozen VAE (and, unless vae_only, the LDM state: DiT + EMA)
    from scldm_tpu.cli.train_ldm import load_vae_from_checkpoint

    example = next(iter(datamodule.predict_batches()))
    vae, vae_params = load_vae_from_checkpoint(cfg, example)

    # mesh-first inference (deliberate extension: the reference samples on one
    # GPU, experiments/scripts/inference.py:69): with >1 device the batch axis
    # shards over "data" and the same jitted programs run DP under GSPMD.
    # Single-process only: the predict loop loads whole global batches on one
    # host (multi-host inference would need per-process batch assembly via
    # make_array_from_process_local_data, as the training loop does).
    from scldm_tpu.parallel.mesh import make_mesh

    single_process = jax.process_count() == 1
    n_dev = len(jax.devices())
    # n_model > 1 additionally shards the generation decode over the GENE
    # axis (sequence parallelism — the census decode memory gate; see
    # LDMTask.make_sample_fn)
    n_model = int(cfg.get("n_model") or 1)
    if n_dev % max(n_model, 1):
        raise SystemExit(f"n_model={n_model} must divide the device count {n_dev}")
    mesh = (
        make_mesh(n_data=n_dev // n_model, n_model=n_model)
        if (single_process and n_dev > 1)
        else None
    )
    if mesh is not None:
        logger.info(f"inference mesh: {mesh}")

    if cfg.get("vae_only"):
        # reference models.VAE.inference parity: reconstruct + latents -> h5ad
        return _vae_inference(cfg, vae, vae_params, datamodule, vocab, mesh=mesh)
    dit = build_dit(cfg)
    if mesh is not None and n_model > 1:
        # the n_model knob means gene-SP decode here, never Megatron TP:
        # params replicate over "model" and make_sample_fn shards the decode
        # activations' gene axis over it
        cfg["training"]["gene_sp"] = True
    task = build_ldm_task(cfg, vae, vae_params, dit, max_steps=1, mesh=mesh)
    mgr = CheckpointManager(cfg["checkpoint_dir"])
    state = mgr.restore(task.init_state(jax.random.PRNGKey(0), example))

    out_dir = Path(cfg["paths"]["inference_path"])
    out_dir.mkdir(parents=True, exist_ok=True)
    dataset = cfg["datamodule"]["dataset"]

    gen_args = cfg.get("generation_args")
    if gen_args:
        sfs = SizeFactorSampler(vocab, vocab.condition_strategy)
        gw = gen_args.get("guidance_weight")
        if isinstance(gw, (int, float)):  # scalar override -> every class
            gw = {name: float(gw) for name in (dit.class_vocab_sizes or {})}
        sample_fn = task.make_sample_fn(
            sfs,
            guidance_weight=gw,
            sampling_method=gen_args.get("sampling_method", "dopri5"),
            num_steps=int(gen_args.get("timesteps", 50)),
            use_ema=bool(gen_args.get("use_ema", True)),
        )
        batches = []
        n_batches = int(gen_args.get("n_batches", 4))
        for i, batch in enumerate(datamodule.predict_batches()):
            if i >= n_batches:
                break
            condition = {
                k: jax.numpy.asarray(v)
                for k, v in batch.items()
                if k not in NON_CONDITION_KEYS and k in vocab.class_vocab_sizes
            }
            genes = jax.numpy.asarray(batch["genes"])
            condition, genes = _shard_inputs(mesh, condition, genes)
            counts, z = sample_fn(state, jax.random.PRNGKey(1000 + i), genes, condition)
            half = len(batch["genes"])
            out = dict(batch)
            out[f"{COUNTS}_generated_unconditional"] = np.asarray(counts[:half])
            out[f"{COUNTS}_generated_conditional"] = np.asarray(counts[half:])
            out["z_generated_unconditional"] = np.asarray(z[:half]).reshape(half, -1)
            out["z_generated_conditional"] = np.asarray(z[half:]).reshape(half, -1)
            batches.append(out)
            logger.info(f"generated batch {i + 1}/{n_batches}")
        path = process_generation_output(batches, vocab, out_dir, dataset=dataset)
        logger.info(f"wrote {path}")
        return 0

    inf_args = cfg.get("inference_args") or {}

    # one compiled program per batch signature; params as operands (closures
    # would bake the frozen tree into the HLO as constants)
    encode = jax.jit(task._encode_with)

    @jax.jit
    def reconstruct(params, z, genes, lib, rng):
        from scldm_tpu.ops.distributions import nb_sample

        out = vae.apply(params, z, genes, lib, method="decode")
        return nb_sample(rng, out["mu"], out["theta"])

    for i, batch in enumerate(datamodule.predict_batches()):
        dev = {k: jax.numpy.asarray(v) for k, v in batch.items()}
        dev = _shard_batch_if_divisible(mesh, dev)
        z = encode(task.vae_params, dev)
        outputs = {"z": np.asarray(z)}
        if inf_args.get("reconstruct", True):
            outputs["reconstructed_counts"] = np.asarray(reconstruct(
                vae_params, z, dev["genes"], dev["library_size"],
                jax.random.PRNGKey(i),
            ))
        else:
            outputs["reconstructed_counts"] = np.asarray(batch[COUNTS])
        for k, v in batch.items():
            if k not in NON_CONDITION_KEYS:
                outputs[k] = np.asarray(v)
        path = create_anndata_from_inference_output(
            outputs, vocab, out_dir, dataset=dataset, index=i
        )
        logger.info(f"wrote {path}")
    return 0


def _shard_inputs(mesh, condition, genes):
    """Shard generation inputs' batch axis over the mesh "data" axis.
    Batches that don't divide the axis (e.g. a short final batch) stay
    replicated — GSPMD still runs them, just without the DP split."""
    if mesh is None:
        return condition, genes
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_data = mesh.shape["data"]
    bsz = genes.shape[0] if genes.ndim == 2 else (
        next(iter(condition.values())).shape[0] if condition else 0
    )
    if not bsz or bsz % n_data:
        return condition, genes
    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    condition = {k: put(v, P("data")) for k, v in condition.items()}
    genes = put(genes, P("data", None) if genes.ndim == 2 else P())
    return condition, genes


def _shard_batch_if_divisible(mesh, dev: dict):
    if mesh is None or not dev:
        return dev
    from scldm_tpu.parallel.mesh import shard_batch

    bsz = next(iter(dev.values())).shape[0]
    if bsz % mesh.shape["data"]:
        return dev
    return shard_batch(dev, mesh)


def _vae_inference(cfg, vae, vae_params, datamodule, vocab, mesh=None) -> int:
    """Encode + reconstruct every predict batch with the VAE alone
    (reference models.VAE.inference, models.py:352-381)."""
    import jax.numpy as jnp

    from scldm_tpu.ops.distributions import nb_sample

    out_dir = Path(cfg["paths"]["inference_path"])
    out_dir.mkdir(parents=True, exist_ok=True)
    dataset = cfg["datamodule"]["dataset"]

    # params ride as a jit operand, not a closure: closed-over trees bake
    # into the HLO as constants (~0.5 GB compile payload for the released
    # census 128M VAE this path exists to serve)
    @jax.jit
    def forward(params, counts, genes, lib, c_sub, g_sub, rng):
        out, z = vae.apply(params, counts, genes, lib, c_sub, g_sub)
        if "theta" in out:
            counts_pred = nb_sample(rng, out["mu"], out["theta"])
        else:
            counts_pred = out["mu"]
        return counts_pred, z

    for i, batch in enumerate(datamodule.predict_batches()):
        dev = {
            "counts": jnp.asarray(batch[COUNTS]),
            "genes": jnp.asarray(batch["genes"]),
            "library_size": jnp.asarray(batch["library_size"]),
            "counts_subset": jnp.asarray(batch.get("counts_subset", batch[COUNTS])),
            "genes_subset": jnp.asarray(batch.get("genes_subset", batch["genes"])),
        }
        dev = _shard_batch_if_divisible(mesh, dev)
        counts_pred, z = forward(
            vae_params,
            dev["counts"],
            dev["genes"],
            dev["library_size"],
            dev["counts_subset"],
            dev["genes_subset"],
            jax.random.PRNGKey(i),
        )
        outputs = {"reconstructed_counts": np.asarray(counts_pred), "z": np.asarray(z)}
        for k, v in batch.items():
            if k not in NON_CONDITION_KEYS:
                outputs[k] = np.asarray(v)
        path = create_anndata_from_inference_output(
            outputs, vocab, out_dir, dataset=dataset, index=i
        )
        logger.info(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
