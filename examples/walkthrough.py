"""End-to-end walkthrough: prepare data -> train VAE -> train LDM -> generate.

The script equivalent of the reference's docs/notebooks: builds a small
synthetic dataset on disk in the exact format the pipeline consumes (h5ad +
metadata json + size-factor stats), then drives every CLI stage. Takes a few
minutes on CPU; on a TPU host it runs the same way, just faster.

    python examples/walkthrough.py --workdir /tmp/scldm_demo
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

# runnable from anywhere without installing the package
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_data(workdir: Path, n_cells=512, n_genes=64, n_clusters=4, seed=0):
    from scldm_tpu.data.h5ad import write_h5ad

    rng = np.random.default_rng(seed)
    clusters = rng.integers(0, n_clusters, n_cells)
    programs = rng.normal(0, 1.5, (n_clusters, n_genes)) * (rng.random((n_clusters, n_genes)) < 0.2)
    log_mu = rng.normal(-1.5, 1.0, n_genes)[None] + programs[clusters]
    prob = np.exp(log_mu)
    prob /= prob.sum(1, keepdims=True)
    lib = np.exp(rng.normal(6.0, 0.3, (n_cells, 1)))
    counts = rng.poisson(rng.gamma(2.0, prob * lib / 2.0)).astype(np.float32)
    labels = np.asarray([f"c{i}" for i in clusters])

    write_h5ad(workdir / "train.h5ad", counts, obs={"clusters": labels},
               var_names=[f"g{i}" for i in range(n_genes)])
    # metadata + size-factor stats via the CLI (what you'd run on real data)
    from scldm_tpu.cli.extract_metadata import extract

    extract(
        str(workdir / "train.h5ad"), ["clusters"], str(workdir / "meta.json"),
        size_factors_out=str(workdir / "sf"),
    )
    return n_genes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/scldm_demo")
    args = p.parse_args()
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    n_genes = make_data(workdir)
    common = [
        f"datamodule.datamodule.train_adata_path={workdir / 'train.h5ad'}",
        f"datamodule.dataset_params.dentate_gyrus.metadata_json={workdir / 'meta.json'}",
        f"datamodule.dataset_params.dentate_gyrus.n_genes={n_genes}",
        f"datamodule.dataset_params.dentate_gyrus.genes_seq_len={n_genes}",
        f"datamodule.dataset_params.dentate_gyrus.mu_size_factor={workdir / 'sf_log_size_factor_mu.json'}",
        f"datamodule.dataset_params.dentate_gyrus.sd_size_factor={workdir / 'sf_log_size_factor_sd.json'}",
        f"paths.output_path={workdir / 'outputs'}",
        f"paths.inference_path={workdir / 'outputs' / 'inference'}",
        "model.batch_size=64", "model.test_batch_size=64",
        "model.vae.n_embed=16", "model.vae.n_embed_latent=8",
        "model.vae.n_layer=2", "model.vae.n_inducing_points=4",
        "model.vae.n_head=2", "model.vae.n_head_cross=2",
        "epochs=5", "training.log_every_steps=5",
    ]

    print("== stage 1: VAE training ==")
    from scldm_tpu.cli.train import main as train_vae

    train_vae(common)

    print("== stage 2: LDM training on the frozen VAE ==")
    from scldm_tpu.cli.train_ldm import main as train_ldm

    train_ldm(common + [
        "model.diffusion_model.n_embed=64", "model.diffusion_model.n_layer=2",
        "model.diffusion_model.n_head=4", "model.ema.update_after_step=0",
    ])

    print("== stage 3: conditional generation with CFG ==")
    from scldm_tpu.cli.inference import main as inference

    config = Path(__file__).parent.parent / "configs" / "generation.yaml"
    inference(["--config", str(config)] + common + [
        "model.diffusion_model.n_embed=64", "model.diffusion_model.n_layer=2",
        "model.diffusion_model.n_head=4",
        "generation_args.timesteps=50", "generation_args.sampling_method=euler",
        "generation_args.n_batches=2",
        f"datamodule.datamodule.test_adata_path={workdir / 'train.h5ad'}",
    ])

    out = sorted((workdir / "outputs" / "inference").glob("*generated*.h5ad"))
    print(f"\ngenerated cells written to: {out[-1]}")
    from scldm_tpu.data.h5ad import H5ADFile

    f = H5ADFile(out[-1])
    print(f"  {f.n_obs} cells x {f.n_vars} genes;",
          f"obs columns: {f.obs_columns()}")


if __name__ == "__main__":
    main()
