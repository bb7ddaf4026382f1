"""Census-style out-of-distribution VAE inference walkthrough.

The reference documents this flow in docs/notebooks/inference_census.ipynb:
run a pretrained (census) VAE on external AnnData whose ``var_names`` are gene
SYMBOLS — filter to the vocabulary, map symbols -> Ensembl ids, then run
latent/reconstruction inference and write an .h5ad.

This script is self-contained (the environment has no network egress): it
builds a synthetic "census" vocabulary + checkpoint in a temp workspace, then
performs the exact preprocessing + inference steps a user would run against
the released census artifacts. To use real artifacts instead:

    python -m scldm_tpu.utils.artifacts --groups datasets fm_observational
    # then point --metadata-genes / --ckpt at the downloaded files

Run: python -m examples.census_inference  [--workdir /tmp/census_demo]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def make_workspace(workdir: Path, n_genes: int = 120, n_cells: int = 64):
    """Synthetic stand-ins for the census artifacts: a gene-metadata parquet
    (feature_id = Ensembl, feature_name = symbol) and an OOD .h5ad keyed by
    SYMBOLS, with some genes absent from the vocabulary."""
    import pandas as pd

    from scldm_tpu.data.h5ad import write_h5ad

    workdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)

    ens = [f"ENSG{i:011d}" for i in range(n_genes)]
    sym = [f"GENE{i}" for i in range(n_genes)]
    pd.DataFrame({"feature_id": ens, "feature_name": sym}).to_parquet(
        workdir / "gene_metadata.parquet"
    )

    # OOD data: symbols, shuffled order, plus unknown genes the filter drops
    keep = rng.permutation(n_genes)[: n_genes - 20]
    ood_names = [sym[i] for i in keep] + ["UNKNOWN_A", "UNKNOWN_B"]
    X = rng.poisson(1.0, size=(n_cells, len(ood_names))).astype(np.float32)
    write_h5ad(workdir / "ood.h5ad", X, var_names=ood_names,
               obs={"sample": rng.choice(["s1", "s2"], n_cells)})
    return workdir / "gene_metadata.parquet", workdir / "ood.h5ad"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/census_demo")
    p.add_argument("--metadata-genes", default=None,
                   help="real census gene-metadata parquet (feature_id/feature_name)")
    p.add_argument("--ood-h5ad", default=None, help="external AnnData (symbol var_names)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from scldm_tpu.data.datamodule import DataModule
    from scldm_tpu.data.encoder import VocabularyEncoder
    from scldm_tpu.data.h5ad import H5ADFile, write_h5ad
    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.training.vae_task import VAETask

    workdir = Path(args.workdir)
    if args.metadata_genes and args.ood_h5ad:
        meta_parquet, ood_path = Path(args.metadata_genes), Path(args.ood_h5ad)
    else:
        meta_parquet, ood_path = make_workspace(workdir)

    # 1. vocabulary from the census gene metadata (symbol -> Ensembl map
    #    comes along for free; reference encoder.py:34-60)
    vocab = VocabularyEncoder(metadata_genes=str(meta_parquet))
    n_genes = len(vocab.genes)
    print(f"vocabulary: {n_genes} genes")

    # 2. preprocess the OOD AnnData exactly like the reference notebook:
    #    filter to known symbols, rename var_names to Ensembl ids
    f = H5ADFile(ood_path)
    names = list(f.var_names)
    known = [i for i, n in enumerate(names) if n in vocab.gene_symbol_to_ensembl]
    print(f"OOD genes: {len(names)}, kept {len(known)} in-vocabulary")
    X = f.rows(slice(0, f.n_obs))[:, known]
    ens_names = [vocab.gene_symbol_to_ensembl[names[i]] for i in known]
    mapped = workdir / "ood_ensembl.h5ad"
    write_h5ad(mapped, X, var_names=ens_names)

    # 3. model + (here: fresh) params — with real artifacts, load the
    #    released checkpoint instead:
    #    from scldm_tpu.utils.torch_import import load_reference_checkpoint
    #    params = load_reference_checkpoint("census_20m.ckpt", template)
    vae = build_transformer_vae(n_genes=n_genes, dtype=jnp.bfloat16)
    task = VAETask(vae, num_training_steps=10)

    dm = DataModule(
        vocabulary_encoder=vocab,
        test_adata_path=str(mapped),
        test_batch_size=32,
        genes_seq_len=min(n_genes, 2048),
        sample_genes="expressed",
        allow_missing_train=True,
        prefetch=0,
    )
    dm.setup("test")
    dm.adata_inference = str(mapped)  # OOD filtering path (datamodule.py)

    state = None
    zs, recons = [], []
    rng = jax.random.PRNGKey(0)
    for batch in dm.predict_batches():
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        if state is None:
            state = task.init_state(jax.random.PRNGKey(0), jb)
        zs.append(np.asarray(task.encode(state.params, jb)))
        counts_rec, _ = task.reconstruct(state.params, jb, rng)
        recons.append(np.asarray(counts_rec))
    z = np.concatenate(zs)
    recon = np.concatenate(recons)
    out = workdir / "census_inference.h5ad"
    # reconstructions cover the kept (in-vocabulary) genes, in mapped order
    write_h5ad(
        out, recon,
        var_names=ens_names[: recon.shape[1]],
        obsm={"X_latent": z.reshape(z.shape[0], -1)},
    )
    print(f"latents {z.shape}, reconstructions {recon.shape} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
