"""Grad-norm instrumentation + tissue-tree discovery tests."""

import json

import jax
import numpy as np

from scldm_tpu.data.datamodule import get_tissue_adata_files
from scldm_tpu.data.h5ad import write_h5ad
from scldm_tpu.nn.vae import build_transformer_vae
from scldm_tpu.training.metrics import grad_norms_by_module
from scldm_tpu.training.vae_task import VAETask
from tests.test_training import make_batch


def test_grad_norms_by_module():
    grads = {
        "params": {
            "encoder": {"block_0": {"w": np.ones(4)}, "block_1": {"w": np.ones(4) * 2}},
            "decoder": {"w": np.ones(3)},
        }
    }
    norms = grad_norms_by_module(grads)
    assert set(norms) == {
        "grad_norm/encoder",
        "grad_norm/encoder/block_0",
        "grad_norm/encoder/block_1",
        "grad_norm/decoder",
    }
    assert float(norms["grad_norm/encoder/block_0"]) == 2.0  # ||ones(4)||
    assert float(norms["grad_norm/decoder"]) == np.float32(np.sqrt(3))


def test_vae_task_grad_norm_metrics():
    vae = build_transformer_vae(
        n_genes=40, n_embed=16, n_embed_latent=8, n_layer=1,
        n_inducing_points=4, n_head=2, n_head_cross=2,
    )
    task = VAETask(vae, num_training_steps=10, calculate_grad_norms=True)
    batch = make_batch(jax.random.PRNGKey(0))
    state = task.init_state(jax.random.PRNGKey(1), batch)
    _, mets = task.train_step(state, batch)
    assert any(k.startswith("grad_norm/encoder") for k in mets)
    assert any(k.startswith("grad_norm/decoder") for k in mets)
    assert any(k.startswith("grad_norm/input_layer") for k in mets)


def test_tissue_tree_discovery(tmp_path, rng):
    for tissue in ("lung", "heart"):
        d = tmp_path / tissue / "train"
        d.mkdir(parents=True)
        for i in range(3):
            X = rng.poisson(1.0, size=(8, 5)).astype(np.float32)
            write_h5ad(d / f"adata_{i}.h5ad", X)
        (d / "metadata.json").write_text(
            json.dumps({"n_cells": 24, "shard_size": 8, "last_shard_size": 8})
        )
    # a "genes" dir must be skipped
    (tmp_path / "genes_metadata").mkdir()
    files, total, shard = get_tissue_adata_files(tmp_path, "train")
    assert len(files) == 4  # 3 shards per tissue minus the last one each
    assert total == 2 * (24 - 8)
    assert shard == 8


def test_csv_logger_heterogeneous_rows(tmp_path):
    """Training and validation log different column sets through one file; the
    header must widen (and earlier rows re-align) instead of silently dropping
    every later column set (the old frozen-fieldnames + extrasaction='ignore'
    combination lost ALL validation metrics when a train row came first)."""
    import csv

    from scldm_tpu.training.loop import CSVLogger

    path = tmp_path / "metrics.csv"
    log = CSVLogger(path)
    log.log({"step": 1, "train_loss": 0.5, "grad_norm": 1.2})
    log.log({"step": 2, "val_loss": 0.4, "val_pcc": 0.9})
    log.log({"step": 3, "train_loss": 0.3, "grad_norm": 1.0})

    rows = list(csv.DictReader(path.open()))
    assert set(rows[1]) >= {"step", "train_loss", "grad_norm", "val_loss", "val_pcc"}
    assert rows[1]["val_loss"] == "0.4" and rows[1]["val_pcc"] == "0.9"
    assert rows[0]["train_loss"] == "0.5" and rows[0]["val_loss"] == ""
    assert rows[2]["train_loss"] == "0.3"

    # resume into the existing file: header adopted, no duplicate header row
    log2 = CSVLogger(path)
    log2.log({"step": 4, "val_loss": 0.2})
    rows = list(csv.DictReader(path.open()))
    assert len(rows) == 4 and rows[3]["val_loss"] == "0.2"
