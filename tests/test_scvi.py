"""scVI-baseline task tests: ELBO decreases, KL positive-ish, prior sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from scldm_tpu.config.build import build_scvi_task


def _cfg(n_genes=30):
    return {
        "model": {
            "scvi": {
                "n_genes": n_genes,
                "n_hidden": 32,
                "n_latent": 5,
                "n_layers": 1,
                "dropout": 0.0,
                "shared_theta": True,
                "kl_weight": 1.0,
            },
            "optimizer": {"lr": 1e-3, "betas": [0.9, 0.95], "weight_decay": 0.0},
            "scheduler": {"num_warmup_steps": 5, "decay_type": "sqrt", "fract_decay": 0.1},
        },
        "training": {"grad_clip": 10.0},
    }


def _batch(key, n=16, g=30):
    counts = jax.random.poisson(key, 2.0, (n, g)).astype(jnp.float32)
    return {
        "counts": counts,
        "genes": jnp.tile(jnp.arange(1, g + 1)[None], (n, 1)),
        "library_size": counts.sum(1, keepdims=True),
    }


def test_scvi_elbo_decreases():
    task = build_scvi_task(_cfg(), max_steps=200)
    batch = _batch(jax.random.PRNGKey(0))
    state = task.init_state(jax.random.PRNGKey(1), batch)
    state, m0 = task.train_step(state, batch)
    for _ in range(60):
        state, m = task.train_step(state, batch)
    assert float(m["train_loss"]) < float(m0["train_loss"])
    assert "train_kl" in m and "train_llh" in m
    assert np.isfinite(float(m["train_kl"]))


def test_scvi_eval_and_sample():
    task = build_scvi_task(_cfg(), max_steps=10)
    batch = _batch(jax.random.PRNGKey(0))
    state = task.init_state(jax.random.PRNGKey(1), batch)
    state, _ = task.train_step(state, batch)
    mets = task.eval_step(state, batch, jax.random.PRNGKey(2))
    for k in ("val_loss", "val_llh", "val_kl", "val_zeros_accuracy", "val_pcc"):
        assert k in mets
    counts = task.sample(state, jax.random.PRNGKey(3), batch["library_size"])
    assert counts.shape == batch["counts"].shape
    assert (np.asarray(counts) >= 0).all()
