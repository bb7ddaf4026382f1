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


def test_scvi_trains_with_dropout():
    """The reference scVI MLPs default to dropout 0.1 (nnets.py:19-73): the
    train path must supply the 'dropout' rng collection (this regressed
    silently while every test used dropout=0.0)."""
    cfg = _cfg()
    cfg["model"]["scvi"]["dropout"] = 0.1
    task = build_scvi_task(cfg, max_steps=10)
    batch = _batch(jax.random.PRNGKey(0))
    state = task.init_state(jax.random.PRNGKey(1), batch)
    state, m = task.train_step(state, batch)
    assert np.isfinite(float(m["train_loss"]))
    # eval path runs deterministic (no dropout rng needed)
    em = task.eval_step(state, batch, jax.random.PRNGKey(2))
    assert all(np.isfinite(float(v)) for v in em.values())


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


def test_scvi_train_steps_matches_sequential():
    """K-fused dispatch (lax.scan) reproduces K sequential train_step calls —
    same contract as VAETask/LDMTask.train_steps (dispatch amortization)."""
    K = 3
    batch = _batch(jax.random.PRNGKey(0))

    t1 = build_scvi_task(_cfg(), max_steps=50)
    s1 = t1.init_state(jax.random.PRNGKey(1), batch)
    losses = []
    for _ in range(K):
        s1, m = t1.train_step(s1, batch)
        losses.append(float(m["train_loss"]))

    t2 = build_scvi_task(_cfg(), max_steps=50)
    s2 = t2.init_state(jax.random.PRNGKey(1), batch)
    stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x] * K), batch)
    s2, m2 = t2.train_steps(s2, stacked)

    assert int(s2.step) == int(s1.step) == K
    # scan returns the per-step mean; same rng chain -> same trajectory
    np.testing.assert_allclose(float(m2["train_loss"]), np.mean(losses), rtol=1e-5)
    la = jax.tree_util.tree_leaves(s1.params)[0]
    lb = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-6)
