"""Jittable regression metrics (parity with the torchmetrics functional calls
in reference models.py:32-55,315-332)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(preds: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(preds - target))


def pearson_corrcoef(preds: jax.Array, target: jax.Array) -> jax.Array:
    """Per-column Pearson correlation for 2-D inputs (torchmetrics semantics:
    (N, d) -> (d,)); columns with zero variance yield nan."""
    preds = preds.astype(jnp.float32)
    target = target.astype(jnp.float32)
    pc = preds - preds.mean(0)
    tc = target - target.mean(0)
    cov = (pc * tc).mean(0)
    denom = jnp.sqrt(jnp.square(pc).mean(0) * jnp.square(tc).mean(0))
    return cov / denom  # 0/0 -> nan, matching torchmetrics + nanmean downstream


def r2_score(preds: jax.Array, target: jax.Array) -> jax.Array:
    """Scalar R^2 of flattened predictions (used on per-gene mean/var vectors,
    reference models.py:52-55)."""
    preds = preds.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    ss_res = jnp.sum(jnp.square(target - preds))
    ss_tot = jnp.sum(jnp.square(target - target.mean()))
    return 1.0 - ss_res / ss_tot


def zeros_accuracy(preds: jax.Array, target: jax.Array) -> jax.Array:
    """Fraction of entries agreeing on zero/nonzero (models.py:324-327)."""
    return jnp.mean(((preds == 0) == (target == 0)).astype(jnp.float32))


def nanmean(x: jax.Array) -> jax.Array:
    return jnp.nanmean(x)
