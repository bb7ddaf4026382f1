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


def grad_norms_by_module(grads, depth: int = 2, prefix: str = "grad_norm") -> dict:
    """Hierarchical gradient L2 norms per parameter subtree (the functional
    analog of reference BaseModel._compute_gradient_norms, models.py:132-166).

    Returns {"grad_norm/<module>[/<submodule>]": norm} down to `depth` path
    levels of the (possibly {'params': ...}-wrapped) grads tree.
    """
    import flax
    import optax

    tree = grads.get("params", grads) if isinstance(grads, dict) else grads
    flat = flax.traverse_util.flatten_dict(tree)
    groups: dict = {}
    for path, leaf in flat.items():
        for d in range(1, min(depth, len(path)) + 1):
            if d == len(path):  # the parameter leaf itself is not a module group
                continue
            groups.setdefault("/".join(path[:d]), []).append(leaf)
    return {
        f"{prefix}/{name}": optax.global_norm(leaves) for name, leaves in groups.items()
    }
