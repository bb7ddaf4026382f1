"""MMD kernels + biased MMD loss (reference src/scldm/evaluations.py:10-82).

Pure jittable functions. The elementwise kernels (BrayCurtis/Tanimoto/Ruzicka)
are O(Bx·By·D) — computed in blocks to bound memory at generation-eval sizes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rbf_kernel(x: jax.Array, y: jax.Array, scale: float = 1.0) -> jax.Array:
    x_norm = jnp.sum(x * x, axis=1, keepdims=True)
    y_norm = jnp.sum(y * y, axis=1, keepdims=True)
    # clamp: fp32 cancellation on large raw counts can drive the expanded
    # squared distance negative, which exp(-scale * sq) turns into inf
    sq = jnp.maximum(x_norm - 2.0 * x @ y.T + y_norm.T, 0.0)
    return jnp.exp(-scale * sq)


def _sq_dists(x: jax.Array, y: jax.Array) -> jax.Array:
    x_norm = jnp.sum(x * x, axis=1, keepdims=True)
    y_norm = jnp.sum(y * y, axis=1, keepdims=True)
    return jnp.maximum(x_norm - 2.0 * x @ y.T + y_norm.T, 0.0)


def rbf_mmd_median(x: jax.Array, y: jax.Array) -> jax.Array:
    """Biased RBF MMD^2 with the median-distance bandwidth heuristic.

    The reference evaluates its RBF kernel at fixed scale=1.0 on raw counts
    (evaluations.py:10-21 + models.py:902-906), which at single-cell count
    magnitudes either saturates exp() to 0 or overflows fp32 norms to inf.
    This variant (a) rescales inputs to unit RMS so every intermediate stays
    finite in fp32, and (b) sets the bandwidth to the median squared
    cross-distance — the standard heuristic, and scale-invariant, so the
    statistic is identical in the rescaled units.
    """
    rms = jnp.sqrt(0.5 * (jnp.mean(x * x) + jnp.mean(y * y)))
    s = jnp.maximum(rms, 1e-12)
    xs, ys = x / s, y / s
    sq_xy = _sq_dists(xs, ys)
    bandwidth = jnp.maximum(jnp.median(sq_xy), 1e-12)
    gamma = 1.0 / bandwidth
    k_xx = jnp.exp(-gamma * _sq_dists(xs, xs)).mean()
    k_yy = jnp.exp(-gamma * _sq_dists(ys, ys)).mean()
    k_xy = jnp.exp(-gamma * sq_xy).mean()
    return k_xx + k_yy - 2.0 * k_xy


def _blocked_pairwise(fn, x: jax.Array, y: jax.Array, block: int = 512) -> jax.Array:
    """Apply an elementwise-pair kernel in row blocks of x."""
    n = x.shape[0]
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    blocks = xp.reshape(-1, block, x.shape[1])

    def one(xb):
        return fn(xb[:, None, :], y[None, :, :])

    out = jax.lax.map(one, blocks).reshape(-1, y.shape[0])
    return out[:n]


def bray_curtis_kernel(x: jax.Array, y: jax.Array) -> jax.Array:
    def fn(xb, yb):
        num = jnp.abs(xb - yb).sum(-1)
        den = jnp.abs(xb + yb).sum(-1) + 1e-8
        return 1.0 - num / den

    return _blocked_pairwise(fn, x, y)


def tanimoto_kernel(x: jax.Array, y: jax.Array) -> jax.Array:
    def fn(xb, yb):
        num = (xb * yb).sum(-1)
        den = (xb + yb - xb * yb).sum(-1) + 1e-8
        return num / den

    return _blocked_pairwise(fn, x, y)


def ruzicka_kernel(x: jax.Array, y: jax.Array) -> jax.Array:
    def fn(xb, yb):
        num = jnp.minimum(xb, yb).sum(-1)
        den = jnp.maximum(xb, yb).sum(-1) + 1e-8
        return num / den

    return _blocked_pairwise(fn, x, y)


def mmd_loss(kernel, x: jax.Array, y: jax.Array) -> jax.Array:
    """Biased MMD^2 estimate: mean Kxx + mean Kyy - 2 mean Kxy
    (evaluations.py:72-82)."""
    return kernel(x, x).mean() + kernel(y, y).mean() - 2.0 * kernel(x, y).mean()


#: Metric registry parity with reference models.py:39-44. Keys containing
#: "counts" are evaluated on log1p-CPM-scaled counts, others on raw counts
#: (models.py:902-906). Divergence: mmd_rbf uses the median-bandwidth
#: variant — the reference's fixed scale=1.0 on raw counts is numerically
#: meaningless there (overflow/saturation; see rbf_mmd_median docstring).
MMD_METRICS = {
    "mmd_braycurtis_counts": partial(mmd_loss, bray_curtis_kernel),
    "mmd_tanimoto": partial(mmd_loss, tanimoto_kernel),
    "mmd_ruzicka_counts": partial(mmd_loss, ruzicka_kernel),
    "mmd_rbf": rbf_mmd_median,
}
