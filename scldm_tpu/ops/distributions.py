"""Likelihoods used by the count decoders, as pure jittable functions.

Math parity with reference src/scldm/distributions.py:6-62 (itself matching
scvi-tools' NegativeBinomial log-pmf) — golden-tested against scipy.stats.nbinom
in tests/test_distributions.py.

The negative binomial is parameterized by mean ``mu`` and inverse dispersion
``theta`` (scvi convention): with p = theta / (theta + mu),

    NB(x | mu, theta) = Gamma(x + theta) / (Gamma(theta) x!) * p^theta (1-p)^x
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


def log_nb_positive(
    x: jax.Array,
    mu: jax.Array,
    theta: jax.Array,
    eps: float = 1e-8,
) -> jax.Array:
    """Elementwise log-pmf of NB(mu, theta) (reference distributions.py:6-42).

    Computed in float32 regardless of input dtype: lgamma/log are precision
    sensitive and the counts span several orders of magnitude.
    """
    x = x.astype(jnp.float32)
    mu = mu.astype(jnp.float32)
    theta = theta.astype(jnp.float32)
    log_theta_mu_eps = jnp.log(theta + mu + eps)
    return (
        theta * (jnp.log(theta + eps) - log_theta_mu_eps)
        + x * (jnp.log(mu + eps) - log_theta_mu_eps)
        + gammaln(x + theta)
        - gammaln(theta)
        - gammaln(x + 1.0)
    )


def log_gaussian(
    x: jax.Array,
    mu: jax.Array,
    sigma: jax.Array | None = None,
    eps: float = 1e-8,
) -> jax.Array:
    """Gaussian reconstruction term (reference distributions.py:45-62).

    With ``sigma=None`` this is the plain elementwise L2 loss ``(x - mu)**2``;
    otherwise a Gaussian NLL up to an additive constant.
    """
    if sigma is None:
        return (x - mu) ** 2
    sigma = sigma + eps
    return 0.5 * jnp.square((x - mu) / sigma) + jnp.log(sigma)


def nb_sample(key: jax.Array, mu: jax.Array, theta: jax.Array) -> jax.Array:
    """Draw counts from NB(mu, theta) via the gamma–Poisson mixture.

    Matches torch.distributions-based sampling used by scvi's NegativeBinomial
    (reference vae.py:87 `NegativeBinomialSCVI(mu, theta).sample()`):
    lam ~ Gamma(shape=theta, rate=theta/mu), x ~ Poisson(lam).
    """
    key_g, key_p = jax.random.split(key)
    mu = jnp.asarray(mu, jnp.float32)
    theta = jnp.asarray(theta, jnp.float32)
    theta_b = jnp.broadcast_to(theta, mu.shape)
    # Gamma(shape=theta, scale=mu/theta); guard against zero/negative params.
    safe_theta = jnp.maximum(theta_b, 1e-8)
    scale = mu / safe_theta
    lam = jax.random.gamma(key_g, safe_theta) * scale
    lam = jnp.clip(lam, 0.0, 1e12)
    return jax.random.poisson(key_p, lam).astype(jnp.float32)


def nb_mean(mu: jax.Array, theta: jax.Array) -> jax.Array:  # noqa: ARG001
    """Mean of NB(mu, theta) — the mu parameter itself."""
    return mu


def normal_log_prob(x: jax.Array, loc: jax.Array, scale: jax.Array) -> jax.Array:
    """Elementwise Normal log-density (used by the scVI-style VAE ELBO)."""
    var = scale * scale
    return -0.5 * (jnp.log(2.0 * jnp.pi * var) + jnp.square(x - loc) / var)
