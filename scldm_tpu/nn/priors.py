"""Latent priors (reference src/scldm/priors.py:8-62)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scldm_tpu.ops.distributions import normal_log_prob


class StandardPrior:
    """N(0, I) prior over a fixed latent dimension (priors.py:34-62)."""

    def __init__(self, n_latent: int):
        self.n_latent = n_latent

    def sample(self, key: jax.Array, n_samples: int) -> jax.Array:
        return jax.random.normal(key, (n_samples, self.n_latent))

    def log_prob(self, z: jax.Array) -> jax.Array:
        return normal_log_prob(z, jnp.zeros_like(z), jnp.ones_like(z))

    def loss(self, z: jax.Array) -> jax.Array:
        return self.log_prob(z)
