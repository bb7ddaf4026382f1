"""Likelihood heads over decoder hidden states.

Parity with reference src/scldm/stochastic_layers.py. Heads return raw
distribution parameters (pure arrays); sampling happens in
scldm_tpu.ops.distributions with explicit rng.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scldm_tpu.nn.layers import LayerNormFP32, _dense


class NegativeBinomialTransformerHead(nn.Module):
    """Per-gene-token NB head (stochastic_layers.py:76-121).

    shared_theta=True: mu from Linear(E->1); theta from a per-gene embedding
    table (n_genes+1, 1) initialized to ones. mu is normalized with a
    temperature softmax over the gene axis and scaled by library size:
        mu = softmax(mu / t, axis=genes) * library_size
    """

    n_genes: int
    shared_theta: bool = False
    n_embed: Optional[int] = None
    layernorm_eps: float = 1e-8
    eps_: float = 1e-6
    t: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,  # (B, G, E) decoder hidden states
        genes: jax.Array,  # (B, G) gene token ids
        library_size: jax.Array,  # (B, 1)
    ) -> Tuple[jax.Array, jax.Array]:
        if self.shared_theta:
            mu = _dense(1, True, self.dtype, name="params")(h)
            theta_table = nn.Embed(
                self.n_genes + 1,
                1,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                embedding_init=nn.initializers.ones,
                name="theta",
            )
            theta = theta_table(genes.astype(jnp.int32))
        else:
            params = _dense(2, True, self.dtype, name="params")(h)
            mu, theta = jnp.split(params, 2, axis=-1)
        mu = mu.squeeze(-1)
        theta = jnp.exp(theta.astype(jnp.float32)).squeeze(-1)
        # softmax over the gene axis in fp32 — the mu values span many decades
        mu = jax.nn.softmax(mu.astype(jnp.float32) / self.t, axis=1) * library_size
        return mu, theta


class GaussianTransformerHead(nn.Module):
    """LN + Linear(E->1) mean head (stochastic_layers.py:13-35)."""

    n_embed: int
    layernorm_eps: float = 1e-8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        genes: jax.Array | None = None,
        library_size: jax.Array | None = None,
    ) -> jax.Array:
        h = LayerNormFP32(epsilon=self.layernorm_eps, name="ln")(h)
        return _dense(1, True, self.dtype, name="params")(h).squeeze(-1)


class GaussianLinearHead(nn.Module):
    """Gaussian posterior head for the scVI-style VAE (stochastic_layers.py:38-70).

    Returns (loc, scale) with log-scale hardtanh-clamped to [-7, 5].
    """

    n_hidden: int
    n_latent: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        loc = _dense(self.n_latent, True, self.dtype, name="loc")(x)
        log_scale = _dense(self.n_latent, True, self.dtype, name="scale")(x)
        log_scale = jnp.clip(log_scale, -7.0, 5.0)
        return loc, jnp.exp(log_scale.astype(jnp.float32))


class NegativeBinomialLinearHead(nn.Module):
    """Dense NB head for the scVI-style VAE (stochastic_layers.py:123-158)."""

    n_genes: int
    n_hidden: int
    shared_theta: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,  # (B, n_hidden)
        genes: jax.Array | None,
        library_size: jax.Array,  # (B, 1)
    ) -> Tuple[jax.Array, jax.Array]:
        mu = _dense(self.n_genes, True, self.dtype, name="mu")(h)
        if self.shared_theta:
            theta_raw = self.param("theta", nn.initializers.ones, (self.n_genes,), jnp.float32)
        else:
            theta_raw = _dense(self.n_genes, True, self.dtype, name="theta")(h)
        theta = jax.nn.softplus(theta_raw.astype(jnp.float32))
        mu = jax.nn.softmax(mu.astype(jnp.float32), axis=1) * library_size
        return mu, theta
