"""Golden tests for likelihoods against scipy (reference distributions.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from scldm_tpu.ops.distributions import (
    log_gaussian,
    log_nb_positive,
    nb_sample,
    normal_log_prob,
)


def test_log_nb_positive_matches_scipy(rng):
    x = rng.poisson(5.0, size=(16, 32)).astype(np.float32)
    mu = rng.gamma(2.0, 2.0, size=(16, 32)).astype(np.float32) + 0.1
    theta = rng.gamma(2.0, 1.0, size=(16, 32)).astype(np.float32) + 0.1

    got = np.asarray(log_nb_positive(jnp.array(x), jnp.array(mu), jnp.array(theta)))

    # scipy NB: n = theta, p = theta / (theta + mu)
    p = theta / (theta + mu)
    want = stats.nbinom.logpmf(x, theta, p)
    # float32 gammaln vs scipy float64: ~5e-4 relative agreement is expected
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_log_nb_positive_zero_counts(rng):
    """x=0 must be finite (eps placement parity with reference :33-40)."""
    mu = rng.gamma(2.0, 2.0, size=(8, 8)).astype(np.float32)
    theta = np.ones((8, 8), np.float32)
    out = np.asarray(log_nb_positive(jnp.zeros((8, 8)), jnp.array(mu), jnp.array(theta)))
    assert np.isfinite(out).all()


def test_log_gaussian_l2_when_no_sigma():
    x = jnp.array([1.0, 2.0])
    mu = jnp.array([0.0, 0.0])
    np.testing.assert_allclose(np.asarray(log_gaussian(x, mu)), [1.0, 4.0])


def test_log_gaussian_with_sigma_matches_formula():
    x, mu, sigma = jnp.array([1.0]), jnp.array([0.0]), jnp.array([2.0])
    got = float(log_gaussian(x, mu, sigma)[0])
    s = 2.0 + 1e-8
    assert got == pytest.approx(0.5 * (1.0 / s) ** 2 + np.log(s), rel=1e-6)


def test_normal_log_prob_matches_scipy(rng):
    x = rng.normal(size=(10,)).astype(np.float32)
    loc = rng.normal(size=(10,)).astype(np.float32)
    scale = rng.gamma(2.0, 1.0, size=(10,)).astype(np.float32) + 0.1
    got = np.asarray(normal_log_prob(jnp.array(x), jnp.array(loc), jnp.array(scale)))
    want = stats.norm.logpdf(x, loc, scale)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nb_sample_moments():
    """Sampled mean/variance match NB(mu, theta): var = mu + mu^2/theta."""
    key = jax.random.PRNGKey(0)
    mu = jnp.full((100_000,), 8.0)
    theta = jnp.full((100_000,), 2.0)
    samples = np.asarray(nb_sample(key, mu, theta))
    assert samples.min() >= 0
    assert samples.mean() == pytest.approx(8.0, rel=0.05)
    assert samples.var() == pytest.approx(8.0 + 64.0 / 2.0, rel=0.05)
