"""Generation-eval metric tests: MMD kernels, Sinkhorn Wasserstein, size factors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.evals.mmd import (
    MMD_METRICS,
    bray_curtis_kernel,
    mmd_loss,
    rbf_kernel,
    ruzicka_kernel,
    tanimoto_kernel,
)
from scldm_tpu.evals.wasserstein import sinkhorn_divergence, wasserstein
from scldm_tpu.sampling.size_factors import SizeFactorSampler


class TestKernels:
    def _xy(self, rng):
        x = jnp.abs(jnp.array(rng.normal(size=(20, 8)), jnp.float32))
        y = jnp.abs(jnp.array(rng.normal(size=(30, 8)), jnp.float32))
        return x, y

    def test_rbf_matches_formula(self, rng):
        x, y = self._xy(rng)
        got = np.asarray(rbf_kernel(x, y))
        d2 = ((np.asarray(x)[:, None] - np.asarray(y)[None]) ** 2).sum(-1)
        np.testing.assert_allclose(got, np.exp(-d2), rtol=1e-3, atol=1e-5)

    @pytest.mark.parametrize("kernel", [bray_curtis_kernel, ruzicka_kernel])
    def test_kernel_self_similarity(self, kernel, rng):
        x, _ = self._xy(rng)
        k = np.asarray(kernel(x, x))
        assert k.shape == (20, 20)
        np.testing.assert_allclose(np.diag(k), 1.0, rtol=1e-5)

    def test_tanimoto_binary_self_similarity(self):
        """Tanimoto = 1 on the diagonal for binary vectors."""
        x = jnp.array([[1.0, 0.0, 1.0], [0.0, 1.0, 1.0]])
        np.testing.assert_allclose(np.diag(np.asarray(tanimoto_kernel(x, x))), 1.0, rtol=1e-5)

    def test_braycurtis_values(self):
        x = jnp.array([[1.0, 0.0]])
        y = jnp.array([[0.0, 1.0]])
        # |1-0|+|0-1| / (|1+0|+|0+1|) = 1 -> kernel 0
        assert float(bray_curtis_kernel(x, y)[0, 0]) == pytest.approx(0.0, abs=1e-6)

    def test_blocked_matches_direct(self, rng):
        """Row-blocked computation must equal the naive broadcast."""
        x = jnp.abs(jnp.array(rng.normal(size=(700, 4)), jnp.float32))
        y = jnp.abs(jnp.array(rng.normal(size=(5, 4)), jnp.float32))
        got = np.asarray(ruzicka_kernel(x, y))
        xa, ya = np.asarray(x), np.asarray(y)
        want = np.minimum(xa[:, None], ya[None]).sum(-1) / (
            np.maximum(xa[:, None], ya[None]).sum(-1) + 1e-8
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestMMD:
    def test_identical_distributions_near_zero(self, rng):
        x = jnp.array(rng.normal(size=(200, 4)), jnp.float32)
        y = jnp.array(rng.normal(size=(200, 4)), jnp.float32)
        z = jnp.array(rng.normal(loc=3.0, size=(200, 4)), jnp.float32)
        near = float(mmd_loss(rbf_kernel, x, y))
        far = float(mmd_loss(rbf_kernel, x, z))
        assert near < 0.05
        assert far > near * 5

    def test_registry_complete(self):
        assert set(MMD_METRICS) == {
            "mmd_braycurtis_counts", "mmd_tanimoto", "mmd_ruzicka_counts", "mmd_rbf",
        }

    def test_rbf_median_finite_on_raw_count_magnitudes(self, rng):
        """Round-1 QUALITY jsons had mmd_rbf Infinity/NaN on raw counts
        (fp32 norm overflow at fixed scale=1.0). The median-bandwidth
        variant must stay finite and discriminative at those magnitudes."""
        from scldm_tpu.evals.mmd import rbf_mmd_median

        x = jnp.array(rng.poisson(50.0, size=(128, 2000)) * 1e3, jnp.float32)
        y = jnp.array(rng.poisson(50.0, size=(128, 2000)) * 1e3, jnp.float32)
        z = jnp.array(rng.poisson(200.0, size=(128, 2000)) * 1e3, jnp.float32)
        near = float(rbf_mmd_median(x, y))
        far = float(rbf_mmd_median(x, z))
        assert np.isfinite(near) and np.isfinite(far)
        assert 0.0 <= near < 0.05
        assert far > 0.5

    def test_rbf_median_scale_invariant(self, rng):
        from scldm_tpu.evals.mmd import rbf_mmd_median

        x = jnp.array(rng.normal(size=(100, 8)), jnp.float32)
        y = jnp.array(rng.normal(loc=1.0, size=(100, 8)), jnp.float32)
        a = float(rbf_mmd_median(x, y))
        b = float(rbf_mmd_median(x * 1e4, y * 1e4))
        assert a == pytest.approx(b, rel=1e-3)


class TestWasserstein:
    def test_sinkhorn_point_masses(self):
        """Two single points: W = |x-y|^p exactly, any reg."""
        x = jnp.array([[0.0]])
        y = jnp.array([[3.0]])
        assert float(sinkhorn_divergence(x, y, reg=0.01, power=1)) == pytest.approx(3.0, rel=1e-3)
        assert wasserstein(x, y, power=2, reg=0.01) == pytest.approx(3.0, rel=1e-3)

    def test_sinkhorn_translation(self, rng):
        """W2 between N(0,I) samples and their +m translation ≈ |m| for small reg."""
        x = jnp.array(rng.normal(size=(150, 2)), jnp.float32)
        y = x + jnp.array([3.0, 0.0])
        w2 = wasserstein(x, y, power=2, reg=0.01)
        assert w2 == pytest.approx(3.0, rel=0.1)

    def test_emd_assignment_path(self, rng):
        x = jnp.array(rng.normal(size=(40, 2)), jnp.float32)
        y = jnp.array(rng.normal(size=(40, 2)), jnp.float32)
        w_emd = wasserstein(x, y, method="emd", power=2)
        w_sink = wasserstein(x, y, method="sinkhorn", power=2, reg=0.01)
        # sinkhorn upper-bounds emd and approaches it as reg -> 0
        assert w_sink == pytest.approx(w_emd, rel=0.15)


class TestSizeFactorSampler:
    def _encoder(self):
        class E:
            class_vocab_sizes = {"clusters": 3}
            mu_size_factor = {"clusters": {0: 8.0, 1: 9.0, 2: 10.0}}
            sd_size_factor = {"clusters": {0: 0.0, 1: 0.0, 2: 0.0}}
            joint_key = None
            joint_components = None
            joint_idx_2_classes = None

        return E()

    def test_gathers_per_class_mean(self):
        s = SizeFactorSampler(self._encoder())
        cond = {"clusters": jnp.array([0, 2, 1, 0])}
        out = np.asarray(s.sample(jax.random.PRNGKey(0), cond, 4))
        np.testing.assert_allclose(out, [8.0, 10.0, 9.0, 8.0])

    def test_no_condition_zeros(self):
        s = SizeFactorSampler(self._encoder())
        out = np.asarray(s.sample(jax.random.PRNGKey(0), None, 3))
        np.testing.assert_allclose(out, 0.0)

    def test_joint_table(self):
        class E:
            class_vocab_sizes = {"cell_type": 2, "cytokine": 2}
            mu_size_factor = {"cell_type_cytokine": {"t0_k0": 8.0, "t1_k1": 9.0}}
            sd_size_factor = {"cell_type_cytokine": {"t0_k0": 0.0, "t1_k1": 0.0}}
            joint_key = "cell_type_cytokine"
            joint_components = ["cell_type", "cytokine"]
            joint_idx_2_classes = {"0_0": "t0_k0", "1_1": "t1_k1"}

        s = SizeFactorSampler(E(), condition_strategy="joint")
        cond = {"cell_type": jnp.array([0, 1]), "cytokine": jnp.array([0, 1])}
        out = np.asarray(s.sample(jax.random.PRNGKey(0), cond, 2))
        np.testing.assert_allclose(out, [8.0, 9.0])
