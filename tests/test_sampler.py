"""Sampler coverage: SDE sampling, likelihood ODE, dopri5-in-sampler, reverse ODE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.transport import Sampler, create_transport


def _shifted_gaussian_velocity(m, eps=5e-3):
    """Exact velocity field for x1 ~ N(m, I) under the linear path, with the
    1/(1-t) endpoint regularized (a trained network is finite at t=1; the
    closed form is singular there, which adaptive/reverse solvers do evaluate)."""

    def v(x, t):
        te = t.reshape(-1, *([1] * (x.ndim - 1)))
        var = te**2 + (1 - te) ** 2
        e_x1 = m + te * (x - te * m) / var
        e_x0 = (x - te * e_x1) / jnp.maximum(1 - te, eps)
        return e_x1 - e_x0

    return v


class TestSDESampler:
    def test_sde_euler_recovers_target(self):
        m = 2.0
        transport = create_transport(train_eps=1e-3, sample_eps=1e-3)
        sampler = Sampler(transport)
        fn = sampler.sample_sde(
            sampling_method="Euler", num_steps=200, last_step="Mean", last_step_size=0.004
        )
        key = jax.random.PRNGKey(0)
        init = jax.random.normal(key, (3000, 2))
        out = np.asarray(fn(key, init, _shifted_gaussian_velocity(m)))
        assert out.mean() == pytest.approx(m, abs=0.15)

    def test_sde_last_step_none(self):
        transport = create_transport(train_eps=1e-3, sample_eps=1e-3)
        sampler = Sampler(transport)
        fn = sampler.sample_sde(sampling_method="Heun", num_steps=50, last_step=None)
        key = jax.random.PRNGKey(0)
        out = fn(key, jax.random.normal(key, (16, 2)), _shifted_gaussian_velocity(1.0))
        assert np.isfinite(np.asarray(out)).all()


class TestODESampler:
    def test_dopri5_matches_euler(self):
        transport = create_transport()
        sampler = Sampler(transport)
        v = _shifted_gaussian_velocity(1.5)
        key = jax.random.PRNGKey(1)
        init = jax.random.normal(key, (64, 2))
        out_e = np.asarray(sampler.sample_ode(sampling_method="euler", num_steps=800)(init, v))
        out_d = np.asarray(sampler.sample_ode(sampling_method="dopri5")(init, v))
        np.testing.assert_allclose(out_d, out_e, atol=0.05)

    def test_reverse_ode_inverts_forward(self):
        """data -> noise -> data roundtrip through the PF-ODE."""
        transport = create_transport()
        sampler = Sampler(transport)
        v = _shifted_gaussian_velocity(1.0)
        key = jax.random.PRNGKey(2)
        x0 = jax.random.normal(key, (32, 2))
        fwd = sampler.sample_ode(sampling_method="euler", num_steps=300)
        rev = sampler.sample_ode(sampling_method="euler", num_steps=300, reverse=True)
        x1 = fwd(x0, v)
        x0_back = rev(x1, v)
        np.testing.assert_allclose(np.asarray(x0_back), np.asarray(x0), atol=0.1)


class TestLikelihoodODE:
    def test_gaussian_loglik(self):
        """For x1 ~ N(m, I) with the exact velocity field, the likelihood ODE
        must reproduce the closed-form N(m, I) log-density."""
        m = 1.0
        transport = create_transport()
        sampler = Sampler(transport)
        fn = sampler.sample_ode_likelihood(num_steps=200)
        key = jax.random.PRNGKey(3)
        x = jnp.array([[m, m], [m + 1.0, m - 1.0]])
        logp, z0 = fn(key, x, _shifted_gaussian_velocity(m))
        d = x.shape[1]
        want = -d / 2 * np.log(2 * np.pi) - 0.5 * np.sum((np.asarray(x) - m) ** 2, axis=1)
        np.testing.assert_allclose(np.asarray(logp), want, atol=0.2)
        assert z0.shape == x.shape


class TestTrajectoryOutputs:
    """Round-2: saved-trajectory contract (reference torchdiffeq output,
    transport.py:324-369; callers take [-1], models.py:812)."""

    def test_ode_trajectory_euler(self):
        transport = create_transport()
        sampler = Sampler(transport)
        v = _shifted_gaussian_velocity(1.5)
        init = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
        final = sampler.sample_ode(sampling_method="euler", num_steps=50)(init, v)
        traj = sampler.sample_ode(
            sampling_method="euler", num_steps=50, return_trajectory=True
        )(init, v)
        assert traj.shape == (50, 16, 2)
        np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(init))
        np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(final), rtol=1e-5)

    def test_ode_trajectory_dopri5_save_points(self):
        """Adaptive trajectory: every save point must match a tight fixed-step
        solve at that time."""
        transport = create_transport()
        sampler = Sampler(transport)
        v = _shifted_gaussian_velocity(1.5)
        init = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
        traj = sampler.sample_ode(
            sampling_method="dopri5", num_steps=11, return_trajectory=True
        )(init, v)
        assert traj.shape == (11, 8, 2)
        np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(init))
        # midpoint check against dense euler to the same interior time
        t0, t1 = transport.check_interval(
            transport.train_eps, transport.sample_eps,
            sde=False, eval=True, reverse=False, last_step_size=0.0,
        )
        from scldm_tpu.transport.integrators import odeint_euler

        tm = t0 + 0.5 * (t1 - t0)
        mid_ref = odeint_euler(lambda x, t: v(x, t), init, t0, tm, 2000)
        np.testing.assert_allclose(np.asarray(traj[5]), np.asarray(mid_ref), atol=5e-3)

    def test_sde_trajectory_includes_last_step(self):
        transport = create_transport(train_eps=1e-3, sample_eps=1e-3)
        sampler = Sampler(transport)
        fn = sampler.sample_sde(
            sampling_method="Euler", num_steps=40, last_step="Mean",
            last_step_size=0.004, return_trajectory=True,
        )
        key = jax.random.PRNGKey(0)
        init = jax.random.normal(key, (8, 2))
        traj = fn(key, init, _shifted_gaussian_velocity(1.0))
        assert traj.shape == (41, 8, 2)  # 40 saved states + appended last step
        np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(init))


class TestAdaptiveLikelihood:
    @pytest.mark.parametrize("method", ["heun", "dopri5"])
    def test_gaussian_loglik_solver_menu(self, method):
        """The adaptive/heun likelihood solvers must agree with the closed-form
        N(m, I) log-density (reference solver menu, transport.py:371-430)."""
        m = 1.0
        transport = create_transport()
        sampler = Sampler(transport)
        fn = sampler.sample_ode_likelihood(sampling_method=method, num_steps=200)
        key = jax.random.PRNGKey(3)
        x = jnp.array([[m, m], [m + 1.0, m - 1.0]])
        logp, z0 = fn(key, x, _shifted_gaussian_velocity(m))
        d = x.shape[1]
        want = -d / 2 * np.log(2 * np.pi) - 0.5 * np.sum((np.asarray(x) - m) ** 2, axis=1)
        np.testing.assert_allclose(np.asarray(logp), want, atol=0.2)
        assert z0.shape == x.shape
