"""Interpolant algebra, transport loss, and integrator convergence tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scldm_tpu.transport import GVPCPlan, ICPlan, Sampler, VPCPlan, create_transport
from scldm_tpu.transport.integrators import (
    odeint_dopri5,
    odeint_euler,
    odeint_heun,
    sdeint,
)
from scldm_tpu.transport.transport import ModelType, mean_flat


# ---------------------------------------------------------------------------
# Path algebra
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("plan_cls", [ICPlan, GVPCPlan, VPCPlan])
def test_plan_endpoints(plan_cls):
    """alpha/sigma boundary behavior: x_t ~ x0 at t≈0, x_t ~ x1 at t≈1."""
    plan = plan_cls()
    x0 = jnp.ones((4, 3)) * 2.0
    x1 = -jnp.ones((4, 3))
    t_lo = jnp.full((4,), 1e-5)
    t_hi = jnp.full((4,), 1.0 - 1e-5)
    _, xt_lo, _ = plan.plan(t_lo, x0, x1)
    _, xt_hi, _ = plan.plan(t_hi, x0, x1)
    # VP path has alpha(0) = exp(log_mean_coeff(0)) ≈ 6.6e-3, not exactly 0
    atol = 0.05 if plan_cls is VPCPlan else 2e-3
    np.testing.assert_allclose(np.asarray(xt_lo), 2.0, atol=atol)
    np.testing.assert_allclose(np.asarray(xt_hi), -1.0, atol=atol)


@pytest.mark.parametrize("plan_cls", [ICPlan, GVPCPlan])
def test_ut_is_time_derivative_of_xt(plan_cls):
    """u_t must equal d/dt x_t (finite-difference check)."""
    plan = plan_cls()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (8, 5))
    x1 = jax.random.normal(jax.random.PRNGKey(1), (8, 5))
    t = jnp.full((8,), 0.4)
    h = 1e-2  # large step: central difference is O(h^2) and fp32-stable
    _, xt_p, _ = plan.plan(t + h, x0, x1)
    _, xt_m, _ = plan.plan(t - h, x0, x1)
    _, _, ut = plan.plan(t, x0, x1)
    fd = (xt_p - xt_m) / (2 * h)
    np.testing.assert_allclose(np.asarray(ut), np.asarray(fd), rtol=2e-3, atol=2e-3)


def test_velocity_score_roundtrip():
    """velocity -> score -> velocity must be the identity (linear path)."""
    plan = ICPlan()
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (4, 6))
    v = jax.random.normal(jax.random.PRNGKey(3), (4, 6))
    t = jnp.full((4,), 0.3)
    score = plan.get_score_from_velocity(v, x, t)
    v_back = plan.get_velocity_from_score(score, x, t)
    np.testing.assert_allclose(np.asarray(v_back), np.asarray(v), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Transport loss
# ---------------------------------------------------------------------------
def test_create_transport_defaults():
    t = create_transport()
    assert t.model_type == ModelType.VELOCITY
    assert t.train_eps == 0.0 and t.sample_eps == 0.0
    assert t.check_interval(t.train_eps, t.sample_eps) == (0.0, 1.0)


def test_training_loss_zero_for_perfect_model():
    """A model returning the exact interpolant velocity gets ~0 loss."""
    transport = create_transport()
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (16, 4, 8))

    # For the linear path ut = x1 - x0 and xt = t*x1 + (1-t)*x0, so
    # x0 = (x1*t - xt)/(t-1)... instead cheat: capture (x0, x1) via closure by
    # re-deriving x0 from xt: x0 = (xt - t*x1) / (1-t).
    def perfect_model(xt, t):
        te = t.reshape(-1, 1, 1)
        x0 = (xt - te * x1) / (1.0 - te)
        return x1 - x0

    out = transport.training_losses(perfect_model, key, x1)
    assert float(out["loss"].mean()) < 1e-8


def test_training_loss_nonzero_for_zero_model():
    transport = create_transport()
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (64, 4, 8))
    out = transport.training_losses(lambda xt, t: jnp.zeros_like(xt), key, x1)
    # E||x1 - x0||^2 per-dim = 2 for standard normals
    assert float(out["loss"].mean()) == pytest.approx(2.0, rel=0.2)


def test_mean_flat():
    x = jnp.arange(24.0).reshape(2, 3, 4)
    np.testing.assert_allclose(
        np.asarray(mean_flat(x)), np.arange(24.0).reshape(2, -1).mean(1)
    )


def test_prior_logp():
    transport = create_transport()
    z = jnp.zeros((2, 3, 4))
    want = -12 / 2 * np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(transport.prior_logp(z)), want, rtol=1e-4)


# ---------------------------------------------------------------------------
# Integrators: convergence on closed-form flows
# ---------------------------------------------------------------------------
def _linear_drift(x, t):
    return -x  # solution x(t) = x(0) e^{-t}


def test_euler_convergence():
    x = jnp.ones((2, 3))
    out = odeint_euler(_linear_drift, x, 0.0, 1.0, 2000)
    np.testing.assert_allclose(np.asarray(out), np.exp(-1.0), rtol=1e-3)


def test_heun_more_accurate_than_euler():
    x = jnp.ones((2, 3))
    e = np.abs(np.asarray(odeint_euler(_linear_drift, x, 0.0, 1.0, 50)) - np.exp(-1))
    h = np.abs(np.asarray(odeint_heun(_linear_drift, x, 0.0, 1.0, 50)) - np.exp(-1))
    assert h.max() < e.max() / 10


def test_dopri5_accuracy():
    x = jnp.ones((2, 3))
    out = odeint_dopri5(_linear_drift, x, 0.0, 1.0, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.exp(-1.0), rtol=1e-5)


def test_dopri5_nonautonomous():
    """dx/dt = t  =>  x(1) = x(0) + 0.5."""
    drift = lambda x, t: jnp.broadcast_to(t[:, None], x.shape)
    x = jnp.zeros((4, 1))
    out = odeint_dopri5(drift, x, 0.0, 1.0, rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-5)


def test_dopri5_jittable():
    f = jax.jit(lambda x: odeint_dopri5(_linear_drift, x, 0.0, 1.0))
    np.testing.assert_allclose(np.asarray(f(jnp.ones((2, 2)))), np.exp(-1), rtol=1e-4)


def test_sde_euler_ou_moments():
    """OU process dx = -x dt + sqrt(2 g) dW (g=0.25) has stationary var = g/γ = 0.25."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (20_000, 1)) * 0.5  # start at stationary var 0.25
    drift = lambda x, t: -x
    diffusion = lambda x, t: jnp.asarray(0.25, x.dtype)  # integrator applies sqrt(2g)
    out = np.asarray(sdeint(drift, diffusion, key, x, 0.0, 2.0, 200, method="Euler"))
    assert out.mean() == pytest.approx(0.0, abs=0.02)
    assert out.var() == pytest.approx(0.25, rel=0.1)


# ---------------------------------------------------------------------------
# End-to-end: sample a known Gaussian flow
# ---------------------------------------------------------------------------
def test_sampler_ode_recovers_shifted_gaussian():
    """With the exact velocity field for x1 ~ N(m, I), ODE sampling from
    x0 ~ N(0, I) must land on N(m, I) (linear path: E[v|xt] has closed form)."""
    m = 3.0
    transport = create_transport()
    sampler = Sampler(transport)

    def true_velocity(x, t):
        # For x1~N(m,I): E[x1|xt] = (t*xt + (1-t)*m*t... use posterior formula.
        # xt = t x1 + (1-t) x0, x0,x1 indep N(0,I)/N(m,I):
        # E[x1|xt] = (m (1-t)^2 + t (xt)) ... derive: Cov(x1,xt)=t, Var(xt)=t^2+(1-t)^2
        te = t.reshape(-1, *([1] * (x.ndim - 1)))
        var = te**2 + (1 - te) ** 2
        e_x1 = m + te * (x - te * m) / var
        e_x0 = (x - te * e_x1) / (1 - te + 1e-12)
        return e_x1 - e_x0

    sample_fn = sampler.sample_ode(sampling_method="euler", num_steps=100)
    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (5000, 2))
    out = np.asarray(sample_fn(init, true_velocity))
    assert out.mean() == pytest.approx(m, abs=0.1)
    assert out.var() == pytest.approx(1.0, rel=0.15)


@pytest.mark.parametrize("prediction", ["noise", "score"])
def test_nonvelocity_predictions(prediction):
    """Noise/score parameterizations: eps intervals, weighted losses, and
    drift conversion all run and produce finite values."""
    transport = create_transport(prediction=prediction, loss_weight="likelihood")
    assert transport.train_eps == 1e-3  # per-path defaults (factory parity)
    t0, t1 = transport.check_interval(transport.train_eps, transport.sample_eps)
    assert t0 > 0 and t1 < 1
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (8, 4))
    out = transport.training_losses(lambda xt, t: jnp.zeros_like(xt), key, x1)
    assert np.isfinite(float(out["loss"].mean()))
    # drift conversion wraps the model output into a PF-ODE drift
    drift = transport.get_drift()
    d = drift(x1, jnp.full((8,), 0.5), lambda x, t: jnp.ones_like(x))
    assert d.shape == x1.shape and np.isfinite(np.asarray(d)).all()
    score = transport.get_score()
    s = score(x1, jnp.full((8,), 0.5), lambda x, t: jnp.ones_like(x))
    assert np.isfinite(np.asarray(s)).all()


def test_velocity_loss_weight_noop():
    """Reference quirk #3: loss_weight='velocity' is a no-op for velocity
    prediction (weights only apply to noise/score parameterizations)."""
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (16, 4))
    model = lambda xt, t: jnp.zeros_like(xt)
    a = create_transport(loss_weight="velocity").training_losses(model, key, x1)
    b = create_transport(loss_weight=None).training_losses(model, key, x1)
    np.testing.assert_array_equal(np.asarray(a["loss"]), np.asarray(b["loss"]))
