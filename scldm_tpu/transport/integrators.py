"""ODE / SDE integrators as jittable XLA programs.

The reference (src/scldm/transport/integrators.py) drives its sampling loop from
Python — fixed-step Euler/Heun loops and `torchdiffeq.odeint` (dopri5). On TPU
the entire integration must live inside one compiled program, so:

- fixed-step Euler / Heun          -> `jax.lax.scan` over a static step count
- stochastic Euler–Maruyama / Heun -> `jax.lax.scan` with per-step rng folding
- adaptive Dormand–Prince 5(4)     -> `jax.lax.while_loop` with PI step control
  (tolerance semantics matching torchdiffeq's mixed rms error norm)

All drift functions take (x, t_vec) where t_vec has shape (batch,), mirroring
how the reference broadcasts scalar solver time to a per-sample vector
(integrators.py:103-105).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

DriftFn = Callable[[jax.Array, jax.Array], jax.Array]


def _t_vec(x: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.full((x.shape[0],), t, dtype=jnp.result_type(float))


# ---------------------------------------------------------------------------
# Fixed-step ODE solvers
# ---------------------------------------------------------------------------


def odeint_euler(
    drift: DriftFn, x: jax.Array, t0: float, t1: float, num_steps: int
) -> jax.Array:
    """Explicit Euler over `num_steps - 1` strides of linspace(t0, t1, num_steps).

    Matches the reference fixed-step convention where `num_steps` counts saved
    points, i.e. num_steps-1 function evaluations (integrators.py:95-111).
    """
    ts = jnp.linspace(t0, t1, num_steps)
    dt = ts[1] - ts[0]

    def step(xc, t):
        return xc + dt * drift(xc, _t_vec(xc, t)), None

    x_final, _ = jax.lax.scan(step, x, ts[:-1])
    return x_final


def odeint_heun(
    drift: DriftFn, x: jax.Array, t0: float, t1: float, num_steps: int
) -> jax.Array:
    """Explicit trapezoidal (Heun) fixed-step solver."""
    ts = jnp.linspace(t0, t1, num_steps)
    dt = ts[1] - ts[0]

    def step(xc, t):
        k1 = drift(xc, _t_vec(xc, t))
        k2 = drift(xc + dt * k1, _t_vec(xc, t + dt))
        return xc + 0.5 * dt * (k1 + k2), None

    x_final, _ = jax.lax.scan(step, x, ts[:-1])
    return x_final


# ---------------------------------------------------------------------------
# Adaptive Dormand–Prince 5(4)
# ---------------------------------------------------------------------------

# Butcher tableau (same coefficients as torchdiffeq / scipy RK45).
_DP_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = [
    jnp.array([]),
    jnp.array([1 / 5]),
    jnp.array([3 / 40, 9 / 40]),
    jnp.array([44 / 45, -56 / 15, 32 / 9]),
    jnp.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]),
    jnp.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]),
    jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]),
]
_DP_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DP_B4 = jnp.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


def odeint_dopri5(
    drift: DriftFn,
    x: jax.Array,
    t0: float,
    t1: float,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 1000,
    safety: float = 0.9,
    min_factor: float = 0.2,
    max_factor: float = 10.0,
) -> jax.Array:
    """Adaptive RK45 to t1 inside a single `lax.while_loop`.

    Error control matches torchdiffeq's mixed rms norm:
        err = sqrt(mean((e / (atol + rtol * max(|y0|, |y1|)))**2))
    Steps with err > 1 are rejected and retried with a smaller dt. The step is
    always clipped so the final stride lands exactly on t1. `max_steps` bounds
    the loop for XLA (reaching it silently returns the current state — at the
    default tolerances the DiT velocity field converges in far fewer steps).
    """
    dtype = jnp.result_type(float)
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    span = t1 - t0

    def rk_step(xc, t, dt):
        ks = []
        for i in range(7):
            xi = xc
            if i > 0:
                acc = jnp.zeros_like(xc)
                for j, aij in enumerate(_DP_A[i]):
                    acc = acc + aij * ks[j]
                xi = xc + dt * acc
            ks.append(drift(xi, _t_vec(xc, t + _DP_C[i] * dt)))
        k_stack = jnp.stack(ks)
        x5 = xc + dt * jnp.tensordot(_DP_B5, k_stack, axes=1)
        x4 = xc + dt * jnp.tensordot(_DP_B4, k_stack, axes=1)
        return x5, x5 - x4

    def err_norm(e, y0, y1):
        scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
        return jnp.sqrt(jnp.mean(jnp.square(e / scale)))

    # Initial dt: conservative fraction of the interval; the controller adapts
    # within a couple of steps, so a cheap heuristic suffices under jit.
    dt0 = span / 100.0

    def cond(state):
        t, _x, _dt, n = state
        return jnp.logical_and(t < t1 - 1e-12, n < max_steps)

    def body(state):
        t, xc, dt, n = state
        dt = jnp.minimum(dt, t1 - t)
        x_new, e = rk_step(xc, t, dt)
        err = err_norm(e, xc, x_new)
        accept = err <= 1.0
        factor = jnp.clip(
            safety * jnp.power(jnp.maximum(err, 1e-10), -0.2), min_factor, max_factor
        )
        dt_next = dt * factor
        t = jnp.where(accept, t + dt, t)
        xc = jnp.where(accept, x_new, xc)
        return (t, xc, dt_next, n + 1)

    _, x_final, _, _ = jax.lax.while_loop(cond, body, (t0, x, dt0, jnp.array(0)))
    return x_final


# ---------------------------------------------------------------------------
# Fixed-step SDE solvers (reference integrators.py:29-75)
# ---------------------------------------------------------------------------


def sdeint(
    drift: DriftFn,
    diffusion: Callable[[jax.Array, jax.Array], jax.Array],
    key: jax.Array,
    x: jax.Array,
    t0: float,
    t1: float,
    num_steps: int,
    method: str = "Euler",
) -> jax.Array:
    """Euler–Maruyama or stochastic Heun over linspace(t0, t1, num_steps)[:-1].

    Returns the state after the scan (the reference's `xs[-1]` before its
    deterministic last step; transport.py:312-315).
    """
    ts = jnp.linspace(t0, t1, num_steps)
    dt = ts[1] - ts[0]
    sqrt_dt = jnp.sqrt(dt)

    def em_step(carry, t):
        xc, k = carry
        k, sub = jax.random.split(k)
        dw = jax.random.normal(sub, xc.shape, xc.dtype) * sqrt_dt
        d = drift(xc, _t_vec(xc, t))
        g = diffusion(xc, _t_vec(xc, t))
        x_next = xc + d * dt + jnp.sqrt(2.0 * g) * dw
        return (x_next, k), None

    def heun_step(carry, t):
        # Stochastic Heun as in reference integrators.py:39-48.
        xc, k = carry
        k, sub = jax.random.split(k)
        dw = jax.random.normal(sub, xc.shape, xc.dtype) * sqrt_dt
        tv = _t_vec(xc, t)
        g = diffusion(xc, tv)
        xhat = xc + jnp.sqrt(2.0 * g) * dw
        k1 = drift(xhat, tv)
        xp = xhat + dt * k1
        k2 = drift(xp, _t_vec(xc, t + dt))
        return (xhat + 0.5 * dt * (k1 + k2), k), None

    step = {"Euler": em_step, "Heun": heun_step}[method]
    (x_final, _), _ = jax.lax.scan(step, (x, key), ts[:-1])
    return x_final
