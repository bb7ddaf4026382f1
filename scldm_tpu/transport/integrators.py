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
    drift: DriftFn,
    x: jax.Array,
    t0: float,
    t1: float,
    num_steps: int,
    return_trajectory: bool = False,
) -> jax.Array:
    """Explicit Euler over `num_steps - 1` strides of linspace(t0, t1, num_steps).

    Matches the reference fixed-step convention where `num_steps` counts saved
    points, i.e. num_steps-1 function evaluations (integrators.py:95-111).
    With return_trajectory, returns the (num_steps, ...) saved states including
    the initial point — the torchdiffeq `odeint` output the reference callers
    index with `[-1]` (models.py:812).
    """
    ts = jnp.linspace(t0, t1, num_steps)
    dt = ts[1] - ts[0]

    def step(xc, t):
        x_next = xc + dt * drift(xc, _t_vec(xc, t))
        return x_next, x_next if return_trajectory else None

    x_final, ys = jax.lax.scan(step, x, ts[:-1])
    if return_trajectory:
        return jnp.concatenate([x[None], ys], axis=0)
    return x_final


def odeint_heun(
    drift: DriftFn,
    x: jax.Array,
    t0: float,
    t1: float,
    num_steps: int,
    return_trajectory: bool = False,
) -> jax.Array:
    """Explicit trapezoidal (Heun) fixed-step solver."""
    ts = jnp.linspace(t0, t1, num_steps)
    dt = ts[1] - ts[0]

    def step(xc, t):
        k1 = drift(xc, _t_vec(xc, t))
        k2 = drift(xc + dt * k1, _t_vec(xc, t + dt))
        x_next = xc + 0.5 * dt * (k1 + k2)
        return x_next, x_next if return_trajectory else None

    x_final, ys = jax.lax.scan(step, x, ts[:-1])
    if return_trajectory:
        return jnp.concatenate([x[None], ys], axis=0)
    return x_final


def _odeint_fixed_tree(drift, x, t0: float, t1: float, num_steps: int, heun: bool):
    """Fixed-step Euler/Heun over an arbitrary pytree state (used by the
    likelihood ODE's augmented (x, logp) state)."""
    tmap = jax.tree_util.tree_map
    ts = jnp.linspace(t0, t1, num_steps)
    dt = ts[1] - ts[0]
    batch = jax.tree_util.tree_leaves(x)[0].shape[0]
    dtype = jnp.result_type(float)

    def step(xc, t):
        t_vec = jnp.full((batch,), t, dtype)
        k1 = drift(xc, t_vec)
        if not heun:
            return tmap(lambda a, b: a + dt * b, xc, k1), None
        xp = tmap(lambda a, b: a + dt * b, xc, k1)
        k2 = drift(xp, jnp.full((batch,), t + dt, dtype))
        return tmap(lambda a, b, c: a + 0.5 * dt * (b + c), xc, k1, k2), None

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
    drift,
    x,
    t0: float,
    t1: float,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 1000,
    safety: float = 0.9,
    min_factor: float = 0.2,
    max_factor: float = 10.0,
    save_ts=None,
):
    """Adaptive RK45 to t1 inside a single `lax.while_loop`.

    The state `x` may be ANY pytree (e.g. the (x, logp) augmented state of the
    likelihood ODE) — it is ravelled to one vector for the controller and the
    drift is wrapped accordingly. `drift(x_tree, t_vec)` must return a matching
    pytree; `t_vec` is sized by the leading axis of the first leaf.

    Error control matches torchdiffeq's mixed rms norm:
        err = sqrt(mean((e / (atol + rtol * max(|y0|, |y1|)))**2))
    Steps with err > 1 are rejected and retried with a smaller dt. The step is
    always clipped so the final stride lands exactly on t1. `max_steps` bounds
    the loop for XLA (reaching it silently returns the current state — at the
    default tolerances the DiT velocity field converges in far fewer steps).

    With `save_ts` (ascending array of save points spanning [t0, t1]), the
    integration runs segment-by-segment between consecutive save points, each
    segment fully adaptive, and returns the stacked states at every save point
    (the torchdiffeq saved-trajectory contract; reference transport.py:324-369
    returns this and callers take `[-1]`, models.py:812).
    """
    from jax.flatten_util import ravel_pytree

    dtype = jnp.result_type(float)
    x0_flat, unravel = ravel_pytree(x)
    batch = jax.tree_util.tree_leaves(x)[0].shape[0]

    def flat_drift(xf, t):
        t_vec = jnp.full((batch,), t, dtype)
        return ravel_pytree(drift(unravel(xf), t_vec))[0]

    def rk_step(xc, t, dt):
        ks = []
        for i in range(7):
            xi = xc
            if i > 0:
                acc = jnp.zeros_like(xc)
                for j, aij in enumerate(_DP_A[i]):
                    acc = acc + aij * ks[j]
                xi = xc + dt * acc
            ks.append(flat_drift(xi, t + _DP_C[i] * dt))
        k_stack = jnp.stack(ks)
        x5 = xc + dt * jnp.tensordot(_DP_B5, k_stack, axes=1)
        x4 = xc + dt * jnp.tensordot(_DP_B4, k_stack, axes=1)
        return x5, x5 - x4

    def err_norm(e, y0, y1):
        scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
        return jnp.sqrt(jnp.mean(jnp.square(e / scale)))

    def integrate(x_flat, t_a, t_b):
        t_a = jnp.asarray(t_a, dtype)
        t_b = jnp.asarray(t_b, dtype)
        # Initial dt: conservative fraction of the interval; the controller
        # adapts within a couple of steps, so a cheap heuristic suffices.
        dt0 = (t_b - t_a) / 100.0

        def cond(state):
            t, _x, _dt, n = state
            return jnp.logical_and(t < t_b - 1e-12, n < max_steps)

        def body(state):
            t, xc, dt, n = state
            dt = jnp.minimum(dt, t_b - t)
            x_new, e = rk_step(xc, t, dt)
            err = err_norm(e, xc, x_new)
            accept = err <= 1.0
            factor = jnp.clip(
                safety * jnp.power(jnp.maximum(err, 1e-10), -0.2),
                min_factor,
                max_factor,
            )
            dt_next = dt * factor
            t = jnp.where(accept, t + dt, t)
            xc = jnp.where(accept, x_new, xc)
            return (t, xc, dt_next, n + 1)

        _, x_final, _, _ = jax.lax.while_loop(cond, body, (t_a, x_flat, dt0, jnp.array(0)))
        return x_final

    if save_ts is None:
        return unravel(integrate(x0_flat, t0, t1))

    save_ts = jnp.asarray(save_ts, dtype)

    def seg(x_flat, bounds):
        x_next = integrate(x_flat, bounds[0], bounds[1])
        return x_next, x_next

    bounds = jnp.stack([save_ts[:-1], save_ts[1:]], axis=1)
    _, ys = jax.lax.scan(seg, x0_flat, bounds)
    traj_flat = jnp.concatenate([x0_flat[None], ys], axis=0)
    return jax.vmap(unravel)(traj_flat)


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
    return_trajectory: bool = False,
) -> jax.Array:
    """Euler–Maruyama or stochastic Heun over linspace(t0, t1, num_steps)[:-1].

    Returns the state after the scan (the reference's `xs[-1]` before its
    deterministic last step; transport.py:312-315), or with return_trajectory
    the (num_steps, ...) saved states including the initial point.
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
        return (x_next, k), x_next if return_trajectory else None

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
        x_next = xhat + 0.5 * dt * (k1 + k2)
        return (x_next, k), x_next if return_trajectory else None

    step = {"Euler": em_step, "Heun": heun_step}[method]
    (x_final, _), ys = jax.lax.scan(step, (x, key), ts[:-1])
    if return_trajectory:
        return jnp.concatenate([x[None], ys], axis=0)
    return x_final
