"""Entropic-regularized Wasserstein distance (log-domain Sinkhorn in JAX).

Replaces the reference's POT `ot.sinkhorn2` / `ot.emd2` calls
(evaluations.py:85-108): same contract — uniform marginals, Euclidean cost to
the given power, `sqrt` applied for power 2 — implemented as a jittable
fixed-point iteration with convergence check in a `lax.while_loop`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _cdist(x: jax.Array, y: jax.Array) -> jax.Array:
    x2 = jnp.sum(x * x, 1, keepdims=True)
    y2 = jnp.sum(y * y, 1, keepdims=True)
    sq = jnp.maximum(x2 - 2.0 * x @ y.T + y2.T, 0.0)
    return jnp.sqrt(sq)


@partial(jax.jit, static_argnames=("power", "max_iters"))
def sinkhorn_divergence(
    x0: jax.Array,
    x1: jax.Array,
    reg: float = 0.05,
    power: int = 2,
    max_iters: int = 10_000,
    tol: float = 1e-9,
) -> jax.Array:
    """<P, M> under entropic OT with uniform marginals (ot.sinkhorn2 parity)."""
    n, m = x0.shape[0], x1.shape[0]
    M = _cdist(x0.astype(jnp.float32), x1.astype(jnp.float32))
    if power == 2:
        M = M * M
    log_a = jnp.full((n,), -jnp.log(n))
    log_b = jnp.full((m,), -jnp.log(m))
    def cond(carry):
        f, g, it, err = carry
        return jnp.logical_and(it < max_iters, err > tol)

    def body(carry):
        f, g, it, _ = carry
        # log-domain updates: f_i = reg*(log a_i - logsumexp_j((g_j - M_ij)/reg))
        f_new = reg * (log_a - jax.nn.logsumexp((g[None, :] - M) / reg, axis=1))
        g_new = reg * (log_b - jax.nn.logsumexp((f_new[:, None] - M) / reg, axis=0))
        # marginal violation of the row sums
        log_P_row = jax.nn.logsumexp((f_new[:, None] + g_new[None, :] - M) / reg, axis=1)
        err = jnp.max(jnp.abs(jnp.exp(log_P_row) - jnp.exp(log_a)))
        return f_new, g_new, it + 1, err

    f0 = jnp.zeros((n,))
    g0 = jnp.zeros((m,))
    f, g, _, _ = jax.lax.while_loop(cond, body, (f0, g0, jnp.array(0), jnp.array(jnp.inf)))
    log_P = (f[:, None] + g[None, :] - M) / reg
    cost = jnp.sum(jnp.exp(log_P) * M)
    return cost


def wasserstein(
    x0,
    x1,
    method: str = "sinkhorn",
    reg: float = 0.05,
    power: int = 2,
) -> float:
    """W_p estimate (evaluations.py:85-108). `emd` uses exact assignment when
    the two samples have equal size (uniform-marginal EMD == optimal matching);
    otherwise falls back to sinkhorn."""
    assert power in (1, 2)
    x0 = jnp.asarray(x0)
    x1 = jnp.asarray(x1)
    if method == "emd" and x0.shape[0] == x1.shape[0]:
        from scipy.optimize import linear_sum_assignment
        import numpy as np

        M = np.asarray(_cdist(x0, x1))
        if power == 2:
            M = M**2
        r, c = linear_sum_assignment(M)
        ret = float(M[r, c].mean())
    else:
        ret = float(sinkhorn_divergence(x0, x1, reg=reg, power=power))
    if power == 2:
        ret = ret**0.5
    return ret


#: Parity with reference models.py:46-49.
WASSERSTEIN_METRICS = {
    "wasserstein1_sinkhorn": partial(wasserstein, method="sinkhorn", power=1),
    "wasserstein2_sinkhorn": partial(wasserstein, method="sinkhorn", power=2),
}
