"""Exponential moving average of a parameter pytree.

Semantics of ema-pytorch (reference models.py:446-453 uses EMA(beta=0.9999,
update_every=10, update_after_step=10_000)):

- steps before `update_after_step`: EMA params copy the online params;
- afterwards, every `update_every`-th call blends with a decay that ramps as
  1 - (1 + epoch/inv_gamma)^(-power) clamped to [min_value, beta], where
  epoch = step - update_after_step - 1.

Pure-pytree implementation: state is (params, step), update is jittable and
donatable.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any
    step: jax.Array  # number of .update() calls so far


def ema_init(params) -> EMAState:
    # materialize fresh buffers: aliasing the online params would make the
    # train state donate the same buffer twice
    return EMAState(
        params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
        step=jnp.zeros([], jnp.int32),
    )


def current_decay(
    step: jax.Array,
    beta: float = 0.9999,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> jax.Array:
    epoch = jnp.clip(step - update_after_step - 1, 0, None).astype(jnp.float32)
    value = 1.0 - (1.0 + epoch / inv_gamma) ** (-power)
    value = jnp.clip(value, min_value, beta)
    return jnp.where(epoch <= 0, 0.0, value)


def ema_update(
    state: EMAState,
    online_params,
    *,
    beta: float = 0.9999,
    update_every: int = 10,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> EMAState:
    """One EMA tick (call once per optimizer step, as in models.py:83-87)."""
    step = state.step + 1
    should_update = (step % update_every) == 0
    decay = current_decay(step, beta, update_after_step, inv_gamma, power, min_value)

    # lax.cond (not where): the identity branch skips the blend entirely, so
    # the (update_every - 1)/update_every skipped steps cost nothing
    def do_blend(operand):
        ema_params, online = operand
        return jax.tree_util.tree_map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
            ema_params,
            online,
        )

    new_params = jax.lax.cond(
        should_update, do_blend, lambda op: op[0], (state.params, online_params)
    )
    return EMAState(params=new_params, step=step)
