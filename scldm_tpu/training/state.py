"""Train-state containers (the functional replacement for LightningModules)."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from scldm_tpu.training.ema import EMAState


class TrainState(flax.struct.PyTreeNode):
    """Parameters + optimizer state + rng + step, one pytree for donation."""

    step: jax.Array
    params: Any
    opt_state: optax.OptState
    rng: jax.Array
    ema: Optional[EMAState] = None
    extra: Optional[Any] = None  # e.g. batch_stats for BatchNorm models


def create_train_state(
    rng: jax.Array,
    params: Any,
    tx: optax.GradientTransformation,
    ema: Optional[EMAState] = None,
    extra: Optional[Any] = None,
) -> TrainState:
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
        ema=ema,
        extra=extra,
    )
