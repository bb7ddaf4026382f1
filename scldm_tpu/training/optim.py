"""Optimizer + LR schedule, parity with the reference implementations.

- `wsd_schedule`: warmup–stable–decay multiplier (reference _utils.py:19-59),
  expressed as a traced-jnp function usable directly as an optax schedule.
- `adamw_legacy`: optax reimplementation of the reference timm-style AdamW
  (optimizers.py:16-142): decoupled weight decay applied multiplicatively
  *before* the update, optional AMSGrad, and optional "cautious" masking
  (zero updates whose sign disagrees with the gradient, arXiv 2411.16085).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def wsd_schedule(
    num_training_steps: int,
    final_lr_factor: float = 0.1,
    num_warmup_steps: int = 1000,
    init_div_factor: float = 100,
    fract_decay: float = 0.1,
    decay_type: str = "cosine",
):
    """Return multiplier(step) — warmup, hold at 1.0, cosine or sqrt decay."""
    n_anneal_steps = int(fract_decay * num_training_steps)
    n_hold = num_training_steps - n_anneal_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (step / num_warmup_steps) + (1 - step / num_warmup_steps) / init_div_factor
        if decay_type == "cosine":
            decay_progress = (step - num_warmup_steps) / max(
                num_training_steps - num_warmup_steps, 1
            )
            decayed = final_lr_factor + (1 - final_lr_factor) * 0.5 * (
                1 + jnp.cos(jnp.pi * decay_progress)
            )
        elif decay_type == "sqrt":
            decayed = final_lr_factor + (1 - final_lr_factor) * (
                1 - jnp.sqrt(jnp.maximum(step - n_hold, 0) / max(n_anneal_steps, 1))
            )
        else:
            raise ValueError(f"decay type {decay_type} is not in ['cosine','sqrt']")
        # branch precedence must mirror the reference's if-chain
        # (_utils.py wsd_schedule): warmup WINS over hold/decay even when
        # n_hold < num_warmup_steps — with fract_decay=1.0 (the LDM default)
        # n_hold is 0, and decay-first ordering would silently eliminate the
        # warmup ramp entirely (lr_mult ~0.97 at step 0 instead of 0.01)
        return jnp.where(
            step < num_warmup_steps,
            warm,
            jnp.where(
                step < n_hold,
                1.0,
                jnp.where(step < num_training_steps, decayed, final_lr_factor),
            ),
        )

    return schedule


class AdamWLegacyState(NamedTuple):
    count: jax.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    max_exp_avg_sq: Optional[optax.Updates]


def adamw_legacy(
    learning_rate: float | optax.Schedule = 1e-3,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    amsgrad: bool = False,
    caution: bool = False,
) -> optax.GradientTransformation:
    """Reference AdamWLegacy as a single optax transformation.

    Update rule per parameter p with gradient g (optimizers.py:85-140):
        p *= 1 - lr * wd                                   (decay first)
        m = b1 m + (1-b1) g ;  v = b2 v + (1-b2) g^2
        denom = sqrt(v_hat / bc2) + eps   (v_hat = max-accum if amsgrad)
        if caution: m *= mask/(mean(mask) clamped >= 1e-3), mask = (m*g > 0)
        p -= lr/bc1 * m / denom
    Returned updates therefore *include* the weight-decay shrinkage term.
    """
    b1, b2 = betas

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamWLegacyState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
            max_exp_avg_sq=jax.tree_util.tree_map(jnp.zeros_like, params) if amsgrad else None,
        )

    def update_fn(grads, state, params):
        assert params is not None, "adamw_legacy requires params"
        count = state.count + 1
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        exp_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, grads
        )
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.exp_avg_sq, grads
        )
        if amsgrad:
            max_sq = jax.tree_util.tree_map(jnp.maximum, state.max_exp_avg_sq, exp_avg_sq)
            denom_src = max_sq
        else:
            max_sq = None
            denom_src = exp_avg_sq

        step_size = lr / bc1

        def one_update(m, v, g, p):
            denom = jnp.sqrt(v / bc2) + eps
            m_eff = m
            if caution:
                mask = (m * g > 0).astype(g.dtype)
                mask = mask / jnp.maximum(mask.mean(), 1e-3)
                m_eff = m * mask
            # total delta includes the multiplicative decoupled weight decay
            return -step_size * m_eff / denom - lr * weight_decay * p

        updates = jax.tree_util.tree_map(one_update, exp_avg, denom_src, grads, params)
        return updates, AdamWLegacyState(count, exp_avg, exp_avg_sq, max_sq)

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_global_norm(max_norm: float) -> optax.GradientTransformation:
    """Gradient clipping matching Lightning's gradient_clip_val (norm-based)."""
    return optax.clip_by_global_norm(max_norm)
