"""Per-condition log-library-size sampling for generation.

The reference draws one Normal per sample in a Python loop over the batch
(models.py:473-597 `_sample_log_size_factors`). TPU-native version: bake the
per-class mu/sd statistics into dense tables at construction and gather +
sample the whole batch in one traced op. Missing statistics fall back to zero
(matching the reference's warn-once + zeros degradation).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def constant_stats(class_vocab_sizes: Dict[str, int], mu: float = 6.0, sd: float = 0.1):
    """Minimal stats carrier: a SizeFactorSampler source with the same mu/sd
    for every class — for benches, dryruns, and smoke tests that need a
    sampler without metadata files."""

    class _Stats:
        mu_size_factor = {
            k: {i: mu for i in range(n)} for k, n in class_vocab_sizes.items()
        }
        sd_size_factor = {
            k: {i: sd for i in range(n)} for k, n in class_vocab_sizes.items()
        }
        joint_key = None
        joint_components = None
        joint_idx_2_classes = None

    _Stats.class_vocab_sizes = dict(class_vocab_sizes)
    return _Stats()


class SizeFactorSampler:
    """Vectorized Normal(mu[class], sd[class]) sampler over condition labels."""

    def __init__(self, vocab_encoder, condition_strategy: str = "mutually_exclusive"):
        self.strategy = condition_strategy
        self.tables: Dict[str, tuple[jnp.ndarray, jnp.ndarray]] = {}
        self.joint_table: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None
        self.joint_components = getattr(vocab_encoder, "joint_components", None)

        mu_map = getattr(vocab_encoder, "mu_size_factor", None)
        sd_map = getattr(vocab_encoder, "sd_size_factor", None)
        if mu_map is None or sd_map is None:
            return

        if condition_strategy == "joint" and vocab_encoder.joint_key is not None:
            jk = vocab_encoder.joint_key
            if jk in mu_map and jk in sd_map and vocab_encoder.joint_idx_2_classes:
                c1, c2 = vocab_encoder.class_vocab_sizes.keys()
                n1 = vocab_encoder.class_vocab_sizes[c1]
                n2 = vocab_encoder.class_vocab_sizes[c2]
                mu_t = np.zeros((n1, n2), np.float32)
                sd_t = np.zeros((n1, n2), np.float32)
                for key, token in vocab_encoder.joint_idx_2_classes.items():
                    i1, i2 = (int(v) for v in key.split("_"))
                    mu_t[i1, i2] = mu_map[jk].get(token, 0.0)
                    sd_t[i1, i2] = sd_map[jk].get(token, 0.0)
                self.joint_table = (jnp.asarray(mu_t), jnp.asarray(sd_t))
        else:
            for label, stats in (mu_map or {}).items():
                if sd_map is None or label not in sd_map:
                    continue
                n = max(stats.keys()) + 1 if stats else 0
                mu_t = np.zeros((n,), np.float32)
                sd_t = np.zeros((n,), np.float32)
                for idx, v in stats.items():
                    mu_t[idx] = v
                for idx, v in sd_map[label].items():
                    if idx < n:
                        sd_t[idx] = v
                self.tables[label] = (jnp.asarray(mu_t), jnp.asarray(sd_t))

    def sample(
        self,
        rng: jax.Array,
        condition: Optional[Dict[str, jax.Array]],
        batch_size: int,
    ) -> jax.Array:
        """log size factors (batch_size,). Zeros when stats/condition missing."""
        if condition is None:
            return jnp.zeros((batch_size,), jnp.float32)

        if self.strategy == "joint" and self.joint_table is not None:
            keys = [k for k in (self.joint_components or list(condition.keys())) if k in condition]
            if len(keys) == 2:
                mu_t, sd_t = self.joint_table
                i1 = condition[keys[0]].astype(jnp.int32)
                i2 = condition[keys[1]].astype(jnp.int32)
                mu = mu_t[i1, i2]
                sd = sd_t[i1, i2]
                return mu + sd * jax.random.normal(rng, (batch_size,), jnp.float32)

        # independent path: first condition key with stats (sorted for determinism)
        for label in sorted(condition.keys()):
            if label in self.tables:
                mu_t, sd_t = self.tables[label]
                idx = jnp.clip(condition[label].astype(jnp.int32), 0, mu_t.shape[0] - 1)
                mu = mu_t[idx]
                sd = sd_t[idx]
                return mu + sd * jax.random.normal(rng, (batch_size,), jnp.float32)
        return jnp.zeros((batch_size,), jnp.float32)
