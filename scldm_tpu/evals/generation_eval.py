"""Periodic generation evaluation during LDM validation.

Parity with reference LatentDiffusion.on_validation_epoch_end
(models.py:849-939): every `freq` epochs past `warmup_epochs`, generate at
least `sample_size` cells unconditionally, then compare generated vs real
counts with MMD (4 kernels), sinkhorn W1/W2, and R^2 of per-gene mean/var on
log1p-scaled counts.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scldm_tpu.constants import ModelEnum
from scldm_tpu.evals.mmd import MMD_METRICS
from scldm_tpu.evals.wasserstein import wasserstein
from scldm_tpu.training.metrics import r2_score
from scldm_tpu.utils.logger import logger

COUNTS = ModelEnum.COUNTS.value
LIB = ModelEnum.LIBRARY_SIZE.value


def should_run(epoch: int, cfg: Dict) -> bool:
    """Gate (models.py:853-859): enabled, epoch % freq == 0, past warmup, > 0."""
    return bool(
        cfg.get("enabled", False)
        and epoch % int(cfg.get("freq", 1)) == 0
        and epoch > int(cfg.get("warmup_epochs", 0))
        and epoch > 0
    )


def run_generation_eval(
    sample_fn,
    state,
    batches: Iterable[Dict[str, np.ndarray]],
    *,
    sample_size: int = 1024,
    rng_seed: int = 0,
) -> Dict[str, float]:
    """Generate >= sample_size cells (unconditional halves of the CFG output)
    against the corresponding real batches, then compute distribution metrics."""
    real, gen, libs = [], [], []
    n = 0
    for i, batch in enumerate(batches):
        if n >= sample_size:
            break
        genes = jnp.asarray(batch["genes"])
        counts, _ = sample_fn(state, jax.random.PRNGKey(rng_seed + i), genes, None)
        half = len(genes)
        gen.append(np.asarray(counts[:half]))  # unconditional half
        real.append(np.asarray(batch[COUNTS]))
        libs.append(np.asarray(batch[LIB]))
        n += half

    counts_real = np.concatenate(real)
    counts_gen = np.concatenate(gen)
    library = np.concatenate(libs)
    real_scaled = jnp.asarray(np.log1p(counts_real / library * 10_000.0))
    gen_scaled = jnp.asarray(np.log1p(counts_gen / library * 10_000.0))
    counts_real_j = jnp.asarray(counts_real)
    counts_gen_j = jnp.asarray(counts_gen)

    out: Dict[str, float] = {}
    for name, fn in MMD_METRICS.items():
        if "counts" in name:  # scaled-input kernels (models.py:902-906)
            out[f"generation_eval/{name}"] = float(fn(real_scaled, gen_scaled))
        else:
            out[f"generation_eval/{name}"] = float(fn(counts_real_j, counts_gen_j))
    out["generation_eval/wasserstein1_sinkhorn"] = wasserstein(
        real_scaled, gen_scaled, method="sinkhorn", power=1
    )
    out["generation_eval/wasserstein2_sinkhorn"] = wasserstein(
        real_scaled, gen_scaled, method="sinkhorn", power=2
    )
    out["generation_eval/r2_mean"] = float(
        r2_score(gen_scaled.mean(0), real_scaled.mean(0))
    )
    out["generation_eval/r2_var"] = float(r2_score(gen_scaled.var(0), real_scaled.var(0)))
    out["generation_eval/total_samples"] = float(len(counts_real))
    logger.info(
        "generation eval: "
        + " ".join(f"{k.split('/')[-1]}={v:.4g}" for k, v in out.items())
    )
    return out
