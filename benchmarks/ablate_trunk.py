#!/usr/bin/env python
"""Ablation: dentate-shape VAE train step with the fused whole-trunk Pallas
kernel (ops/fused_trunk.py) ON vs OFF. Run on the real TPU chip.

Prints ms/step and cells/s for each arm. Scalar-fetch sync per the tunneled
TPU timing rules (see bench.py header).
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
N_GENES = 17_002
SEQ_LEN = 6_147
K = 10


def synth_batch(rng):
    from benchmarks.bench_census import synth_batch as _canonical

    # dentate-gyrus-like sparsity (~2k expressed of 17k genes)
    return _canonical(rng, BATCH, N_GENES, SEQ_LEN, nnz_range=(1500, 4000))


def run(fused_trunk: bool) -> float:
    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.training.vae_task import VAETask

    vae = build_transformer_vae(n_genes=N_GENES, dtype=jnp.bfloat16)
    task = VAETask(vae, num_training_steps=10_000, fused_trunk=fused_trunk)
    print(f"  fused_decoder={task.fused_decoder} fused_trunk={task.fused_trunk}")
    batch = synth_batch(np.random.default_rng(0))
    state = task.init_state(jax.random.PRNGKey(0), batch)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.stack([x] * K)), batch
    )
    state, metrics = task.train_steps(state, stacked)
    assert np.isfinite(float(metrics["train_loss"]))
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        state, metrics = task.train_steps(state, stacked)
        loss = float(metrics["train_loss"])
        dt = time.perf_counter() - t0
        best = min(best, dt / K)
    assert np.isfinite(loss)
    return best


def main():
    for arm in (False, True):
        ms = run(arm) * 1e3
        print(
            f"fused_trunk={arm}: {ms:.2f} ms/step, "
            f"{BATCH / ms * 1e3:,.0f} cells/s"
        )


if __name__ == "__main__":
    main()
