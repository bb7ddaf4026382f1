#!/usr/bin/env python
"""Tile/batch tuner for the fused decoder-tail kernel (VERDICT r3 item 3).

The backward kernel's scoped-VMEM use grows with batch (full-resident dk/dv
accumulators) and with the bwd gene tile; round 3 swept tiles at B=128 only,
and B=256 at parse1m shapes crashes compile (66.4M vs 64M). This sweeps
(bwd_block_g, bwd_block_b) per (config, batch), timing a jitted
value_and_grad over fused_nb_apply — compile failures are recorded, not
fatal — so the kernel defaults / MAX_FUSED_BATCH gate can be set from
measurement instead of extrapolation.

Run: python -m benchmarks.tune_fused_tail [--configs dentate parse1m]
     [--batches 128 256] [--tiles 1024x8 512x8 256x8 1024x16 512x16]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

SHAPES = {
    "dentate": dict(n_genes=17_002, seq_len=6_147, nnz=(1_500, 4_000)),
    "parse1m": dict(n_genes=2_000, seq_len=2_000, nnz=(500, 1_999)),
}


def run_point(config, batch_size, bg, bb, reps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.bench_census import synth_batch
    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.training.vae_task import VAETask, fused_nb_apply, vae_loss

    cfg = SHAPES[config]
    vae = build_transformer_vae(n_genes=cfg["n_genes"], dtype=jnp.bfloat16)
    task = VAETask(vae, num_training_steps=1_000)
    batch = synth_batch(
        np.random.default_rng(0), batch_size, cfg["n_genes"], cfg["seq_len"],
        nnz_range=cfg["nnz"],
    )
    state = task.init_state(jax.random.PRNGKey(0), batch)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_fn(params):
        mat = task._materialize(dev_batch)
        if bg == 0:  # module-path baseline (tile "module")
            out, _ = task._apply(params, mat, train=False)
        else:
            out, _ = fused_nb_apply(
                vae, params, dev_batch, train=False, bwd_tiles=(bg, bb)
            )
        return vae_loss(mat["counts"], out, False)

    step = jax.jit(jax.value_and_grad(loss_fn))
    loss, grads = step(state.params)
    _ = float(loss)  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        loss, grads = step(state.params)
        _ = float(loss)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["dentate", "parse1m"],
                    choices=list(SHAPES))
    ap.add_argument("--batches", nargs="+", type=int, default=[128, 256])
    ap.add_argument("--tiles", nargs="+",
                    default=["1024x8", "512x8", "256x8", "1024x16", "512x16"])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    for config in args.configs:
        for b in args.batches:
            for tile in args.tiles:
                # tile "module" = the plain flax path (fused kernel bypassed):
                # the baseline any tile must beat to stay admitted
                bg, bb = (0, 0) if tile == "module" else (
                    int(v) for v in tile.split("x")
                )
                row = {"metric": "fused_tail_fwd_bwd_ms", "value": None,
                       "unit": "ms", "vs_baseline": None, "config": config,
                       "batch": b, "tile": tile}
                try:
                    row["value"] = round(run_point(config, b, bg, bb, args.reps), 2)
                except Exception as e:
                    row["error"] = str(e)[-250:]
                print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
