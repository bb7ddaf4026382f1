#!/usr/bin/env python
"""Batch-size scaling study (VERDICT r2 item 7): ms/step and cells/s at
dentate and parse1m shapes for batch sizes beyond the reference default.

B=128 is the reference's (GPU-memory-shaped) default; a TPU-native deployment
should pick the batch that maximizes device throughput and rescale LR /
step counts accordingly (perf numbers only — optimizer equivalence at larger
batches is the usual LR-scaling caveat, see README).

Run: python -m benchmarks.bench_batch_scaling [--config dentate|parse1m] [--batches 128 256 512]
Prints one JSON line per point.
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


def synth_batch(rng, batch, n_genes, seq_len, nnz_range):
    from benchmarks.bench_census import synth_batch as _canonical

    return _canonical(rng, batch, n_genes, seq_len, nnz_range=nnz_range)


def run_point(
    config: str, batch_size: int, steps: int, tail: str = "auto",
    lean_loss: bool = False,
) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.training.vae_task import VAETask

    cfg = SHAPES[config]
    vae = build_transformer_vae(n_genes=cfg["n_genes"], dtype=jnp.bfloat16)
    # decoder-tail dispatch A/B (the B>MAX_FUSED_BATCH fallback study):
    # auto = production dispatch; the forced variants isolate one path each
    tail_kw = {
        "auto": {},
        "fused": dict(fused_decoder=True, algebraic_tail=False),
        "fused_chunked": dict(
            fused_decoder=True, algebraic_tail=False, fused_batch_chunk=128
        ),
        "algebraic": dict(fused_decoder=False, algebraic_tail=True),
        "module": dict(fused_decoder=False, algebraic_tail=False),
    }[tail]
    task = VAETask(vae, num_training_steps=10_000, lean_loss=lean_loss, **tail_kw)
    batch = synth_batch(
        np.random.default_rng(0), batch_size, cfg["n_genes"], cfg["seq_len"], cfg["nnz"]
    )
    state = task.init_state(jax.random.PRNGKey(0), batch)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.stack([x] * steps)), batch
    )
    state, metrics = task.train_steps(state, stacked)  # compile + warm
    assert np.isfinite(float(metrics["train_loss"]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, metrics = task.train_steps(state, stacked)
        _ = float(metrics["train_loss"])  # scalar-fetch sync (tunnel-safe)
        best = min(best, (time.perf_counter() - t0) / steps)
    return {
        "config": config,
        "batch": batch_size,
        "tail": tail,
        "lean_loss": lean_loss,
        "ms_per_step": round(best * 1e3, 2),
        "cells_per_sec": round(batch_size / best, 1),
        "platform": jax.default_backend(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["dentate", "parse1m"],
                    choices=list(SHAPES))
    ap.add_argument("--batches", nargs="+", type=int, default=[128, 256, 512])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--tail", default="auto",
                    choices=["auto", "fused", "fused_chunked", "algebraic", "module"],
                    help="force one decoder-tail dispatch path (A/B for the "
                         "B>MAX_FUSED_BATCH fallback study)")
    ap.add_argument("--lean-loss", action="store_true",
                    help="densify-free NB train loss (vae_loss_lean): skips "
                         "the 7.5-33 ms densify scatter; its gather backward "
                         "scatters instead — the A/B this flag exists for")
    args = ap.parse_args()
    for config in args.configs:
        base = None
        for b in args.batches:
            r = run_point(config, b, args.steps, tail=args.tail,
                          lean_loss=args.lean_loss)
            base = base or r["cells_per_sec"]
            r["throughput_vs_first"] = round(r["cells_per_sec"] / base, 2)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
