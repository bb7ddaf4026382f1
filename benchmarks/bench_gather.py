#!/usr/bin/env python
"""Embedding-gather strategy study (round 5: the dentate B>128 superlinearity).

profile_vae segment attribution showed the input-embedding gather forward is
the ONLY superlinear segment: 1.14 ms at B=128 -> 7.47 ms at B=256 (6.5x for
2x the rows) at dentate shapes (S=6147, table (17003, 32) — reference
layers.py:97-118), while encoder/scatter/loss segments scale ~2x. This times
isolated formulations of the same lookup to find the fast regime:

  - embed2d:   table[idx] with (B, S) indices (the nn.Embed default)
  - flat:      table[idx.reshape(-1)].reshape(B, S, E)
  - chunk128:  concat of 128-row slices (the regime B=128 runs in)
  - flat_mul:  flat + the log1p(count) multiply fused (the real input layer)

Run: python -m benchmarks.bench_gather [--batches 128 256 512]
Prints one JSON line per (strategy, B).
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

N_GENES, SEQ_LEN, E = 17_002, 6_147, 32


def _time(f, args, n=20):
    out = f(*args)
    float(jnp.asarray(out).ravel()[0])  # provable sync on tunneled devices
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n - 1):
            f(*args)
        float(jnp.asarray(f(*args)).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", nargs="+", type=int, default=[128, 256, 512])
    args = p.parse_args()

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N_GENES + 1, E)).astype(np.float32))
    tb16 = table.astype(jnp.bfloat16)

    def embed2d(t, idx):
        return jnp.sum(t[idx].astype(jnp.float32))

    def flat(t, idx):
        B, S = idx.shape
        return jnp.sum(t[idx.reshape(-1)].reshape(B, S, E).astype(jnp.float32))

    def chunk128(t, idx):
        B = idx.shape[0]
        parts = [t[idx[lo : lo + 128]] for lo in range(0, B, 128)]
        return jnp.sum(jnp.concatenate(parts, 0).astype(jnp.float32))

    def flat_mul(t, idx, cnt):
        B, S = idx.shape
        g = t[idx.reshape(-1)].reshape(B, S, E)
        return jnp.sum((g * jnp.log1p(cnt)[..., None].astype(g.dtype)).astype(jnp.float32))

    # --- densify_expressed formulations (the lean-wire scatter: the fused
    # AND algebraic steps run it; the dense-batch module program doesn't and
    # is the only one that scales linearly at B>128) ----------------------
    def densify_add(genes, cnts):
        B, S = genes.shape
        cols = jnp.clip(genes.astype(jnp.int32) - 1, 0, N_GENES - 1)
        vals = jnp.where(genes > 0, cnts, 0.0)
        rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, S))
        dense = jnp.zeros((B, N_GENES), cnts.dtype)
        return jnp.sum(dense.at[rows, cols].add(vals))

    def densify_set_trash(genes, cnts):
        # padding (token 0) routes to a trash column; real gene ids are
        # unique within a row, so the scatter can be a unique-indices SET
        B, S = genes.shape
        cols = jnp.where(genes > 0, genes.astype(jnp.int32) - 1, N_GENES)
        rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, S))
        dense = jnp.zeros((B, N_GENES + 1), cnts.dtype)
        dense = dense.at[rows, cols].max(cnts, unique_indices=False)
        return jnp.sum(dense[:, :N_GENES])

    def densify_chunk(genes, cnts):
        B, S = genes.shape
        parts = []
        for lo in range(0, B, 128):
            g, c = genes[lo : lo + 128], cnts[lo : lo + 128]
            cols = jnp.clip(g.astype(jnp.int32) - 1, 0, N_GENES - 1)
            vals = jnp.where(g > 0, c, 0.0)
            rows = jnp.broadcast_to(
                jnp.arange(g.shape[0], dtype=jnp.int32)[:, None], g.shape
            )
            dense = jnp.zeros((g.shape[0], N_GENES), c.dtype)
            parts.append(dense.at[rows, cols].add(vals))
        return jnp.sum(jnp.concatenate(parts, 0))

    for B in args.batches:
        idx = jnp.asarray(rng.integers(0, N_GENES + 1, (B, SEQ_LEN)).astype(np.int32))
        cnt = jnp.asarray((rng.poisson(3.0, (B, SEQ_LEN)) + 1).astype(np.float32))
        # lean-wire-like subset ids: sorted unique nonzero gene ids + padding
        gsub = np.zeros((B, SEQ_LEN), np.int32)
        for i in range(B):
            nnz = int(rng.integers(1500, 4000))
            gsub[i, :nnz] = np.sort(rng.choice(N_GENES, nnz, replace=False)) + 1
        gsub = jnp.asarray(gsub)
        for name, fn, fargs in [
            ("embed2d", jax.jit(embed2d), (tb16, idx)),
            ("flat", jax.jit(flat), (tb16, idx)),
            ("chunk128", jax.jit(chunk128), (tb16, idx)),
            ("flat_mul", jax.jit(flat_mul), (tb16, idx, cnt)),
            ("densify_add", jax.jit(densify_add), (gsub, cnt)),
            ("densify_set_trash", jax.jit(densify_set_trash), (gsub, cnt)),
            ("densify_chunk", jax.jit(densify_chunk), (gsub, cnt)),
        ]:
            ms = _time(fn, fargs) * 1e3
            gb = B * SEQ_LEN * E * 2 / 1e9
            print(json.dumps({
                "metric": f"gather_{name}_b{B}_ms", "value": round(ms, 3),
                "unit": "ms", "vs_baseline": None,
                "effective_gb_per_s": round(gb / (ms / 1e3), 1),
            }), flush=True)


if __name__ == "__main__":
    main()
