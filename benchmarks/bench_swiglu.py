#!/usr/bin/env python
"""SwiGLU up+gate: Pallas fused kernel vs XLA at census shapes (VERDICT r3
item 5 — the named MFU target is XLA's gate epilogue at 2.16x the bare
matmul). Measures, at R = B*G rows of the census cross block MLP:

  - bare up-projection matmul (R,E)@(E,2H)      [the 2.16x yardstick]
  - XLA swiglu fwd / fwd+bwd                     [what the model runs today]
  - Pallas fused fwd / fwd+bwd                   [ops/fused_swiglu.py]

Prints one JSON line per measurement. Scalar-fetch sync inside every window
(tunneled-device rule, docs/performance.md).

Run: python -m benchmarks.bench_swiglu [--rows 585616] [--tiles 512x512 512x1408]
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

from scldm_tpu.ops.fused_swiglu import fused_swiglu_gate, swiglu_reference

E, H = 512, 1408  # census cross block MLP (E=512, hidden=1408)


def timeit(fn, *args, reps=3, n=8):
    """matmul_floor._time methodology: n-1 un-synced dispatches pipeline on
    the device, one scalar fetch closes the window — amortizes the tunneled
    host's dispatch RTT, which otherwise dominates single-op timings."""

    def sync(out):
        return float(jnp.sum(jax.tree_util.tree_leaves(out)[0][0]))

    sync(fn(*args))  # compile + settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n - 1):
            fn(*args)
        sync(fn(*args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def emit(name, ms, flops=None, extra=None):
    row = {"metric": name, "value": round(ms, 3), "unit": "ms", "vs_baseline": None}
    if flops:
        row["tflops_per_sec"] = round(flops / ms / 1e9, 1)
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16 * 36_601)
    ap.add_argument("--tiles", nargs="+", default=["512x512", "512x1408", "256x1408"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-xla-bwd", action="store_true",
                    help="skip the XLA fwd+bwd point (its compile hung once)")
    args = ap.parse_args()

    R = args.rows
    # distinct keys: w1 == w2 would make the gate degenerate (silu(u)*u with
    # u1 == u2), hiding du1/du2 asymmetry bugs from the numeric check below
    kx, k1, k2, kd = jax.random.split(jax.random.PRNGKey(0), 4)
    x = (jax.random.normal(kx, (R, E), jnp.bfloat16) * 0.5).block_until_ready()
    w1 = jax.random.normal(k1, (E, H), jnp.bfloat16) * (E**-0.5)
    w2 = jax.random.normal(k2, (E, H), jnp.bfloat16) * (E**-0.5)
    w12 = jnp.concatenate([w1, w2], axis=1)
    dg = jax.random.normal(kd, (R, H), jnp.bfloat16)

    mm_flops = 2 * R * E * 2 * H  # the concatenated up matmul
    fwd_flops = 2 * R * E * 2 * H
    bwd_flops = fwd_flops * 2  # dx + dw passes (recompute adds fwd_flops more)

    import sys

    def note(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    note("bare matmul compile+measure")
    bare = jax.jit(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32)
                   .astype(jnp.bfloat16))
    emit("bare_up_matmul_ms", timeit(bare, x, w12, reps=args.reps), mm_flops)

    note("xla swiglu fwd compile+measure")
    xla_fwd = jax.jit(swiglu_reference)
    ms_xla_fwd = timeit(xla_fwd, x, w1, w2, reps=args.reps)
    emit("xla_swiglu_fwd_ms", ms_xla_fwd, fwd_flops)

    if not args.skip_xla_bwd:
        note("xla swiglu fwd+bwd compile+measure (can be slow to compile)")

        def fwd_bwd_xla(x, w1, w2):
            _, vjp = jax.vjp(swiglu_reference, x, w1, w2)
            return vjp(dg)

        ms_xla_fb = timeit(jax.jit(fwd_bwd_xla), x, w1, w2, reps=args.reps)
        emit("xla_swiglu_fwd_bwd_ms", ms_xla_fb, fwd_flops + bwd_flops)

    for tile in args.tiles:
        br, bh = (int(v) for v in tile.split("x"))
        try:
            note(f"pallas fused tile {tile} compile+measure")
            pfwd = jax.jit(lambda x, w1, w2: fused_swiglu_gate(x, w1, w2, br, bh))
            ms = timeit(pfwd, x, w1, w2, reps=args.reps)
            emit("pallas_swiglu_fwd_ms", ms, fwd_flops, {"tile": tile})

            def fwd_bwd_pallas(x, w1, w2):
                _, vjp = jax.vjp(
                    lambda x, w1, w2: fused_swiglu_gate(x, w1, w2, br, bh), x, w1, w2
                )
                return vjp(dg)

            ms = timeit(jax.jit(fwd_bwd_pallas), x, w1, w2, reps=args.reps)
            # recompute bwd does fwd_flops extra MXU work vs the XLA count
            emit("pallas_swiglu_fwd_bwd_ms", ms, fwd_flops + bwd_flops, {"tile": tile})
        except Exception as e:  # compile failure at a tile: record, keep sweeping
            print(json.dumps({"metric": "pallas_swiglu_error", "value": None,
                              "unit": "ms", "vs_baseline": None, "tile": tile,
                              "error": str(e)[-300:]}), flush=True)

    # numerical check at a slice (full R would be slow on host)
    sl = slice(0, 4096)
    got = np.asarray(fused_swiglu_gate(x[sl], w1, w2, 512, 512).astype(jnp.float32))
    want = np.asarray(swiglu_reference(x[sl], w1, w2).astype(jnp.float32))
    rel = float(np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9))
    print(json.dumps({"metric": "pallas_swiglu_max_rel_err", "value": round(rel, 6),
                      "unit": "fraction", "vs_baseline": None}), flush=True)


if __name__ == "__main__":
    main()
