#!/usr/bin/env python
"""Flash-attention crossover study (VERDICT r3 item 8): at what sequence
length does the streaming Pallas kernel beat XLA's materialized attention
on v5e — and where does XLA stop fitting at all?

At the round-3 gated shape (B=2, M=2048, S=4096) the kernel LOST (37.4 vs
35.7 ms); its remaining justification is the (B,H,M,S) score tensor XLA
materializes: at S=16k/B=2/H=4 that is 8.6 GB f32, at S=32k it cannot fit
HBM. This sweep records ms for both paths at growing self-attention lengths
(M=S), emitting `null` + the error for whichever path fails to run, so
docs/performance.md can carry a measured crossover table instead of the
round-3 "may pay off" claim.

Run: python -m benchmarks.bench_flash_crossover [--lens 1024 2048 4096 8192 16384 32768]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

B, H, D = 2, 4, 64


def best_ms(fn, q, k, v, reps=3, n=6):
    """n-1 un-synced dispatches + one scalar fetch per window (matmul_floor
    methodology): amortizes the tunneled host's dispatch RTT."""
    out = fn(q, k, v)
    _ = float(out.reshape(-1)[0])  # compile + provable sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n - 1):
            fn(q, k, v)
        out = fn(q, k, v)
        _ = float(out.reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", nargs="+", type=int,
                    default=[1024, 2048, 4096, 8192, 16384, 32768])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from scldm_tpu.ops.flash_attention import flash_attention

    @jax.jit
    def xla_attn(q, k, v):
        s = jnp.einsum("bmhd,bshd->bhms", q.astype(jnp.float32), k.astype(jnp.float32))
        p = jax.nn.softmax(s / (D**0.5), axis=-1)
        return jnp.einsum("bhms,bshd->bmhd", p, v.astype(jnp.float32))

    @jax.jit
    def flash(q, k, v):
        return flash_attention(q, k, v)

    for S in args.lens:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(S), 3)
        q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
        row = {"metric": "flash_crossover", "value": None, "unit": "ms",
               "vs_baseline": None, "seq_len": S,
               "xla_score_bytes_gb": round(B * H * S * S * 4 / 1e9, 2)}
        for name, fn in (("flash_ms", flash), ("xla_ms", xla_attn)):
            try:
                row[name] = round(best_ms(fn, q, k, v, reps=args.reps), 2)
            except Exception as e:
                row[name] = None
                row[name.replace("_ms", "_error")] = str(e)[-200:]
        if row["flash_ms"] and row["xla_ms"]:
            row["value"] = row["flash_ms"]
            row["speedup_vs_xla"] = round(row["xla_ms"] / row["flash_ms"], 3)
        elif row["flash_ms"]:
            row["value"] = row["flash_ms"]
            row["speedup_vs_xla"] = None  # XLA failed: flash is the only path
        print(json.dumps(row), flush=True)
        # free before the next, larger shape
        del q, k, v


if __name__ == "__main__":
    main()
