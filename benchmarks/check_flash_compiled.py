"""Compiled-mode validation of the streaming flash-attention kernel.

The 3-D-grid rewrite (ops/flash_attention.py: kv innermost, scratch carries
m/l/acc across kv steps) is interpret-validated in tests; this script runs the
ONE real compile the ROADMAP re-validation queue asks for, at a long-S shape
the kernel is gated for (>=1024-token query axis — no reference default config
produces one, reference layers.py:153 uses flex_attention), and checks it
against XLA's materialized attention on identical on-device operands.

Operands are generated ON-DEVICE (jax.random): large host->device transfers
can wedge the tunneled dev platform. Timing syncs via scalar fetch only.

    python -m benchmarks.check_flash_compiled [--interpret]   # JSON lines out
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--q-len", type=int, default=2048)
    p.add_argument("--kv-len", type=int, default=4096)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--head-dim", type=int, default=64)
    p.add_argument("--interpret", action="store_true",
                   help="interpret mode (harness smoke-testing on CPU only; "
                        "the point of this script is the compiled run)")
    args = p.parse_args()

    from scldm_tpu.ops.flash_attention import flash_attention

    B, M, S, H, D = args.batch, args.q_len, args.kv_len, args.heads, args.head_dim
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, M, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)

    @jax.jit
    def reference(q, k, v):
        # materialized attention, fp32 softmax — the XLA path the kernel
        # competes with (ops/attention.py sdpa semantics)
        s = jnp.einsum("bmhd,bshd->bhms", q.astype(jnp.float32), k.astype(jnp.float32))
        p = jax.nn.softmax(s / (D**0.5), axis=-1)
        return jnp.einsum("bhms,bshd->bmhd", p, v.astype(jnp.float32))

    # jit the whole wrapper so the timing compares one compiled dispatch
    # against one compiled dispatch — unjitted, the transposes/pads around
    # the pallas_call would eager-dispatch per op, which on high-latency
    # remote-attached devices dominates and inflates the kernel's number
    @jax.jit
    def flash(q, k, v):
        return flash_attention(q, k, v, interpret=args.interpret)

    ref = reference(q, k, v)
    out = flash(q, k, v)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    rel = err / max(scale, 1e-6)
    ok = rel < 2e-2  # bf16 inputs, fp32 accumulation

    def best_ms(fn, n=6):
        # n-1 un-synced dispatches pipeline on the device + one scalar-fetch
        # sync closes the window (matmul_floor methodology): single-dispatch
        # timing on this tunneled host measures mostly dispatch RTT — that
        # artifact is what round 3 recorded as a 37.4-vs-35.7 ms kernel
        # "loss" (bench_flash_crossover: amortized, the kernel wins 1.28-1.63x
        # at every S >= 2048)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n - 1):
                fn(q, k, v)
            r = fn(q, k, v)
            _ = float(r.reshape(-1)[0])  # scalar fetch = provable sync
            best = min(best, (time.perf_counter() - t0) / n)
        return best * 1e3

    rows = [
        ("flash_compiled_max_rel_err", rel, "fraction"),
        ("flash_compiled_ok", float(ok), "bool"),
        ("flash_compiled_ms", best_ms(flash), "ms"),
        ("flash_xla_reference_ms", best_ms(reference), "ms"),
    ]
    for metric, value, unit in rows:
        print(json.dumps({
            "metric": metric, "value": round(float(value), 5), "unit": unit,
            "vs_baseline": None,
        }))
    if not ok:
        raise SystemExit(f"flash kernel mismatch: rel err {rel:.4g}")


if __name__ == "__main__":
    main()
