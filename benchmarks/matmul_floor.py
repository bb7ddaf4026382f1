"""Pure-matmul ceiling for the census step (the floor behind the MFU claim).

Measures isolated XLA matmuls at the exact shapes the census VAE step issues
(R = B*G rows through the decoder cross/MLP/head chain) and combines them into
the FLOP-weighted rate a glue-free step could at best achieve on this chip.
The headline census MFU (benchmarks/bench_census.py) should be read against
THIS ceiling, not the datasheet peak: the datasheet assumes K=N=MXU-sized
operands, which the architecture's K=512 / N=512 projections never reach.

Also measures the silu-mul epilogue tax (XLA's fused up-proj + SwiGLU gate vs
the bare matmul) — the single largest non-matmul cost in the step, and the
reason further isolated-kernel fusion attempts were measured losses (ROADMAP).

Prints one JSON line per shape plus the weighted ceiling. Run on the real
chip: python -m benchmarks.matmul_floor [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

V5E_BF16_PEAK_TFLOPS = 197.0


def _time(f, args, n=10):
    float(f(*args)[0, 0])  # scalar fetch = provable sync on tunneled devices
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n - 1):
            f(*args)
        float(f(*args)[0, 0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--genes", type=int, default=36_601)
    p.add_argument("--vw-fold", action="store_true",
                   help="inventory for the folded formulation (round 5, the "
                        "default): the shared-weight (R,E)@(E,E) out-proj "
                        "fwd/dgrad become BATCHED (B,G,H*M)@(B,H*M,E) GEMMs "
                        "(probs @ vw and its dgrad) and d_vw joins the K=R "
                        "weight-grad family")
    args = p.parse_args()
    R = args.batch * args.genes  # rows through the decoder cross/MLP/head
    E, HD = 512, 1408  # vae_census.yaml width / SwiGLU hidden

    # (name, lhs shape, rhs shape, fwd+bwd multiplicity in one train step)
    # multiplicity: fwd=1; bwd adds dgrad (same shape class) + wgrad (K=R).
    if args.vw_fold:
        cases = [
            ("mlp_up", (R, E), (E, 2 * HD), 2.0),
            ("mlp_down", (R, HD), (HD, E), 2.0),
            # the fold leaves no R-row shared-weight E x E GEMM; the fwd
            # einsum probs @ vw and its dgrad run as batched GEMMs (below)
            ("wgrad", (E, R), (R, HD), 4.0),    # + d_vw (K=G per batch elem)
        ]
    else:
        cases = [
            ("mlp_up", (R, E), (E, 2 * HD), 2.0),   # w1+w2 fwd, + dgrads in bwd
            ("mlp_down", (R, HD), (HD, E), 2.0),
            ("proj_EE", (R, E), (E, E), 4.0),       # attn out-proj + head-ish E x E
            ("wgrad", (E, R), (R, HD), 3.0),        # all K=R weight grads
        ]
    plain = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))

    total_fl, total_t = 0.0, 0.0
    for name, sa, sb, mult in cases:
        ka, kb = jax.random.split(jax.random.PRNGKey(0))
        a = jax.random.normal(ka, sa, jnp.bfloat16)
        b = jax.random.normal(kb, sb, jnp.bfloat16)
        dt = _time(plain, (a, b))
        fl = 2 * sa[0] * sa[1] * sb[1]
        total_fl += mult * fl
        total_t += mult * dt
        print(json.dumps({
            "metric": f"matmul_{name}_tflops", "value": round(fl / dt / 1e12, 1),
            "unit": "TFLOP/s", "vs_baseline": None,
        }))

    if args.vw_fold:
        # batched (B, G, H*M) @ (B, H*M, E) — probs @ vw fwd + its dgrad
        bmm = jax.jit(lambda a, b: jnp.einsum(
            "bgk,bke->bge", a, b, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16))
        ka, kb = jax.random.split(jax.random.PRNGKey(2))
        a = jax.random.normal(ka, (args.batch, args.genes, E), jnp.bfloat16)
        b = jax.random.normal(kb, (args.batch, E, E), jnp.bfloat16)
        float(bmm(a, b)[0, 0, 0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(9):
                bmm(a, b)
            float(bmm(a, b)[0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / 10)
        fl = 2 * args.batch * args.genes * E * E
        total_fl += 2.0 * fl
        total_t += 2.0 * best
        print(json.dumps({
            "metric": "matmul_attn_bmm_fold_tflops",
            "value": round(fl / best / 1e12, 1),
            "unit": "TFLOP/s", "vs_baseline": None,
        }))

    # the silu-mul epilogue tax: fused up-proj + SwiGLU gate vs bare matmul.
    # A ratio, so a capped row count suffices — the concat form's f32 (R, 2H)
    # output OOMs outright at B=32 rows (13 GB; the exact tensor the two-dot
    # reformulation exists to avoid), which must not kill the ceiling print.
    def fused_gate(a, b):
        h = jnp.dot(a, b, preferred_element_type=jnp.float32)
        w1x, w2x = jnp.split(h, 2, axis=-1)
        return (jax.nn.silu(w1x) * w2x).astype(jnp.bfloat16)

    try:
        r_tax = min(R, 16 * args.genes)
        ka, kb = jax.random.split(jax.random.PRNGKey(1))
        a = jax.random.normal(ka, (r_tax, E), jnp.bfloat16)
        b = jax.random.normal(kb, (E, 2 * HD), jnp.bfloat16)
        t_bare = _time(plain, (a, b))
        t_gate = _time(jax.jit(fused_gate), (a, b))
        print(json.dumps({
            "metric": "swiglu_gate_epilogue_tax",
            "value": round(t_gate / t_bare, 2),
            "unit": "x bare matmul", "vs_baseline": None,
        }))
    except Exception as e:  # pragma: no cover - device OOM path
        print(json.dumps({
            "metric": "swiglu_gate_epilogue_tax", "value": None,
            "unit": "x bare matmul", "vs_baseline": None,
            "error": str(e)[:120],
        }))

    ceiling = total_fl / total_t / 1e12
    print(json.dumps({
        "metric": "census_pure_matmul_ceiling", "value": round(ceiling, 1),
        "unit": "TFLOP/s", "vs_baseline": round(ceiling / V5E_BF16_PEAK_TFLOPS, 3),
    }))


if __name__ == "__main__":
    main()
