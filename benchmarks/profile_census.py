#!/usr/bin/env python
"""Census-step floor attribution (VERDICT r2 next-round #2): where do the
non-MXU milliseconds go at E=512?

Times each segment of the census VAE train step as its own K-amortized jitted
program (the tunnel-safe technique from profile_vae.py): full step, forward,
forward+loss, grad, and the forward sub-stages (embed+pool / trunk / decoder
cross + head), plus optimizer-only. Prints a table with measured ms/step, the
segment's analytic FLOPs, and implied TFLOP/s — the component-by-component
floor behind the headline MFU.

Run: python -m benchmarks.profile_census [--remat on|off] [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

K = 4
V5E_BF16_PEAK = 197.0


from benchmarks.bench_census import synth_batch  # canonical lean-wire batch


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def dispatch_ms(fn, *args, iters=3):
    _force(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--genes", type=int, default=36_601)
    ap.add_argument("--seq-len", type=int, default=4_096)
    ap.add_argument("--remat", choices=["on", "off"], default="on")
    args = ap.parse_args()

    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.training.vae_task import VAETask, vae_loss

    E, LAT, L, M = 512, 64, 16, 64
    vae = build_transformer_vae(
        n_genes=args.genes, n_embed=E, n_embed_latent=LAT, n_layer=L,
        n_inducing_points=M, n_head=8, n_head_cross=8, multiple_of=64,
        dtype=jnp.bfloat16, remat=(args.remat == "on"),
    )
    task = VAETask(vae, num_training_steps=10_000)
    batch = synth_batch(np.random.default_rng(0), args.batch, args.genes, args.seq_len)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.stack([jnp.asarray(x)] * K), batch
    )

    B, S, G = args.batch, args.seq_len, args.genes
    HID = 2048  # SwiGLU hidden at multiple_of=64

    # -- analytic per-step FLOPs by segment (fwd only; x3 for train) ----------
    f_pool = B * (S * E * 2 * E + M * S * E * 2 + S * E * E  # kv proj, qk+pv, (approx)
                  + M * E * E + 2 * M * E * HID + M * HID * E) * 2
    f_trunk = B * L * (M * E * 3 * E + 2 * 8 * M * M * (E // 8)
                       + M * E * E + 2 * M * E * HID + M * HID * E) * 2
    f_cross = B * (G * E * E          # q proj
                   + G * M * E * 2    # scores + pv
                   + G * E * E        # out proj
                   + 2 * G * E * HID + G * HID * E  # SwiGLU MLP over genes
                   + G * E) * 2       # head logit
    f_fwd = f_pool + f_trunk + f_cross

    def scan_over(fn):
        def run(params, stacked):
            def body(c, b):
                r = fn(params, b)
                return c + jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x).astype(jnp.float32), r, 0.0
                ), None
            tot, _ = jax.lax.scan(body, 0.0, stacked)
            return tot
        return jax.jit(run)

    def fwd(params, b):
        out, _ = task._apply(params, task._materialize(b), train=False)
        return (out["mu"].astype(jnp.float32).sum(),)

    def fwd_loss(params, b):
        b = task._materialize(b)
        out, _ = task._apply(params, b, train=False)
        return (vae_loss(b["counts"], out, task.gaussian_head),)

    grad_fn = jax.grad(lambda p, b: fwd_loss(p, b)[0])

    # forward sub-stages via the module seams (pool_only / skip_pool /
    # trunk_only mirror nnets.py call boundaries)
    def embed_pool(params, b):
        emb = vae.apply(params, b["counts_subset"], b["genes_subset"],
                        method=lambda m, c, g: m.input_layer(c, g))
        pooled = vae.apply(params, emb,
                           method=lambda m, e: m.encoder(e, pool_only=True))
        return (pooled.astype(jnp.float32).sum(),)

    def embed_pool_trunk(params, b):
        emb = vae.apply(params, b["counts_subset"], b["genes_subset"],
                        method=lambda m, c, g: m.input_layer(c, g))
        hz = vae.apply(params, emb, method=lambda m, e: m.encoder(e))
        return (hz.astype(jnp.float32).sum(),)

    def noop_opt(params, b):
        # optimizer cost proxy: one update with zero grads
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        upd, _ = task.tx.update(zeros, state.opt_state, params)
        return (jax.tree_util.tree_leaves(upd)[0].astype(jnp.float32).sum(),)

    def run_full():
        s = jax.tree_util.tree_map(
            lambda x: x + 0 if hasattr(x, "dtype") else x, state
        )
        _, m = task.train_steps(s, stacked)
        return m["train_loss"]

    full = dispatch_ms(run_full)
    rows = [
        ("train_step", full, 3 * f_fwd),
        ("fwd", dispatch_ms(scan_over(fwd), state.params, stacked), f_fwd),
        ("fwd+loss", dispatch_ms(scan_over(fwd_loss), state.params, stacked), f_fwd),
        ("grad(fwd+loss)", dispatch_ms(scan_over(grad_fn), state.params, stacked),
         3 * f_fwd),
        ("embed+pool", dispatch_ms(scan_over(embed_pool), state.params, stacked),
         f_pool),
        ("embed+pool+trunk",
         dispatch_ms(scan_over(embed_pool_trunk), state.params, stacked),
         f_pool + f_trunk),
        ("optimizer", dispatch_ms(scan_over(noop_opt), state.params, stacked), 0),
    ]
    print(f"# census profile remat={args.remat} B={B} S={S} G={G} K={K}")
    print(f"{'segment':18s} {'ms/step':>9s} {'GFLOP':>9s} {'TFLOP/s':>8s} {'MFU':>6s}")
    for name, ms_total, flops in rows:
        ms = ms_total / K
        tf = flops / (ms / 1e3) / 1e12 if ms > 0 else 0.0
        print(f"{name:18s} {ms:9.2f} {flops/1e9:9.1f} {tf:8.1f} "
              f"{tf/V5E_BF16_PEAK*100:5.1f}%")
    # derived: decoder cross = fwd - (embed+pool+trunk); bwd = grad - fwd
    ms_fwd = rows[1][1] / K
    ms_ept = rows[5][1] / K
    ms_grad = rows[3][1] / K
    print(f"{'cross+head (=fwd-ept)':24s} {ms_fwd - ms_ept:8.2f} ms  "
          f"({f_cross/1e9:.1f} GFLOP -> "
          f"{f_cross/((ms_fwd-ms_ept)/1e3)/1e12:.1f} TFLOP/s)")
    print(f"{'bwd (=grad-fwd)':24s} {ms_grad - ms_fwd:8.2f} ms")


if __name__ == "__main__":
    main()
