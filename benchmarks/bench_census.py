"""Census-scale VAE benchmark: the ~128M-param configuration the reference
releases checkpoints for (download_artifacts.py:193-216; our
configs/model/vae_census.yaml), measured on one chip with remat + bf16.

Unlike the dentate-shape headline (E=32 — VPU/layout-bound), the census model
is MXU-shaped (E=512): this is where TPU FLOP utilization is meaningful, so
this bench also reports achieved TFLOP/s and MFU against the chip's bf16 peak.

Prints one JSON line per metric. Run: python -m benchmarks.bench_census
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

V5E_BF16_PEAK_TFLOPS = 197.0  # per chip


def synth_batch(rng, batch, n_genes, seq_len, nnz_range=None):
    """Canonical lean-wire synthetic batch (uint16 subsets + library sizes) —
    the one copy every benchmark imports; nnz_range defaults to a mostly-full
    window (census-like density)."""
    lo, hi = nnz_range or (seq_len // 2, seq_len)
    genes_sub = np.zeros((batch, seq_len), np.uint16)
    counts_sub = np.zeros((batch, seq_len), np.uint16)
    for i in range(batch):
        nnz = int(rng.integers(lo, hi))
        idx = np.sort(rng.choice(n_genes, size=nnz, replace=False))
        genes_sub[i, :nnz] = idx + 1
        counts_sub[i, :nnz] = rng.poisson(3.0, size=nnz) + 1
    return {
        "genes_subset": genes_sub,
        "counts_subset": counts_sub,
        "library_size": counts_sub.astype(np.float32).sum(1, keepdims=True),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)  # vae_census.yaml batch_size
    p.add_argument("--genes", type=int, default=36_601)  # census vocabulary
    p.add_argument("--seq-len", type=int, default=4_096)
    p.add_argument("--steps", type=int, default=4)  # per dispatch
    p.add_argument("--remat-cross", choices=["on", "off"], default="off",
                   help="on: rematerialize the (B,G,~2.75E) decoder cross "
                        "block - required to fit batch>=32 in 16GB HBM")
    p.add_argument("--cross-chunks", type=int, default=1,
                   help="split the decoder cross block's gene axis into N "
                        "chunks (exact; peak activation memory / N)")
    p.add_argument("--remat", choices=["on", "off"], default="on",
                   help="off: keep trunk activations (B=16 census fits HBM; "
                        "remat recompute is then pure overhead)")
    p.add_argument("--fused-pool", action="store_true",
                   help="route the encoder MCAB pooling through the flash "
                        "window kernel (ops/fused_encoder.fused_window_pool)")
    p.add_argument("--algebraic-tail", dest="algebraic_tail",
                   action="store_true", default=None,
                   help="XLA-reassociated decoder cross block + NB head "
                        "(training.vae_task.algebraic_nb_apply): the SwiGLU "
                        "down projection contracts with the head mu vector, "
                        "dropping ~2.5 TFLOP and the (B,G,E) temporaries "
                        "from the step. Default: auto (ON at census width "
                        "since round 5 — the production dispatch)")
    p.add_argument("--no-algebraic-tail", dest="algebraic_tail",
                   action="store_false",
                   help="force the module path (A/B baseline)")
    p.add_argument("--fused-gate", action="store_true",
                   help="+ ops/fused_swiglu.swiglu_vec: SwiGLU + head-vector "
                        "contraction as one recompute-VJP Pallas kernel — the "
                        "(B,G,2Hd)/(B,G,Hd) saved-bwd residents (the B=32 "
                        "OOM) never touch HBM; implies --algebraic-tail")
    p.add_argument("--vw-fold", dest="vw_fold", action="store_true", default=None,
                   help="force the attention-output-projection fold "
                        "(probs @ (v @ wo)): removes the bandwidth-bound "
                        "(B*G,E)@(E,E) GEMM and the K=64 probs@v einsum "
                        "(VERDICT r4 item 8); implies --algebraic-tail. "
                        "Default: auto (ON with the algebraic tail)")
    p.add_argument("--no-vw-fold", dest="vw_fold", action="store_false",
                   help="force the fold OFF (A/B baseline)")
    args = p.parse_args()
    if args.fused_gate or args.vw_fold:
        args.algebraic_tail = True

    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.training.vae_task import VAETask
    from scldm_tpu.utils.flops import vae_forward_flops

    # vae_census.yaml architecture
    vae = build_transformer_vae(
        n_genes=args.genes, n_embed=512, n_embed_latent=64, n_layer=16,
        n_inducing_points=64, n_head=8, n_head_cross=8, multiple_of=64,
        dtype=jnp.bfloat16, remat=(args.remat == "on"),
        remat_cross=(args.remat_cross == "on"),
        cross_chunks=args.cross_chunks,
    )
    task = VAETask(vae, num_training_steps=10_000, learning_rate=3e-4,
                   fused_pool=args.fused_pool, algebraic_tail=args.algebraic_tail,
                   algebraic_fused_gate=args.fused_gate,
                   algebraic_vw_fold=args.vw_fold)
    batch = synth_batch(np.random.default_rng(0), args.batch, args.genes, args.seq_len)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))

    stacked = jax.tree_util.tree_map(
        lambda x: jnp.stack([jnp.asarray(x)] * args.steps), batch
    )
    state, metrics = task.train_steps(state, stacked)
    assert np.isfinite(float(metrics["train_loss"]))

    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, metrics = task.train_steps(state, stacked)
        _ = float(metrics["train_loss"])  # scalar fetch = provable sync
        best_dt = min(best_dt, (time.perf_counter() - t0) / args.steps)

    fwd_flops = args.batch * vae_forward_flops(
        n_genes=args.genes, genes_seq_len=args.seq_len, n_embed=512,
        n_embed_latent=64, n_layer=16, n_inducing_points=64, multiple_of=64,
    )
    train_flops = 3 * fwd_flops  # fwd + ~2x bwd (remat adds ~1 more fwd of trunk)
    tflops = train_flops / best_dt / 1e12
    for metric, value, unit in (
        # NOTE: with --algebraic-tail the step executes FEWER hardware FLOPs
        # than the analytic module model; tflops/mfu below stay normalized to
        # the module FLOPs (model-FLOPs utilization — "effective" rate at
        # doing the reference's work), so runs are comparable across modes.
        (f"census_vae_train_cells_per_sec_b{args.batch}_remat_{args.remat}_cross_{args.remat_cross}_ck{args.cross_chunks}{'_alg' if task.algebraic_tail else ''}{'_fg' if args.fused_gate else ''}{'_vw' if task.algebraic_vw_fold else ''}", args.batch / best_dt, "cells/s"),
        ("census_vae_step_ms", best_dt * 1e3, "ms"),
        ("census_vae_tflops", tflops, "TFLOP/s"),
        ("census_vae_mfu", tflops / V5E_BF16_PEAK_TFLOPS, "fraction"),
        ("census_vae_params", float(n_params), "params"),
    ):
        print(json.dumps({
            "metric": metric, "value": round(float(value), 3), "unit": unit,
            "vs_baseline": None,
        }))


if __name__ == "__main__":
    main()
