"""Secondary benchmarks: LDM train throughput + CFG sampler throughput.

Prints one JSON line per metric (the driver's headline bench is bench.py).
Run: python -m benchmarks.bench_ldm [--census]

--census swaps in the census-scale pair the reference ships checkpoints for
(download_artifacts.py:193-216): the 128M-param E=512 VAE as frozen tokenizer
(36,601 genes, 64x64 latent) under the same DiT width the reference uses for
every dataset (ldm_base.yaml: n_embed=256, n_layer=8; seq_len/n_embed_input
follow the VAE latent). Generation is then dominated by the census decode.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench as vae_bench
from scldm_tpu.nn.nnets import DiT
from scldm_tpu.nn.vae import build_transformer_vae
from scldm_tpu.sampling.size_factors import SizeFactorSampler
from scldm_tpu.training.ldm_task import LDMTask
from scldm_tpu.training.vae_task import VAETask
from scldm_tpu.transport import create_transport

BATCH = 128
K = 10


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--census", action="store_true",
                   help="census-scale pair: E=512/128M VAE tokenizer + the "
                        "reference DiT width over its 64-token latent")
    p.add_argument("--algebraic-decode", action="store_true",
                   help="force the generation decode onto the reassociated "
                        "cross+head tail (training.vae_task.algebraic_decode)")
    p.add_argument("--no-algebraic-decode", action="store_true",
                   help="force the module decode (A/B baseline; the default "
                        "auto-enables the reassociated tail at n_embed > 128)")
    p.add_argument("--fused-gate-decode", action="store_true",
                   help="swiglu_vec decode tail (the serving-batch memory "
                        "escape hatch: the (2B, G, Hd) forward temporaries "
                        "that OOM census gen-batch 64 never exist); implies "
                        "the algebraic decode")
    p.add_argument("--gen-batch", type=int, nargs="+", default=[0],
                   help="generation batch size(s) (pre-CFG-doubling); 0 = "
                        "the training batch. Serving throughput scales with "
                        "this until the decode saturates the chip; several "
                        "values sweep within one process (one jit each)")
    p.add_argument("--steps", type=int, default=250,
                   help="euler ODE steps for the generation pass")
    args = p.parse_args()

    global BATCH, K
    if args.census:
        from benchmarks.bench_census import synth_batch as census_synth

        BATCH, K = 16, 4  # vae_census.yaml batch size; K amortizes dispatch
        n_genes, tag = 36_601, "census_"
        vae = build_transformer_vae(
            n_genes=n_genes, n_embed=512, n_embed_latent=64, n_layer=16,
            n_inducing_points=64, n_head=8, n_head_cross=8, multiple_of=64,
            dtype=jnp.bfloat16, remat=True,
        )
        batch = census_synth(np.random.default_rng(0), BATCH, n_genes, 4096)
        dit_tokens, dit_in = 64, 64
    else:
        n_genes, tag = vae_bench.N_GENES, ""
        vae = build_transformer_vae(n_genes=n_genes, dtype=jnp.bfloat16)
        batch = vae_bench.synth_batch(np.random.default_rng(0))
        dit_tokens, dit_in = 16, 16
    batch["clusters"] = np.random.default_rng(1).integers(0, 14, BATCH).astype(np.int64)
    vae_task = VAETask(vae, num_training_steps=100)
    vstate = vae_task.init_state(jax.random.PRNGKey(0), batch)

    dit = DiT(
        n_embed=256, n_embed_input=dit_in, n_layer=8, n_head=8, seq_len=dit_tokens,
        class_vocab_sizes={"clusters": 14}, cfg_dropout_prob=0.8, dtype=jnp.bfloat16,
    )
    alg_decode = (
        True if (args.algebraic_decode or args.fused_gate_decode)
        else (False if args.no_algebraic_decode else None)  # None = task auto
    )
    task = LDMTask(vae, vstate.params, dit, create_transport(),
                   num_training_steps=1000,
                   algebraic_decode=alg_decode,
                   algebraic_fused_gate=args.fused_gate_decode)
    state = task.init_state(jax.random.PRNGKey(1), batch)
    dev_batch = jax.tree_util.tree_map(jnp.asarray, batch)
    stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x] * K), dev_batch)

    # --- LDM training throughput (frozen-VAE encode + DiT update, fused K) ----
    # scalar fetch = the only reliable device sync on the tunneled platform
    state, m = task.train_steps(state, stacked)
    assert np.isfinite(float(m["train_loss"]))
    t0 = time.perf_counter()
    for _ in range(5):
        state, m = task.train_steps(state, stacked)
    _ = float(m["train_loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"{tag}ldm_train_cells_per_sec",
        "value": round(BATCH * K * 5 / dt, 1),
        "unit": "cells/s",
        "vs_baseline": None,
    }))

    # --- CFG generation throughput (euler-250: full pipeline incl. NB decode) --
    class _E:
        class_vocab_sizes = {"clusters": 14}
        mu_size_factor = {"clusters": {i: 8.6 for i in range(14)}}
        sd_size_factor = {"clusters": {i: 0.3 for i in range(14)}}
        joint_key = None
        joint_components = None
        joint_idx_2_classes = None

    sfs = SizeFactorSampler(_E())
    num_steps = args.steps
    fn = task.make_sample_fn(
        sfs, guidance_weight={"clusters": 1.0}, sampling_method="euler",
        num_steps=num_steps, use_ema=True,
    )
    from scldm_tpu.ops.transforms import canonical_gene_ids

    genes = canonical_gene_ids(n_genes)
    if task.algebraic_decode:
        tag = f"{tag}alg_"  # generation metrics only — training is unaffected
    if task.algebraic_fused_gate:
        tag = f"{tag}fg_"
    for gb in args.gen_batch:
        GEN_BATCH = gb or BATCH
        gen_clusters = np.resize(batch["clusters"], GEN_BATCH)
        cond = {"clusters": jnp.asarray(gen_clusters)}
        counts, z = fn(state, jax.random.PRNGKey(2), genes, cond)
        _ = float(counts.ravel()[0])
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            counts, z = fn(state, jax.random.PRNGKey(3 + i), genes, cond)
        _ = float(counts.ravel()[0])
        dt = time.perf_counter() - t0
        cells_per_sec = 2 * GEN_BATCH * reps / dt  # doubled: uncond + cond
        denoiser_steps_per_sec = num_steps * reps / dt
        btag = f"{tag}b{GEN_BATCH}_" if gb else tag
        print(json.dumps({
            "metric": f"{btag}cfg_generation_cells_per_sec",
            "value": round(cells_per_sec, 1),
            "unit": f"cells/s (euler-{num_steps})",
            "vs_baseline": None,
        }), flush=True)
        print(json.dumps({
            "metric": f"{btag}sampler_denoiser_steps_per_sec",
            "value": round(denoiser_steps_per_sec, 1),
            "unit": f"steps/s (euler-{num_steps}, batch {2 * GEN_BATCH} CFG)",
            "vs_baseline": None,
        }), flush=True)


if __name__ == "__main__":
    main()
