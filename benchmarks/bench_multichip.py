#!/usr/bin/env python
"""Multi-chip scaling benchmark: VAE train throughput (cells/s) across device
counts — DP over the "data" axis, and optionally DP x TP for the census-width
config (Megatron rules over "model").

    python -m benchmarks.bench_multichip                 # real devices
    python -m benchmarks.bench_multichip --virtual 8     # 8 virtual CPU devices

Emits one JSON line per (config, mesh) point:
    {"config", "mesh": [d, m], "devices", "ms_per_step", "cells_per_sec",
     "scaling_vs_1dev", "platform"}

NOTE: numbers are only meaningful on real TPU chips with real ICI — the
`--virtual` mode shares one host CPU across all virtual devices, so its
"scaling" mostly measures host contention; it exists to validate that every
mesh point compiles and executes (the BASELINE.md north star "≥5x cells/sec on
v5e-8" gets its artifact here the day multi-chip hardware is attached).
Timing uses scalar-fetch sync with K steps per dispatch (see bench.py header
for why plain block_until_ready is not trusted on tunneled TPU).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

CONFIGS = {
    # reference experiments/configs dentate defaults, per-device batch 128
    "dentate": dict(n_genes=17_002, seq_len=6_147, batch=128, model={}),
    # census-width MXU config (benchmarks/bench_census.py shapes, smaller seq
    # so the sweep completes in minutes)
    "census": dict(
        n_genes=4_096, seq_len=4_096, batch=32,
        model=dict(n_embed=512, n_embed_latent=64, n_layer=12,
                   n_inducing_points=128, n_head=8, n_head_cross=8),
    ),
    # the REAL census shape (the 128M-param VAE bench_census measures
    # single-chip): the docs/scaling.md predictions are written against this
    # config — run it on real multi-chip hardware to falsify them; use
    # --compile-only on the virtual mesh to validate every mesh point compiles
    "census_full": dict(
        n_genes=36_601, seq_len=4_096, batch=32,
        model=dict(n_embed=512, n_embed_latent=64, n_layer=16,
                   n_inducing_points=64, n_head=8, n_head_cross=8,
                   multiple_of=64),
    ),
    # CPU-sized config for validating every mesh point without TPU hardware
    "tiny": dict(
        n_genes=256, seq_len=96, batch=8,
        model=dict(n_embed=32, n_embed_latent=16, n_layer=2,
                   n_inducing_points=8, n_head=4, n_head_cross=4),
    ),
}


def synth_batch(rng, batch, n_genes, seq_len):
    from benchmarks.bench_census import synth_batch as _canonical

    return _canonical(rng, batch, n_genes, seq_len,
                      nnz_range=(seq_len // 4, seq_len - 1))


def run_point(
    config_name: str, n_data: int, n_model: int, steps: int,
    gene_sp: bool = False, fsdp: bool = False, compile_only: bool = False,
) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.parallel.mesh import make_mesh, shard_stacked_batch
    from scldm_tpu.training.vae_task import VAETask

    cfg = CONFIGS[config_name]
    n_dev = n_data * n_model
    devices = jax.devices()[:n_dev]
    mesh = make_mesh(n_data=n_data, n_model=n_model, devices=devices) if n_dev > 1 else None

    vae = build_transformer_vae(
        n_genes=cfg["n_genes"], dtype=jnp.bfloat16, **cfg["model"]
    )
    task = VAETask(
        vae, num_training_steps=10_000, mesh=mesh, gene_sp=gene_sp, fsdp=fsdp
    )
    global_batch = cfg["batch"] * n_data  # per-device batch held constant (weak scaling)
    batch = synth_batch(np.random.default_rng(0), global_batch, cfg["n_genes"], cfg["seq_len"])
    state = task.init_state(jax.random.PRNGKey(0), batch)

    suffix = ("_gene_sp" if gene_sp else "") + ("_fsdp" if fsdp else "")
    stacked = jax.tree_util.tree_map(
        lambda x: np.stack([x] * (1 if compile_only else steps)), batch
    )
    if mesh is not None:
        stacked = shard_stacked_batch(stacked, mesh)
    else:
        stacked = jax.tree_util.tree_map(jnp.asarray, stacked)

    if compile_only:
        # validate the partitioned program lowers + compiles at this mesh
        # point without paying for execution (the virtual-mesh check for the
        # real census shape, whose CPU execution would take minutes/step)
        t0 = time.perf_counter()
        task._train_steps.lower(state, stacked).compile()
        return {
            "config": config_name + suffix,
            "mesh": [n_data, n_model],
            "devices": n_dev,
            "global_batch": global_batch,
            "compiled": True,
            "compile_s": round(time.perf_counter() - t0, 1),
            "platform": jax.default_backend(),
        }

    state, metrics = task.train_steps(state, stacked)  # compile + warm
    assert np.isfinite(float(metrics["train_loss"]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, metrics = task.train_steps(state, stacked)
        _ = float(metrics["train_loss"])  # scalar-fetch device sync
        best = min(best, (time.perf_counter() - t0) / steps)
    return {
        "config": config_name + suffix,
        "mesh": [n_data, n_model],
        "devices": n_dev,
        "global_batch": global_batch,
        "ms_per_step": round(best * 1e3, 2),
        "cells_per_sec": round(global_batch / best, 1),
        "platform": jax.default_backend(),
    }


def run_generation_point(
    config_name: str, n_data: int, num_steps: int, n_model: int = 1
) -> dict:
    """DP (x TP) CFG-generation scaling: the one jitted noise -> CFG ODE ->
    decode -> NB program (LDMTask.make_sample_fn) with the condition batch
    sharded over "data"; with n_model>1 the decode is additionally
    sequence-parallel over the GENE axis (the census decode memory gate).
    The reference samples single-device (experiments/scripts/inference.py:69);
    this measures the mesh-first extension."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scldm_tpu.nn.nnets import DiT
    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.parallel.mesh import make_mesh
    from scldm_tpu.sampling.size_factors import SizeFactorSampler
    from scldm_tpu.training.ldm_task import LDMTask
    from scldm_tpu.training.vae_task import VAETask
    from scldm_tpu.transport import create_transport

    cfg = CONFIGS[config_name]
    n_dev = n_data * n_model
    devices = jax.devices()[:n_dev]
    mesh = (
        make_mesh(n_data=n_data, n_model=n_model, devices=devices)
        if n_dev > 1
        else None
    )

    vae = build_transformer_vae(
        n_genes=cfg["n_genes"], dtype=jnp.bfloat16, **cfg["model"]
    )
    vae_task = VAETask(vae, num_training_steps=10, mesh=mesh)
    global_batch = cfg["batch"] * n_data
    batch = synth_batch(
        np.random.default_rng(0), global_batch, cfg["n_genes"], cfg["seq_len"]
    )
    batch["clusters"] = (
        np.random.default_rng(2).integers(0, 14, global_batch).astype(np.int64)
    )
    vstate = vae_task.init_state(jax.random.PRNGKey(0), batch)

    tiny = config_name == "tiny"
    dit = DiT(
        n_embed=32 if tiny else 256, n_layer=2 if tiny else 8,
        n_head=2 if tiny else 8,
        n_embed_input=vae.encoder.latent_embedding,
        seq_len=vae.encoder.n_inducing_points,
        class_vocab_sizes={"clusters": 14}, cfg_dropout_prob=0.8,
        dtype=jnp.bfloat16,
    )
    ldm = LDMTask(
        vae, vstate.params, dit, create_transport(), num_training_steps=10,
        mesh=mesh,
    )
    state = ldm.init_state(jax.random.PRNGKey(1), batch)

    from scldm_tpu.sampling.size_factors import constant_stats

    sample = ldm.make_sample_fn(
        SizeFactorSampler(constant_stats({"clusters": 14})),
        guidance_weight={"clusters": 1.5},
        sampling_method="euler", num_steps=num_steps, use_ema=False,
    )
    genes_row = jnp.arange(1, cfg["n_genes"] + 1)  # 1-D canonical query row
    clusters = jnp.asarray(
        np.random.default_rng(1).integers(0, 14, global_batch)
    )
    if mesh is not None:
        clusters = jax.device_put(clusters, NamedSharding(mesh, P("data")))
    cond = {"clusters": clusters}

    counts, _ = sample(state, jax.random.PRNGKey(2), genes_row, cond)  # compile
    assert np.isfinite(float(counts.ravel()[0]))
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        counts, _ = sample(state, jax.random.PRNGKey(3 + r), genes_row, cond)
        _ = float(counts.ravel()[0])  # scalar-fetch device sync
        best = min(best, time.perf_counter() - t0)
    return {
        "config": f"{config_name}_generation",
        "mesh": [n_data, n_model],
        "devices": n_dev,
        "global_batch": global_batch,
        "ms_per_batch": round(best * 1e3, 2),
        # doubled batch: unconditional + conditional halves
        "cells_per_sec": round(2 * global_batch / best, 1),
        "platform": jax.default_backend(),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="re-exec on N virtual CPU devices (validation mode)")
    ap.add_argument("--configs", nargs="+", default=["dentate"],
                    choices=list(CONFIGS), help="which model configs to sweep")  # noqa: E501
    ap.add_argument("--steps", type=int, default=10, help="steps fused per dispatch")
    ap.add_argument("--generation", action="store_true",
                    help="also sweep DP CFG-generation throughput")
    ap.add_argument("--compile-only", action="store_true",
                    help="lower+compile each mesh point without executing "
                         "(virtual-mesh validation for census_full, whose "
                         "CPU execution is minutes/step)")
    ap.add_argument("--gen-steps", type=int, default=16,
                    help="denoiser steps for the generation sweep")
    ap.add_argument("--max-devices", type=int, default=None)
    args = ap.parse_args(argv)

    if args.virtual:
        import subprocess

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        )
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from benchmarks.bench_multichip import main; main()"
        )
        child = [sys.executable, "-c", code, "--configs", *args.configs,
                 "--steps", str(args.steps), "--gen-steps", str(args.gen_steps)]
        if args.generation:
            child += ["--generation"]
        if args.compile_only:
            child += ["--compile-only"]
        if args.max_devices:
            child += ["--max-devices", str(args.max_devices)]
        raise SystemExit(subprocess.run(
            child, env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ).returncode)

    import jax

    n_avail = len(jax.devices())
    if args.max_devices:
        n_avail = min(n_avail, args.max_devices)
    sweep = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]

    co = args.compile_only
    results = []
    for config in args.configs:
        base = None
        # compile-only validation covers exactly the docs/scaling.md mesh
        # points (full DP, DP x gene-SP, full FSDP) instead of the timing sweep
        dp_points = [max(sweep)] if co else sweep
        for d in dp_points:
            r = run_point(config, n_data=d, n_model=1, steps=args.steps,
                          compile_only=co)
            if not co:
                base = base or r["cells_per_sec"]
                r["scaling_vs_1dev"] = round(r["cells_per_sec"] / base, 2)
            results.append(r)
            print(json.dumps(r), flush=True)
        # census also exercises DP x TP (Megatron column/row rules over
        # "model"), DP x gene-SP (decode gene axis over "model" — halves
        # the activation-gated census step's per-chip temps with param-sized
        # instead of activation-sized collectives), and full FSDP/ZeRO-3
        if config in ("census", "census_full", "tiny") and n_avail >= 4:
            sp_points = [True] if co else [False, True]
            for sp in sp_points:
                r = run_point(
                    config, n_data=n_avail // 2, n_model=2, steps=args.steps,
                    gene_sp=sp, compile_only=co,
                )
                if not co:
                    r["scaling_vs_1dev"] = round(r["cells_per_sec"] / base, 2)
                results.append(r)
                print(json.dumps(r), flush=True)
        if config in ("census", "census_full", "tiny") and n_avail >= 2:
            r = run_point(config, n_data=n_avail, n_model=1, steps=args.steps,
                          fsdp=True, compile_only=co)
            if not co:
                r["scaling_vs_1dev"] = round(r["cells_per_sec"] / base, 2)
            results.append(r)
            print(json.dumps(r), flush=True)
        if args.generation and not co:
            gbase = None
            for d in sweep:
                r = run_generation_point(config, n_data=d, num_steps=args.gen_steps)
                gbase = gbase or r["cells_per_sec"]
                r["scaling_vs_1dev"] = round(r["cells_per_sec"] / gbase, 2)
                results.append(r)
                print(json.dumps(r), flush=True)
            # DP x TP point: gene-axis-sharded decode (sequence parallelism
            # over the query/gene axis — divides the (2B, G, E) decode
            # activations by n_model per chip)
            if n_avail >= 4:
                r = run_generation_point(
                    config, n_data=n_avail // 2, num_steps=args.gen_steps,
                    n_model=2,
                )
                r["scaling_vs_1dev"] = round(r["cells_per_sec"] / gbase, 2)
                results.append(r)
                print(json.dumps(r), flush=True)
    if jax.default_backend() != "tpu":
        print(json.dumps({"note": "non-TPU platform: treat numbers as "
                          "compile/execute validation only"}), flush=True)
    return results


if __name__ == "__main__":
    main()
