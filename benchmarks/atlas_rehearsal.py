#!/usr/bin/env python
"""Atlas-scale end-to-end rehearsal (BASELINE.json configs[3], VERDICT r4
weak #8): HLCA-shaped multi-shard training through the REAL CLI, from disk,
with prefetch + mid-run SIGTERM + step-exact resume — the configuration most
likely to expose host-pipeline or shape-bucketing surprises, which no unit
test or synthetic single-file bench exercises.

What it does:
 1. Synthesizes a sharded on-disk dataset at TRUE HLCA shape: G=27,997 (the
    real vendored gene list, metadata/hlca_train.json), genes_seq_len=10,186,
    counts in layers/X_counts (the hlca config's adata_attr/adata_key path),
    >=20 shards + metadata.json (reference sharded-collection semantics,
    /root/reference/src/scldm/datamodule.py:272-330).
 2. Phase A: launches `python -m scldm_tpu.cli.train datamodule.dataset=hlca`
    as a subprocess, waits for real training dispatches, then delivers
    SIGTERM mid-run (spot-preemption rehearsal). The guard checkpoints at the
    next dispatch boundary and exits cleanly.
 3. Phase B: relaunches the identical command; asserts the auto-resume picks
    up the preempted step and the run finishes at EXACTLY max_steps.
 4. Emits JSON-line metrics: from-disk cells/s (sustained, post-compile),
    preempt step, resume step, final step, and the step-exactness verdict.

Run: python -m benchmarks.atlas_rehearsal [--cells-per-shard 512 --shards 24]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
G_HLCA = 27_997
SEQ_LEN_HLCA = 10_186


def synthesize(root: Path, n_shards: int, cells_per_shard: int, seed: int = 11):
    """Sharded HLCA-shaped dataset on disk (cached across runs)."""
    from scipy import sparse

    from scldm_tpu.data.h5ad import write_h5ad

    marker = root / "SYNTH_OK"
    if marker.exists():
        return
    meta = json.loads((REPO / "metadata" / "hlca_train.json").read_text())
    genes = meta["genes"]
    assert len(genes) == G_HLCA
    cell_types = meta["labels"]["cell_type"]
    shard_dir = root / "shards"
    shard_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for s in range(n_shards):
        indptr = np.zeros(cells_per_shard + 1, np.int64)
        idx_chunks, dat_chunks = [], []
        for i in range(cells_per_shard):
            # expressed-gene count within the hlca seq_len window
            nnz = int(rng.integers(2_000, 8_000))
            idx_chunks.append(np.sort(rng.choice(G_HLCA, size=nnz, replace=False)))
            dat_chunks.append((rng.poisson(2.5, size=nnz) + 1).astype(np.float32))
            indptr[i + 1] = indptr[i] + nnz
        X = sparse.csr_matrix(
            (np.concatenate(dat_chunks), np.concatenate(idx_chunks), indptr),
            shape=(cells_per_shard, G_HLCA),
        )
        obs_ct = rng.choice(cell_types, size=cells_per_shard)
        # hlca reads layers/X_counts (configs/datamodule/default.yaml hlca
        # block); X carries the same matrix so generic tools stay happy
        write_h5ad(
            shard_dir / f"adata_{s}.h5ad", X, obs={"cell_type": obs_ct},
            var_names=genes, layers={"X_counts": X},
        )
        print(f"shard {s + 1}/{n_shards} written", flush=True)
    (shard_dir / "metadata.json").write_text(json.dumps({
        "n_cells": n_shards * cells_per_shard,
        "shard_size": cells_per_shard,
        "last_shard_size": cells_per_shard,
    }))
    mu = {"cell_type": {ct: 8.6 for ct in cell_types}}
    sd = {"cell_type": {ct: 0.3 for ct in cell_types}}
    (root / "mu.json").write_text(json.dumps(mu))
    (root / "sd.json").write_text(json.dumps(sd))
    marker.write_text("ok")


def cli_cmd(root: Path, out_dir: Path, epochs: int, batch: int) -> list:
    return [
        sys.executable, "-m", "scldm_tpu.cli.train",
        "datamodule.dataset=hlca",
        f"datamodule.datamodule.train_adata_path={root / 'shards'}",
        f"datamodule.dataset_params.hlca.mu_size_factor={root / 'mu.json'}",
        f"datamodule.dataset_params.hlca.sd_size_factor={root / 'sd.json'}",
        f"paths.output_path={out_dir}",
        f"model.batch_size={batch}",
        f"epochs={epochs}",
        "datamodule.datamodule.prefetch=4",
        "training.log_every_steps=8",
    ]


LOG_STEP = re.compile(r"\bstep (\d+) epoch \d+ ")
LOG_RESUME = re.compile(r"auto-resumed from checkpoint at step (\d+)")
LOG_MAXSTEPS = re.compile(r"max_steps=(\d+)")
LOG_DONE = re.compile(r"done at step (\d+)")
LOG_PREEMPT = re.compile(r"preemption signal: checkpointing at step (\d+)")


def run_phase(cmd, *, sigterm_after_steps: int | None, timeout_s: int) -> dict:
    """Run the CLI, streaming its log; optionally SIGTERM (by pid, never by
    pattern) once `sigterm_after_steps` training steps have been logged."""
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    proc = subprocess.Popen(
        cmd, cwd=REPO, env=env, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    out = {"steps_seen": [], "resume_step": None, "max_steps": None,
           "done_step": None, "preempt_step": None, "lines": 0}
    sent = False
    t0 = time.time()
    assert proc.stdout is not None
    for line in proc.stdout:
        out["lines"] += 1
        if m := LOG_STEP.search(line):
            out["steps_seen"].append(int(m.group(1)))
        if m := LOG_RESUME.search(line):
            out["resume_step"] = int(m.group(1))
        if m := LOG_MAXSTEPS.search(line):
            out["max_steps"] = int(m.group(1))
        if m := LOG_DONE.search(line):
            out["done_step"] = int(m.group(1))
        if m := LOG_PREEMPT.search(line):
            out["preempt_step"] = int(m.group(1))
        if (
            not sent
            and sigterm_after_steps is not None
            and out["steps_seen"]
            and out["steps_seen"][-1] >= sigterm_after_steps
        ):
            proc.send_signal(signal.SIGTERM)  # direct pid — the guard's path
            sent = True
        if time.time() - t0 > timeout_s:
            proc.kill()
            raise TimeoutError(f"phase exceeded {timeout_s}s")
    rc = proc.wait(timeout=120)
    out["rc"] = rc
    return out


def sustained_rate(csv_path: Path) -> float | None:
    """Median post-compile cells/sec from the training CSV (first row's
    window includes the compile; drop it)."""
    import csv as _csv

    if not csv_path.exists():
        return None
    rows = []
    with csv_path.open() as f:
        for r in _csv.DictReader(f):
            v = r.get("cells_per_sec")
            if v:
                rows.append(float(v))
    if len(rows) < 2:
        return None
    return float(np.median(rows[1:]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=24)
    ap.add_argument("--cells-per-shard", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--root", default="/tmp/scldm_atlas_hlca")
    ap.add_argument("--timeout", type=int, default=1800, help="per phase")
    ap.add_argument("--sigterm-after-steps", type=int, default=24)
    args = ap.parse_args()

    root = Path(args.root)
    synthesize(root, args.shards, args.cells_per_shard)
    run_dir = root / f"run_{int(time.time())}"
    cmd = cli_cmd(root, run_dir, args.epochs, args.batch)
    print("cmd:", " ".join(cmd[1:]), flush=True)

    # phase A: train until real dispatches flow, then SIGTERM mid-run
    a = run_phase(cmd, sigterm_after_steps=args.sigterm_after_steps,
                  timeout_s=args.timeout)
    print(f"phase A: rc={a['rc']} preempt_step={a['preempt_step']} "
          f"max_steps={a['max_steps']}", flush=True)
    preempted_ok = a["rc"] == 0 and a["preempt_step"] is not None

    # phase B: identical relaunch; must auto-resume and finish at max_steps
    b = run_phase(cmd, sigterm_after_steps=None, timeout_s=args.timeout)
    print(f"phase B: rc={b['rc']} resume_step={b['resume_step']} "
          f"done_step={b['done_step']} max_steps={b['max_steps']}", flush=True)

    ckpt_dir = run_dir / "checkpoints" / "vae_hlca"
    rate = sustained_rate(ckpt_dir / "metrics.csv")
    step_exact = (
        preempted_ok
        and b["rc"] == 0
        and b["resume_step"] is not None
        and b["resume_step"] == a["preempt_step"]
        and b["done_step"] == b["max_steps"]
    )
    n_cells = args.shards * args.cells_per_shard
    print(json.dumps({
        "metric": "atlas_hlca_from_disk_cells_per_sec",
        "value": round(rate, 1) if rate else None,
        "unit": f"cells/s (G={G_HLCA}, seq={SEQ_LEN_HLCA}, {args.shards} shards, "
                f"{n_cells} cells, prefetch=4)",
        "vs_baseline": None,
    }), flush=True)
    print(json.dumps({
        "metric": "atlas_resume_step_exact",
        "value": 1.0 if step_exact else 0.0,
        "unit": "bool",
        "preempt_step": a["preempt_step"],
        "resume_step": b["resume_step"],
        "done_step": b["done_step"],
        "max_steps": b["max_steps"],
        "vs_baseline": None,
    }), flush=True)
    return 0 if step_exact else 1


if __name__ == "__main__":
    raise SystemExit(main())
