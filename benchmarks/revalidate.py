"""Turnkey TPU re-validation queue (ROADMAP "Pending TPU re-validation").

Runs each pending measurement in its OWN serialized subprocess (two TPU
processes contend and both crawl on this platform; a crash in one item must
not take down the queue), collects every JSON line each item prints, and
writes REVALIDATION.json incrementally — if the device relay dies mid-queue
(it has), the items that finished are preserved.

    python -m benchmarks.revalidate                 # probe + core queue
    python -m benchmarks.revalidate --all           # + ldm/quality reruns
    python -m benchmarks.revalidate --items bench census
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# ROADMAP queue items, in dependency-free execution order. Each is a
# standalone command printing {"metric", "value", "unit", ...} JSON lines.
ITEMS = {
    # headline with the decoder-tail bwd_block_g=1024 dispatch actually live
    # (the swept win never shipped in round 2's number)
    "bench": [sys.executable, "bench.py"],
    # the streaming flash kernel's one real compile (scratch/grid semantics)
    "flash_compiled": [sys.executable, "-m", "benchmarks.check_flash_compiled"],
    # census MFU re-confirmation at HEAD (module path — the A/B baseline;
    # the bare default is now the production auto dispatch: algebraic + vw)
    "census": [sys.executable, "-m", "benchmarks.bench_census",
               "--no-algebraic-tail"],
    # XLA-reassociated cross+head (round-3 continuation): drops ~2.5 of the
    # census step's ~9.6 TFLOP; flips to the VAETask default if it wins
    "census_algebraic": [
        sys.executable, "-m", "benchmarks.bench_census", "--algebraic-tail",
    ],
    # the (B,G,E) temporaries gone, B=32 may fit plain (it OOMed before)
    "census_algebraic_b32": [
        sys.executable, "-m", "benchmarks.bench_census", "--algebraic-tail",
        "--batch", "32",
    ],
    # opt-in (--all): slower full reruns
    "ldm": [sys.executable, "-m", "benchmarks.bench_ldm"],
    # generation decode with the reassociated tail (forward-only win case)
    "ldm_algebraic": [
        sys.executable, "-m", "benchmarks.bench_ldm", "--algebraic-decode",
    ],
    "quality": [sys.executable, "-m", "benchmarks.quality_e2e"],
    # batch-size scaling study (VERDICT r2 item 7) — harness shipped round 3
    # but the relay died before a TPU run could populate the table
    "batch_scaling": [sys.executable, "-m", "benchmarks.bench_batch_scaling"],
    # --- round-5 queue (VERDICT r4 items 1 + 2) ------------------------------
    # census CFG serving A/B around the algebraic-decode default flip: the
    # recorded 144 cells/s predates the two-dot tail and ran the module decode
    "ldm_census_module": [
        sys.executable, "-m", "benchmarks.bench_ldm", "--census",
        "--no-algebraic-decode",
    ],
    # post-flip serving sweep (auto algebraic decode) over generation batches.
    # gen-batch 64 (CFG batch 128) OOMs the plain decode's (2B, G, Hd) SwiGLU
    # temporaries (~13 GB) — measured round 5; the swiglu_vec decode
    # (LDMTask(algebraic_fused_gate=True)) is the escape hatch beyond 32
    "ldm_census_sweep": [
        sys.executable, "-m", "benchmarks.bench_ldm", "--census",
        "--gen-batch", "0", "32",
    ],
    # default-shape serving sweep (dentate VAE decode, module path at E=32)
    "ldm_gen_sweep": [
        sys.executable, "-m", "benchmarks.bench_ldm",
        "--gen-batch", "0", "256", "512",
    ],
    # dentate B>128 superlinearity: per-path A/B at the big batches
    "batch_scaling_algebraic": [
        sys.executable, "-m", "benchmarks.bench_batch_scaling",
        "--configs", "dentate", "--batches", "128", "256", "512",
        "--tail", "algebraic",
    ],
    "batch_scaling_module": [
        sys.executable, "-m", "benchmarks.bench_batch_scaling",
        "--configs", "dentate", "--batches", "256", "512",
        "--tail", "module",
    ],
    # batch-chunked fused tail (round-5 candidate fix): each 128-chunk runs
    # at its own best bwd tiles instead of the compile-safe (512,8) monolith
    "batch_scaling_chunked": [
        sys.executable, "-m", "benchmarks.bench_batch_scaling",
        "--configs", "dentate", "--batches", "128", "256", "512",
        "--tail", "fused_chunked",
    ],
    # the 1024-2047 flash dispatch range was extrapolated (ADVICE r4)
    "flash_1024": [
        sys.executable, "-m", "benchmarks.bench_flash_crossover",
        "--lens", "1024", "2048",
    ],
    # --- round-5 wins, re-runnable at HEAD -----------------------------------
    # attention-output-projection fold (VERDICT r4 item 8): the new census
    # records (B=16: 98.1 ms; B=32: 182.2 ms = 58.9% MFU, measured 2026-08-20)
    "census_vw": [sys.executable, "-m", "benchmarks.bench_census"],
    "census_vw_b32": [
        sys.executable, "-m", "benchmarks.bench_census", "--batch", "32",
    ],
    # densify-free NB train loss A/B (the 7.5-33 ms lean-wire scatter)
    "batch_scaling_lean": [
        sys.executable, "-m", "benchmarks.bench_batch_scaling",
        "--configs", "dentate", "--batches", "128", "256", "512",
        "--lean-loss",
    ],
    # swiglu_vec decode escape hatch at the serving batches plain XLA can't
    # fit (round-5: gen-batch 64 = 152.4 cells/s; plain OOMs there)
    "ldm_census_fused_gate": [
        sys.executable, "-m", "benchmarks.bench_ldm", "--census",
        "--fused-gate-decode", "--gen-batch", "32", "64",
    ],
    # atlas-scale e2e rehearsal (BASELINE configs[3]): HLCA-shaped multi-shard
    # CLI training from disk + mid-run SIGTERM + step-exact resume. Round-5
    # chip run: PASSED (742 cells/s from disk; preempt 24 -> resume 24 ->
    # done 176 == max_steps) after it caught the pre-split-n_cells max_steps
    # overshoot (datamodule.py n_cells fix). ~35 min incl. synthesis+compile.
    "atlas": [sys.executable, "-m", "benchmarks.atlas_rehearsal"],
}
CORE = ["bench", "flash_compiled", "census", "census_algebraic", "census_algebraic_b32"]


def probe(timeout_s: int = 120) -> dict:
    """Tiny on-device matmul in a subprocess: is the accelerator reachable?
    (On the tunneled dev platform a dead relay hangs interpreter startup —
    only a subprocess + timeout detects that safely.)"""
    code = (
        "import jax, jax.numpy as jnp;"
        "d = jax.devices();"
        "x = jnp.ones((256, 256));"
        "print('PROBE_OK', d[0].platform, float((x @ x).sum()))"
    )
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, cwd=REPO,
        )
        ok = r.returncode == 0 and "PROBE_OK" in r.stdout
        return {"ok": ok, "detail": r.stdout.strip()[-200:] or r.stderr.strip()[-200:],
                "elapsed_s": round(time.time() - t0, 1)}
    except subprocess.TimeoutExpired:
        return {"ok": False, "detail": f"probe timed out after {timeout_s}s "
                "(device relay unreachable?)", "elapsed_s": timeout_s}


def probe_with_retry(attempts: int = 5, timeout_s: int = 240) -> dict:
    """Ride out relay flaps the way bench.py does (bench._device_reachable_with_retry):
    round-5 observed the relay cycle down→up→down within ~10 min, so a single
    240s probe can land inside a blip that a later attempt clears."""
    last = {}
    for i in range(attempts):
        last = probe(timeout_s=timeout_s)
        if last["ok"]:
            last["attempts"] = i + 1
            return last
        if i < attempts - 1:
            time.sleep(min(60, 10 * (i + 1)))
    last["attempts"] = attempts
    return last


def run_item(name: str, cmd, timeout_s: int) -> dict:
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    t0 = time.time()
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s, cwd=REPO, env=env,
        )
    except subprocess.TimeoutExpired as e:
        def _text(x):
            return x.decode(errors="replace") if isinstance(x, bytes) else (x or "")
        return {"status": "timeout", "elapsed_s": round(time.time() - t0, 1),
                "results": parse_json_lines(_text(e.stdout)),
                "stderr_tail": _text(e.stderr).strip()[-500:]}
    status = "ok" if r.returncode == 0 else "failed"
    return {
        "status": status,
        "elapsed_s": round(time.time() - t0, 1),
        "results": parse_json_lines(r.stdout),
        "stderr_tail": "" if status == "ok" else r.stderr.strip()[-500:],
    }


def parse_json_lines(text: str):
    rows = []
    for line in (text or "").splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if rows:
        return rows
    # some items (quality_e2e) print ONE indented multi-line JSON object
    # instead of JSON lines — recover it: fix the end at the last '}', try
    # each '{' start until one parses (earlier braces in log lines fail)
    text = text or ""
    end = text.rfind("}")
    start = text.find("{")
    while 0 <= start < end:
        try:
            return [json.loads(text[start : end + 1])]
        except json.JSONDecodeError:
            start = text.find("{", start + 1)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--items", nargs="*", choices=sorted(ITEMS), default=None)
    p.add_argument("--all", action="store_true")
    p.add_argument("--timeout", type=int, default=2400,
                   help="per-item seconds (first compiles run minutes here)")
    p.add_argument("--out", default=str(REPO / "REVALIDATION.json"))
    p.add_argument("--skip-probe", action="store_true")
    p.add_argument("--probe-timeout", type=int, default=240,
                   help="seconds; the tunneled relay's cold start has "
                        "measured ~60s healthy and >120s while flapping")
    args = p.parse_args()

    names = args.items or (list(ITEMS) if args.all else CORE)
    report = {"started_unix": round(time.time(), 1), "items": {}}
    out_path = Path(args.out)
    if out_path.exists():
        # merge mode: keep previously-collected items (a dead-relay abort or a
        # partial --items run must never clobber finished measurements); items
        # re-run now overwrite their old entries
        try:
            report["items"] = json.loads(out_path.read_text()).get("items", {})
        except (json.JSONDecodeError, OSError):
            pass

    if not args.skip_probe:
        report["probe"] = probe_with_retry(timeout_s=args.probe_timeout)
        out_path.write_text(json.dumps(report, indent=2))
        print(f"probe: {report['probe']}", flush=True)
        if not report["probe"]["ok"]:
            print("device unreachable — aborting queue (report written)", flush=True)
            return 1

    for name in names:
        print(f"== {name}: {' '.join(ITEMS[name][1:]) or 'bench.py'}", flush=True)
        report["items"][name] = run_item(name, ITEMS[name], args.timeout)
        out_path.write_text(json.dumps(report, indent=2))  # preserve partials
        item = report["items"][name]
        print(f"   {item['status']} in {item['elapsed_s']}s, "
              f"{len(item['results'])} metrics", flush=True)
    report["finished_unix"] = round(time.time(), 1)
    out_path.write_text(json.dumps(report, indent=2))
    failed = [n for n, i in report["items"].items() if i["status"] != "ok"]
    print(f"done -> {out_path}" + (f" (failed: {failed})" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
