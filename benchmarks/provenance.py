"""Shared provenance stamp for quality/benchmark artifacts: records which
commit produced the numbers and on what device (VERDICT r3 item 7 — a
committed QUALITY.json must certify the shipping code, not an older tree)."""

from __future__ import annotations

import subprocess
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def provenance() -> dict:
    out = {"unix_time": round(time.time(), 1)}
    try:
        out["git_head"] = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=REPO, timeout=10,
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True, text=True,
            cwd=REPO, timeout=10,
        ).stdout.strip()
        out["git_dirty"] = bool(dirty)
    except Exception:
        out["git_head"] = None
    try:
        import jax

        out["platform"] = jax.default_backend()
        out["device"] = str(jax.devices()[0])
    except Exception:
        out["platform"] = None
    return out
