"""Profiling hooks (SURVEY §5: the reference has no tracing; jax profiler /
xprof is the TPU-native answer).

Usage:
    with trace("/tmp/scldm_trace"):        # open in xprof / tensorboard
        state, m = task.train_step(state, batch)

    python -m scldm_tpu.cli.train training.profile_dir=/tmp/trace ...
captures the first few post-compile steps automatically.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, host_only: bool = False):
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in the trace viewer."""
    with jax.profiler.TraceAnnotation(name):
        yield


def capture_train_steps(task, state, batch, log_dir: str, steps: int = 3):
    """Capture a short trace of compiled train steps (after warmup)."""
    state, m = task.train_step(state, batch)  # compile outside the trace
    float(m["train_loss"])  # scalar fetch: reliable sync on tunneled platforms
    with trace(log_dir):
        for _ in range(steps):
            with annotate("train_step"):
                state, m = task.train_step(state, batch)
        float(m["train_loss"])
    return state
