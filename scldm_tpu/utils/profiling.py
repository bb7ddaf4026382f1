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


class StepProfiler:
    """In-loop trace capture for `training.loop.fit` (training.profile_dir=...).

    Dispatch 1 is the compile dispatch; the trace covers dispatches
    2 .. 1+steps. ``tick`` is called once per train dispatch with that
    dispatch's metrics — the scalar fetches force device completion at the
    window edges (on remote-attached platforms only scalar fetches provably
    sync), so the captured window holds exactly the profiled steps."""

    def __init__(self, log_dir: Optional[str], steps: int = 3):
        self.log_dir = log_dir
        self.steps = max(int(steps), 1)
        self._n = 0
        self._active = False

    def tick(self, metrics) -> None:
        if not self.log_dir:
            return
        self._n += 1
        if self._n == 1:
            float(metrics["train_loss"])  # drain the compile dispatch
            try:
                jax.profiler.start_trace(self.log_dir, create_perfetto_link=False)
            except Exception as start_err:
                # a crashed earlier fit() in this process may have left a
                # trace open; its partial data is lost either way — try to
                # recover the session. If the recovery itself fails (nothing
                # was open: the start failed for a real reason, e.g. a bad
                # profile_dir), surface the ORIGINAL error, not the masked
                # 'no profile session running'.
                try:
                    jax.profiler.stop_trace()
                    jax.profiler.start_trace(self.log_dir, create_perfetto_link=False)
                except Exception:
                    raise start_err
            self._active = True
        elif self._active and self._n >= 1 + self.steps:
            float(metrics["train_loss"])  # force the profiled work to finish
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        """Stop a still-open trace (run shorter than 1+steps dispatches)."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


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
