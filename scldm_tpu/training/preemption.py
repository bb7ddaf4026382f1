"""Preemption-safe training: checkpoint-and-exit on SIGTERM.

TPU pods (GKE spot nodes, preemptible queued resources) deliver SIGTERM with
a grace window before the hard kill. The reference never handles it — its
Lightning run dies mid-epoch and loses everything since the last epoch save.
Here the signal handler only flips a `threading.Event` (async-signal-safe);
the fit loop polls the guard at dispatch boundaries, breaks out, writes a
final checkpoint through the normal (collective-safe) orbax path, and
returns cleanly so auto-resume continues from the preempted step.

Multi-host runs must AGREE on stopping — orbax saves are collective, so one
process saving while the others keep training deadlocks both sides. The
guard therefore reduces the local flag across processes (any-host-preempted
=> all stop) before reporting it.
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable

import jax
import numpy as np

from scldm_tpu.utils.logger import logger


class PreemptionGuard:
    """Installable SIGTERM (by default) stop flag for the fit loop.

    `poll_every` sets the multi-host agreement cadence: the cross-process
    allgather runs once per `poll_every` calls to `stop_requested_global`
    (i.e. once per N train batches) instead of every batch, bounding the
    DCN round-trip overhead. The cadence counter advances identically on
    every host (all hosts poll once per batch in lockstep), so the refresh
    points — and therefore the stop decision — stay globally agreed. Worst
    case adds poll_every-1 batches of grace-window latency. Local
    (single-process) queries are exact and free."""

    def __init__(
        self,
        signals: Iterable[int] = (signal.SIGTERM,),
        poll_every: int = 8,
    ):
        self._signals = tuple(signals)
        self._event = threading.Event()
        self._prev: dict = {}
        self._installed = False
        self._poll_every = max(int(poll_every), 1)
        self._calls = 0
        self._agreed = False  # cached multi-host decision (latches True)

    # -- lifecycle ----------------------------------------------------------
    def install(self) -> "PreemptionGuard":
        """Register handlers (main thread only — a signal module constraint).

        Off the main thread, ``signal.signal`` raises ValueError; the guard
        degrades to programmatic-flag-only mode (``request_stop()`` still
        works) instead of crashing callers that drive the train CLIs from a
        worker thread (notebook runners, orchestration harnesses)."""
        if self._installed:
            return self
        try:
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._on_signal)
        except ValueError:
            # off the main thread every signal.signal call fails, so nothing
            # was registered and there is nothing to roll back
            self._prev.clear()
            logger.warning(
                "PreemptionGuard: not on the main thread — signal handlers "
                "unavailable; preemption stop works only via request_stop()"
            )
        self._installed = True
        return self

    def uninstall(self) -> None:
        if not self._installed:
            return
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        self._installed = False

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> None:
        self.uninstall()

    # -- signal path ----------------------------------------------------------
    def _on_signal(self, signum, frame) -> None:
        # Event.set is async-signal-safe enough for CPython (a single atomic
        # flag flip); everything else (logging, saving) happens in the loop
        self._event.set()

    def request_stop(self) -> None:
        """Programmatic trigger (tests, external orchestrators)."""
        self._event.set()

    # -- queries ----------------------------------------------------------------
    @property
    def stop_requested(self) -> bool:
        """This process's local flag."""
        return self._event.is_set()

    def stop_requested_global(self) -> bool:
        """True if ANY process was signalled — the decision every host must
        share before entering a collective checkpoint save. Multi-host, the
        allgather runs at the poll_every cadence (see class docstring);
        between refreshes the cached agreed decision is returned, NEVER the
        bare local flag — one host acting on a local flag its peers have not
        agreed to would desync the collective save."""
        local = self._event.is_set()
        if jax.process_count() == 1:
            return local
        if self._agreed:
            return True
        refresh = self._calls % self._poll_every == 0
        self._calls += 1
        if not refresh:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(np.asarray([local]))
        agreed = bool(np.any(flags))
        if agreed and not local:
            logger.info("peer process preempted; stopping in lockstep")
        self._agreed = agreed
        return agreed
