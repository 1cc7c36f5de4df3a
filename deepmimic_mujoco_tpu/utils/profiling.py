"""Tracing / profiling.

The reference's observability is wall-clock only (``timed`` phases,
``logger.ProfileKV`` — SURVEY.md §5); both exist in ``utils.logger``/
``utils.console``.  This module adds the TPU-native upgrade: an XLA profiler
trace capture usable around any training phase, viewable in TensorBoard or
Perfetto."""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def xla_trace(logdir: str = "/tmp/dmtpu_trace", enabled: bool = True):
    """Capture a jax.profiler trace for the enclosed block."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield


class PhaseTimers:
    """Accumulating named phase timers (the reference's ProfileKV shape but
    reusable outside the logger)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict[str, float]:
        return dict(self.totals)
