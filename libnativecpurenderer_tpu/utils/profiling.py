"""Tracing / metrics utilities.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars only).
This module provides the TPU build's observability surface: phase timers,
rolling throughput counters (FPS, Mtri/s, xRT), and a hook into
``jax.profiler`` for device traces.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

log = logging.getLogger("tpurender.profiling")


class PhaseTimer:
    """Accumulating named phase timer.

    >>> timer = PhaseTimer()
    >>> with timer.phase("bin"):
    ...     ...
    >>> timer.report()
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self, logger=None) -> Dict[str, float]:
        out = {}
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            out[name] = total
            (logger or log).info(
                "%-20s %8.3f s total, %6d calls, %8.3f ms/call",
                name, total, n, total / n * 1e3)
        return out

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


class Throughput:
    """Rolling throughput counter (e.g. frames/sec, Mtri/s)."""

    def __init__(self, unit: str = "items/s", window: int = 120) -> None:
        self.unit = unit
        self.window = window
        self._stamps = []
        self._amounts = []

    def tick(self, amount: float = 1.0) -> None:
        self._stamps.append(time.perf_counter())
        self._amounts.append(amount)
        if len(self._stamps) > self.window:
            self._stamps.pop(0)
            self._amounts.pop(0)

    @property
    def rate(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        dt = self._stamps[-1] - self._stamps[0]
        if dt <= 0:
            return 0.0
        return sum(self._amounts[1:]) / dt


@contextlib.contextmanager
def device_trace(path: Optional[str] = None):
    """jax.profiler trace context (no-op when path is None)."""
    if path is None:
        yield
        return
    import jax
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
