"""Profiling hooks: jax.profiler traces + steps/sec counters.

The reference has no profiling at all (SURVEY.md §5.1 — only tqdm bars).
The north-star metric is NST optimization steps/sec, so the counters here
are first-class and feed ``bench.py``.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """``with trace('/tmp/jax-trace'):`` captures a device trace viewable
    in XProf/TensorBoard; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock steps/sec and items/sec, excluding the first (compile)
    measurement by default."""

    def __init__(self, skip_first: bool = True):
        self.skip_first = skip_first
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def measured(self) -> list[float]:
        return self.times[1:] if (self.skip_first and len(self.times) > 1) else self.times

    def per_sec(self, units_per_step: float = 1.0) -> float:
        m = self.measured
        if not m:
            return 0.0
        return units_per_step * len(m) / sum(m)
