"""Tracing / profiling utilities.

The reference has no tracing beyond ad-hoc ``time.perf_counter`` pairs
(SURVEY §5); here we provide wall-clock span timers plus hooks into
``jax.profiler`` for device traces (view with TensorBoard or Perfetto).
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Named wall-clock spans: ``with timer.span('stft'): ...``; accumulates
    per-name totals for end-of-run reports."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, out=print):
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            out(f"{name:<30} {self.totals[name]:>9.3f}s  x{self.counts[name]}")


@contextlib.contextmanager
def trace_annotation(name: str):
    """jax.profiler.TraceAnnotation that degrades to a no-op off-device."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device profile into ``log_dir``."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
