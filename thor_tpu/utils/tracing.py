"""Tracing / profiling hooks.

The reference has no profiling (SURVEY.md §5); the TPU-native
equivalents are jax.profiler device traces plus simple per-stage
wall-clock metrics for the host pipeline stages (parse, input build,
device step, output).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates wall-clock per named pipeline stage."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:24s} {t*1000:10.2f} ms total "
                         f"{t/n*1000:8.3f} ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context for the device program; view with
    TensorBoard or xprof."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
