"""Profiling and throughput instrumentation.

The reference's only timing artifact is a tqdm progress line (ipynb:353).
Here: named trace annotations that land in jax.profiler traces, plus a
throughput meter for images/sec accounting (the BASELINE.json metric).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(name: str):
    """jax.profiler.TraceAnnotation wrapper (no-op overhead off-profile)."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a profiler trace (view with tensorboard/xprof)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class ThroughputMeter:
    """Accumulates (items, seconds) per stage; reports items/sec."""

    totals: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def measure(self, stage: str, items: int):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        n, t = self.totals.get(stage, (0, 0.0))
        self.totals[stage] = (n + items, t + dt)

    def rate(self, stage: str) -> float:
        n, t = self.totals.get(stage, (0, 0.0))
        return n / t if t > 0 else 0.0

    def report(self) -> dict:
        return {s: {"items": n, "seconds": t, "per_second": self.rate(s)}
                for s, (n, t) in self.totals.items()}
