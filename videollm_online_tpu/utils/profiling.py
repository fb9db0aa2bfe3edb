"""Tracing / profiling hooks.

The reference has no profiling beyond wall-clock FPS accounting in the CLI
(demo/cli.py:33-39; SURVEY.md §5). Here: ``jax.profiler`` trace sessions and
named TraceAnnotations around the encode / prefill / ingest / decode stages,
plus a lightweight latency histogram for the per-frame p50/p99 numbers the
BASELINE demands."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace_session(logdir: Optional[str]):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the profiler timeline."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class LatencyHistogram:
    """Per-stage wall-clock samples -> p50/p90/p99 summaries.

    ``max_samples`` bounds per-stage memory for long-running servers
    (sliding window of the most recent samples; None = unbounded, for
    benchmark runs that want every sample)."""

    def __init__(self, max_samples: Optional[int] = None):
        self.samples: Dict[str, List[float]] = {}
        self.max_samples = max_samples

    @contextlib.contextmanager
    def measure(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(stage, time.perf_counter() - t0)

    def add(self, stage: str, seconds: float):
        xs = self.samples.setdefault(stage, [])
        xs.append(seconds)
        if self.max_samples is not None and len(xs) > 2 * self.max_samples:
            del xs[:-self.max_samples]

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for stage, xs in self.samples.items():
            a = np.asarray(xs)
            out[stage] = {
                "count": int(a.size),
                "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p90_ms": float(np.percentile(a, 90) * 1e3),
                "p99_ms": float(np.percentile(a, 99) * 1e3),
            }
        return out
