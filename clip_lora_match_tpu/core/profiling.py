"""Tracing / profiling hooks.

The reference has none (SURVEY §5: only print() lines and wall-clock query
timing in ref:scripts/evaluate.py:231-242). Here:

- ``trace(path)``: jax.profiler trace context for TPU timeline capture;
- ``StepTimer``: rolling per-step wall times with p50/p95 and an
  ``avg_query_time_ms``-compatible summary (same metric name the reference
  records, ref:evaluate.py:266);
- ``annotate``: named TraceAnnotation spans visible in the profiler.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named span in the device timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling wall-clock stats for a repeated operation."""

    def __init__(self, window: int = 1000):
        self._times: deque[float] = deque(maxlen=window)
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        assert self._t0 is not None
        self._times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def count(self) -> int:
        return len(self._times)

    def summary(self) -> dict:
        if not self._times:
            return {"count": 0}
        arr = np.asarray(self._times) * 1e3
        return {
            "count": len(arr),
            "avg_query_time_ms": float(arr.mean()),
            "p50_ms": float(np.percentile(arr, 50)),
            "p95_ms": float(np.percentile(arr, 95)),
            "max_ms": float(arr.max()),
        }
