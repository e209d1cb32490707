"""Profiling / timing harness (SURVEY.md §5.1 — the reference has only
wall-clock prints around corpus encode, search_pipeline.py:65-71).

- ``Timer``: wall-clock timing that forces a host readback of the result
  (``block_until_ready`` alone is unreliable through remote-device relays).
- ``trace``: context manager around ``jax.profiler`` producing TensorBoard-
  loadable traces.
- ``benchmark_fn``: warmup + timed iterations → {mean_ms, p50_ms, p95_ms,
  throughput}.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


def force_sync(x):
    """Materialize a result on host (tree-aware)."""
    return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), x)


class Timer:
    def __init__(self, name: str = "timer"):
        self.name = name
        self.records = []

    @contextlib.contextmanager
    def time(self, label: str = ""):
        t0 = time.perf_counter()
        yield
        self.records.append((label, time.perf_counter() - t0))

    def summary(self) -> Dict[str, float]:
        return {label: dt for label, dt in self.records}


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    iters: int = 10,
    items_per_call: Optional[int] = None,
) -> Dict[str, float]:
    """Time ``fn(*args)`` with forced host sync per iteration."""
    for _ in range(warmup):
        force_sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(fn(*args))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    out = {
        "mean_ms": float(times.mean() * 1e3),
        "p50_ms": float(np.percentile(times, 50) * 1e3),
        "p95_ms": float(np.percentile(times, 95) * 1e3),
    }
    if items_per_call:
        out["throughput_per_sec"] = float(items_per_call / times.mean())
    return out
