"""Profiling hooks.

The reference's only tracing is wall-clock prints (SURVEY.md section 5).
Here: a context manager around jax.profiler for full XLA/TPU traces
(viewable in TensorBoard or Perfetto), plus a step-timer helper used by the
benchmarks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """`with trace("/tmp/trace"):` captures a jax.profiler trace."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Blocking per-call timer with warmup discard and robust stats."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: List[float] = []
        self._calls = 0

    def __call__(self, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self._calls += 1
        if self._calls > self.warmup:
            self.times.append(time.perf_counter() - t0)
        return out

    @property
    def median(self) -> float:
        ts = sorted(self.times)
        return ts[len(ts) // 2] if ts else float("nan")

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")
