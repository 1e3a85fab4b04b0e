"""Profiling / tracing instrumentation.

The reference has no structured tracing (SURVEY §5: tqdm + print timers). Here:
jax.profiler trace annotations around the hot loops + a lightweight step-timer
registry usable from the engine and benches.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


@contextlib.contextmanager
def trace(name: str):
    """jax.profiler annotation (shows up in TensorBoard/xprof traces)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timers with summary stats (host-side)."""

    def __init__(self):
        self.records: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def time(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.records[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.records.items():
            xs_sorted = sorted(xs)
            n = len(xs)
            out[name] = {
                "n": n,
                "mean_ms": 1e3 * sum(xs) / n,
                "p50_ms": 1e3 * xs_sorted[n // 2],
                "min_ms": 1e3 * xs_sorted[0],
                "max_ms": 1e3 * xs_sorted[-1],
            }
        return out


def start_server(port: int = 9999):
    """Start the jax profiler server for on-demand capture."""
    jax.profiler.start_server(port)


@contextlib.contextmanager
def capture_trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
