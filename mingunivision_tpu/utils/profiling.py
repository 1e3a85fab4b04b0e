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


def force_sync(out) -> float:
    """Force completion of `out`'s computation chain and return a scalar.

    On the axon TPU tunnel `block_until_ready` returns without blocking
    (remote-execution quirk); the only reliable sync is a host fetch. A scalar
    sum keeps the transfer at 4 bytes while depending on every element.
    """
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(out)
    acc = jnp.float32(0)
    for leaf in leaves:
        if hasattr(leaf, "dtype"):
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
    return float(acc)


def bench_fn(f, *args, iters: int = 10, warmup: int = 2) -> float:
    """Robust per-iteration wall time for a jitted function on any backend."""
    out = f(*args)
    force_sync(out)
    for _ in range(warmup):
        out = f(*args)
    force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    force_sync(out)
    return (time.perf_counter() - t0) / iters


def bench_carry_fn(f, carry, *args, iters: int = 10, warmup: int = 2):
    """bench_fn for steps of the form `carry, out = f(carry, *args)` that
    DONATE their carry (e.g. make_train_step): each timed iteration feeds the
    previous iteration's fresh carry, so donated buffers are never reused.
    Returns (seconds_per_iter, final_carry)."""
    carry, out = f(carry, *args)
    force_sync(out)
    for _ in range(warmup):
        carry, out = f(carry, *args)
    force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, out = f(carry, *args)
    force_sync(out)
    return (time.perf_counter() - t0) / iters, carry


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
