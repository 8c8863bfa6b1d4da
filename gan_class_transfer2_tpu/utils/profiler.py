"""Profiling and tracing hooks.

The reference has none (SURVEY §5 — no tf.profiler, no trace callbacks).
TPU-native equivalents: jax.profiler trace capture (viewable in
TensorBoard/Perfetto/XProf), per-step wall-clock timing with correct device
synchronisation, and a compiled-HLO cost probe.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` for the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labelling regions inside a trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per-step timing with a synchronising fetch.

    NOTE: on the tunneled 'axon' TPU platform ``block_until_ready`` returns
    early (measured); fetching a scalar value is the only reliable sync, so
    ``lap`` takes the step's loss (or any small output) and fetches it."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def lap(self, sync_value) -> float:
        float(sync_value)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self._t0 = time.perf_counter()
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_ms": sum(ts) / n * 1000,
            "p50_ms": ts[n // 2] * 1000,
            "p90_ms": ts[min(n - 1, int(n * 0.9))] * 1000,
            "min_ms": ts[0] * 1000,
        }


def compiled_stats(fn: Callable, *args) -> dict:
    """Compile ``fn`` (no execute) and report XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
    except Exception:
        cost = {}
    return {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
        "memory_mb": (
            compiled.memory_analysis().temp_size_in_bytes / 1e6
            if hasattr(compiled, "memory_analysis")
            else None
        ),
    }
