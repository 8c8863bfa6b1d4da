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
        if self._t0 is None:  # fail cleanly BEFORE the device fetch
            raise RuntimeError("StepTimer.lap() called before start()")
        float(sync_value)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self._t0 = time.perf_counter()
        return dt

    def summary(self) -> dict:
        import math

        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        # nearest-rank percentile: ceil(q·n)-1 — int(n·0.9) is one past it
        # and reported the MAX as "p90" for round n
        p90 = ts[max(0, math.ceil(0.9 * n) - 1)]
        return {
            "steps": n,
            "mean_ms": sum(ts) / n * 1000,
            "p50_ms": ts[n // 2] * 1000,
            "p90_ms": p90 * 1000,
            "min_ms": ts[0] * 1000,
        }


def parse_xplane_device_ops(trace_dir: str, top: int = 25) -> list:
    """Aggregate device-plane event durations by op name from the xplane
    proto a ``trace()`` capture wrote.

    Returns up to ``top`` rows ``{"ms", "calls", "op"}`` sorted by total
    time (summed across traced steps; async ops overlap, so the column sum
    can exceed wall time). Parsing needs the xplane protobuf that ships
    with the TensorFlow installed in this image — returns [] when either
    the proto module or a capture file is unavailable (the trace directory
    itself stays viewable in TensorBoard/Perfetto/XProf)."""
    import glob as globlib
    from collections import defaultdict

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:  # pragma: no cover — TF-less environments
        return []
    paths = globlib.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        return []
    # newest CAPTURE wins: a reused --trace-dir holds one timestamped dir
    # per capture. Within the newest capture, parse EVERY xplane.pb — a
    # multi-host trace writes one file per host, and parsing only the
    # newest-mtime file silently dropped the other hosts' device planes.
    newest_dir = os.path.dirname(max(paths, key=os.path.getmtime))
    capture = [p for p in paths if os.path.dirname(p) == newest_dir]
    # ONE aggregate across all device planes: a multi-chip trace has one
    # plane per core, and per-plane rows would duplicate every op with
    # fractional times (consuming the top-N with repeats)
    agg = defaultdict(lambda: [0.0, 0])
    for path in capture:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device:" not in plane.name:
                continue
            ev_names = {k: v.name for k, v in plane.event_metadata.items()}
            # only the op line: 'XLA Modules'/'Steps'/scope lines re-cover
            # the same intervals under different names, so summing every
            # line double-counts and fills the top-N with non-op rows
            lines = [l for l in plane.lines if l.name == "XLA Ops"]
            if not lines:  # older layouts: fall back to everything
                lines = list(plane.lines)
            for line in lines:
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                    agg[name][0] += ev.duration_ps / 1e9  # → ms
                    agg[name][1] += 1
    rows = [(ms, n, name) for name, (ms, n) in agg.items()]
    rows.sort(reverse=True)
    return [
        {"ms": round(ms, 3), "calls": n, "op": name[:120]}
        for ms, n, name in rows[:top]
    ]


def compiled_stats(fn: Callable, *args) -> dict:
    """Compile ``fn`` (no execute) and report XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        if cost is None:  # some backends return None instead of raising
            cost = {}
    except Exception:
        cost = {}
    try:
        mem = compiled.memory_analysis()
        memory_mb = (
            mem.temp_size_in_bytes / 1e6 if mem is not None else None
        )
    except Exception:  # Unimplemented on some backends
        memory_mb = None
    return {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
        "memory_mb": memory_mb,
    }
