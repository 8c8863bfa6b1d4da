"""Profiler utility tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_class_transfer2_tpu.utils import profiler


def test_step_timer():
    t = profiler.StepTimer()
    t.start()
    for i in range(3):
        x = jnp.asarray(float(i))
        t.lap(x)
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_ms"] >= 0


def test_compiled_stats():
    def f(x):
        return (x @ x).sum()

    stats = profiler.compiled_stats(f, jnp.ones((64, 64)))
    assert stats["flops"] is None or stats["flops"] > 0


def test_trace_writes_files(tmp_path):
    d = str(tmp_path / "trace")
    with profiler.trace(d):
        jnp.ones((8, 8)).sum().block_until_ready()
    import os

    found = []
    for root, _, files in os.walk(d):
        found += files
    assert found  # some trace artifact was written
