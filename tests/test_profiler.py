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


def test_cli_profile_command(tmp_path, capsys):
    """gct2 profile traces N steps and prints a JSON summary line."""
    import json

    from gan_class_transfer2_tpu import cli

    rc = cli.main([
        "profile", "--platform", "cpu", "--model", "diffusion",
        "--size", "16", "--pixel-size", "4", "--max-size", "8",
        "--octaves", "2", "--steps", "4", "--batch-size", "2",
        "--fused-diffusion", "false", "--warm-up", "0",
        "--profile-steps", "2", "--trace-dir", str(tmp_path / "trace"),
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["command"] == "profile"
    assert out["wall_ms_per_step"] > 0
    assert out["images_per_sec"] > 0
    import os

    assert os.path.isdir(out["trace_dir"])


def test_step_timer_p90_nearest_rank_and_start_guard():
    import pytest

    from gan_class_transfer2_tpu.utils.profiler import StepTimer

    t = StepTimer()
    with pytest.raises(RuntimeError, match="before start"):
        t.lap(1.0)
    # 10 laps: nearest-rank p90 is the 9th value, NOT the max (review r4)
    t.times = [float(i) for i in range(1, 11)]  # 1..10 s
    s = t.summary()
    assert s["p90_ms"] == pytest.approx(9000.0)
    assert s["p50_ms"] == pytest.approx(6000.0)
