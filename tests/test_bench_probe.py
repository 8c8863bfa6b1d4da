"""bench.py's persistent TPU probe policy (VERDICT r4 #1 + r5 review):
timeouts are transient (tunnel flaps — retry under the budget); non-zero
probe exits are deterministic (no TPU runtime — fall back after two, not
after ~3 minutes of useless retries)."""

import importlib.util
import os
import subprocess
import types

import pytest


@pytest.fixture(scope="module")
def bench():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py",
    )
    spec = importlib.util.spec_from_file_location("gct2_bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Clock:
    def __init__(self):
        self.now = 0.0
        self.slept = []

    def monotonic(self):
        return self.now

    def sleep(self, s):
        self.slept.append(s)
        self.now += s


def test_probe_immediate_success(bench):
    clock = _Clock()
    responsive, attempts = bench._probe_tpu(
        180.0, run=lambda *a, **k: types.SimpleNamespace(returncode=0),
        monotonic=clock.monotonic, sleep=clock.sleep)
    assert responsive and attempts == 1
    assert clock.slept == []  # no backoff burned


def test_probe_deterministic_failure_falls_back_fast(bench):
    """Two non-zero exits end the probe immediately — a missing TPU
    runtime cannot heal, so the 180 s budget must not be burned."""
    clock = _Clock()
    responsive, attempts = bench._probe_tpu(
        180.0, run=lambda *a, **k: types.SimpleNamespace(returncode=1),
        monotonic=clock.monotonic, sleep=clock.sleep)
    assert not responsive and attempts == 2
    assert clock.now < 20.0  # one backoff at most, not the full budget


def test_probe_retries_timeouts_until_budget(bench):
    """Blocked backend init (tunnel flap) keeps retrying with backoff
    until the budget would be exceeded."""
    clock = _Clock()

    def run(cmd, timeout, **kw):
        clock.now += timeout  # the probe subprocess blocks to its timeout
        raise subprocess.TimeoutExpired(cmd, timeout)

    responsive, attempts = bench._probe_tpu(
        85.0, attempt_timeout=20.0, backoff=10.0,
        run=run, monotonic=clock.monotonic, sleep=clock.sleep)
    assert not responsive
    # attempts start at t=0,30,60 (20 s block + 10 s backoff); after the
    # t=60 attempt ends at 80, the next backoff would cross the 85 s
    # deadline -> stop after 3 tries
    assert attempts == 3
    assert clock.now <= 85.0


def test_probe_flap_then_recovery(bench):
    """A timeout followed by a clean exit is a recovered tunnel — the
    whole point of the persistent probe."""
    clock = _Clock()
    calls = {"n": 0}

    def run(cmd, timeout, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            clock.now += timeout
            raise subprocess.TimeoutExpired(cmd, timeout)
        return types.SimpleNamespace(returncode=0)

    responsive, attempts = bench._probe_tpu(
        180.0, run=run, monotonic=clock.monotonic, sleep=clock.sleep)
    assert responsive and attempts == 2
