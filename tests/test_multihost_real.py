"""REAL multi-process validation of parallel/multihost.py (NEXT.md scale
item): two OS processes × 2 virtual CPU devices form a 4-device global
mesh over jax.distributed (Gloo collectives standing in for ICI/DCN), run
the actual parallel train step with host-local batch loading, and must
agree bit-for-bit on losses and the replicated parameters.

This is the no-cluster analogue of a 2-host pod: per-process device
visibility, cross-process gradient all-reduce, and
make_array_from_process_local_data assembly are all exercised for real —
only the transport differs from TPU hardware.
"""

import os
import re
import socket
import subprocess
import sys

import pytest



_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_agrees(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own platform config
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_TESTS_DIR, "mh_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=_TESTS_DIR,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d+) coordinator=(\w+) losses=(\S+) checksum=(\S+)",
            out,
        )
        assert m, f"no RESULT line in:\n{out[-3000:]}"
        results[int(m.group(1))] = (m.group(2), m.group(3), m.group(4))

    assert set(results) == {0, 1}
    # exactly one coordinator (checkpoint/log writer election)
    assert results[0][0] == "True" and results[1][0] == "False"
    # cross-host agreement: the DP all-reduce keeps losses and replicated
    # params identical on every process
    assert results[0][1] == results[1][1], results
    assert results[0][2] == results[1][2], results
    # and training actually progressed (3 distinct finite losses)
    losses = [float(x) for x in results[0][1].split(",")]
    assert len(set(losses)) == 3

    # multi-slice stage: slice axis across the process boundary (the DCN
    # analogue) must also agree on losses and replicated params
    slice_results = {}
    for out in outs:
        m = re.search(r"SLICE pid=(\d+) losses=(\S+) checksum=(\S+)", out)
        assert m, f"no SLICE line in:\n{out[-3000:]}"
        slice_results[int(m.group(1))] = (m.group(2), m.group(3))
    assert slice_results[0] == slice_results[1], slice_results

    # ZeRO-1 checkpoint stage: cross-process-sharded optimizer moments
    # survive save (host_complete allgather + coordinator-only write) →
    # restore (shard re-placement) → one more training step, with both
    # processes agreeing bit-for-bit
    z_results = {}
    for out in outs:
        m = re.search(
            r"ZERO1CKPT pid=(\d+) sharded_leaves=(\d+) loss=(\S+) "
            r"checksum=(\S+)",
            out,
        )
        assert m, f"no ZERO1CKPT line in:\n{out[-3000:]}"
        z_results[int(m.group(1))] = m.group(2, 3, 4)
    assert int(z_results[0][0]) > 0
    assert z_results[0] == z_results[1], z_results


@pytest.mark.parametrize("ckpt_mode", ["sync", "async"])
def test_two_process_cli_train_writes_once(tmp_path, ckpt_mode):
    """The PRODUCT multi-host path (VERDICT r2 next #2): the real
    ``cli.py train`` command runs as a 2-process jax.distributed job via
    --coordinator/--num-processes/--process-id, both processes agree on the
    training losses, and exactly the coordinator writes checkpoints/logs.
    Parametrized over sync/async checkpointing: on a pod the async save's
    host_complete collectives run on EVERY process before the
    coordinator-only background write, and the fit-end flush must make the
    step dir durable before the command returns."""
    import numpy as np
    from PIL import Image

    data = tmp_path / "data"
    data.mkdir()
    r = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(
            r.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        ).save(data / f"{i}.png")

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_TESTS_DIR, "mh_cli_worker.py"),
             str(pid), "2", str(port), str(data), str(tmp_path), ckpt_mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=_TESTS_DIR,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        m = re.search(
            r"CLIRESULT pid=(\d+) coordinator=(\w+) wrote_ckpt=(\w+) "
            r"wrote_logs=(\w+) host_extra=(\w+) other_extra=(\w+)",
            out,
        )
        assert m, f"no CLIRESULT line in:\n{out[-3000:]}"
        results[int(m.group(1))] = m.group(2, 3, 4, 5, 6)

    # exactly one coordinator; only it writes state/logs, but EVERY process
    # persists its own data-position sidecar (and only its own)
    assert results[0] == ("True", "True", "True", "True", "False")
    assert results[1] == ("False", "False", "False", "True", "False")

    # DP all-reduce keeps the printed epoch losses identical across hosts
    losses = []
    for out in outs:
        m = re.search(r"epoch 0: loss=([0-9.]+)", out)
        assert m, f"no epoch loss line in:\n{out[-3000:]}"
        losses.append(m.group(1))
    assert losses[0] == losses[1], losses
