"""Worker process driving the REAL ``cli.py train`` command in a 2-process
jax.distributed job (VERDICT r2 next #2: multi-host as product, not library).

Each process owns 2 virtual CPU devices; the CLI's --coordinator flags wire
multihost.initialize before any backend touch, the mesh spans all 4 global
devices, the input files shard per host, and only process 0 may write
checkpoints/logs (enforced here by giving each process its OWN output dirs
and asserting the non-coordinator's stay empty).

Not a test module — spawned by tests/test_multihost_real.py:
    python mh_cli_worker.py <pid> <nproc> <port> <data_dir> <out_dir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    ).strip()
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    pid, n, port, data_dir, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5],
    )
    # optional 6th arg: exercise async checkpointing on the pod path (the
    # risky interaction: host_complete's collectives run on EVERY process
    # before the coordinator-only background save; flush at fit end)
    ckpt_async = len(sys.argv) > 6 and sys.argv[6] == "async"

    from gan_class_transfer2_tpu import cli

    rc = cli.main([
        "train",
        "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", str(n), "--process-id", str(pid),
        "--dataset-pattern", os.path.join(data_dir, "*.png"),
        "--size", "16", "--pixel-size", "4", "--max-size", "8",
        "--octaves", "2", "--steps", "4", "--batch-size", "8",
        "--steps-per-epoch", "3", "--epochs", "1", "--warm-up", "2",
        "--test-step", "2", "--fused-diffusion", "false",
        "--native-loader", "false", "--mesh-data", str(2 * n),
        "--log-dir", os.path.join(out_dir, f"p{pid}", "logs"),
        "--checkpoint-dir", os.path.join(out_dir, f"p{pid}", "ckpt"),
        "--checkpoint-every", "3",
        "--checkpoint-async", "true" if ckpt_async else "false",
    ])
    assert rc == 0, rc

    from gan_class_transfer2_tpu.parallel import multihost

    ckpt_dir = os.path.join(out_dir, f"p{pid}", "ckpt")
    log_dir = os.path.join(out_dir, f"p{pid}", "logs")
    entries = os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else []
    # step DIRECTORIES (orbax state) are coordinator-only; the per-host
    # data-position sidecar is written by EVERY process (its own file)
    wrote_ckpt = any(
        e.startswith("step_") and os.path.isdir(os.path.join(ckpt_dir, e))
        for e in entries
    )
    host_extra = any(e.endswith(f".extra.host{pid}.json") for e in entries)
    other_extra = any(
        ".extra.host" in e and f".extra.host{pid}." not in e for e in entries
    )
    wrote_logs = os.path.isdir(log_dir) and any(os.scandir(log_dir))
    print(
        f"CLIRESULT pid={pid} coordinator={multihost.is_coordinator()} "
        f"wrote_ckpt={wrote_ckpt} wrote_logs={wrote_logs} "
        f"host_extra={host_extra} other_extra={other_extra}",
        flush=True,
    )


if __name__ == "__main__":
    main()
