"""Worker process for the REAL multi-process validation test.

Each process owns 2 virtual CPU devices; two processes form a 4-device
global mesh coordinated over jax.distributed (Gloo collectives — the CPU
stand-in for ICI/DCN). Runs the actual parallel training step with
host-local batch loading via parallel/multihost.py and prints a loss +
replicated-param checksum that must match across processes bit-for-bit.

Not a test module — spawned by tests/test_multihost_real.py:
    python mh_worker.py <process_id> <num_processes> <coordinator_port>
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
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from gan_class_transfer2_tpu.parallel import multihost

    # MUST precede any backend touch (see multihost.initialize docstring)
    idx = multihost.initialize(
        f"127.0.0.1:{port}", num_processes=n, process_id=pid
    )
    assert idx == pid

    import numpy as np

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.parallel import mesh as mesh_lib

    assert jax.process_count() == n
    assert jax.device_count() == 2 * n
    assert jax.local_device_count() == 2

    cfg = tiny_test_config(
        batch_size=8, mesh_data=2 * n, donate_state=False,
        pixel_size=8, max_size=16,
    )
    mesh = mesh_lib.make_mesh(cfg)
    state = mesh_lib.init_sharded_state(cfg, mesh, jax.random.PRNGKey(0))
    step = mesh_lib.make_parallel_train_step(cfg, mesh)

    # deterministic GLOBAL batch; each host materialises only its slice
    r = np.random.default_rng(0)
    global_batch = r.uniform(
        -1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)
    ).astype(np.float32)
    local_bs = multihost.host_local_batch_size(cfg.batch_size)
    local = global_batch[pid * local_bs : (pid + 1) * local_bs]
    batch = multihost.global_batch_from_host_local(
        local, mesh_lib.batch_sharding(mesh)
    )

    losses = []
    for i in range(3):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))

    # replicated leaves are fully addressable on every process — identical
    # updates on all hosts is exactly what the DP all-reduce guarantees
    kernel = np.asarray(jax.device_get(state.params["head"]["kernel"]))
    checksum = float(np.sum(np.abs(kernel)))
    print(
        f"RESULT pid={pid} coordinator={multihost.is_coordinator()} "
        f"losses={','.join(f'{x:.8f}' for x in losses)} "
        f"checksum={checksum:.10f}",
        flush=True,
    )

    # ---- multi-slice stage: each PROCESS is one slice -------------------
    # (slice=n, data=2, model=1): the slice axis crosses the process
    # boundary exactly like DCN crosses pod slices; per-slice reduction is
    # process-local, cross-slice partials ride the inter-process transport.
    # jax.devices() orders by process index, so reshape(n, 2, 1) puts each
    # process's 2 local devices in its own slice row.
    s_cfg = cfg.replace(mesh_slice=n, mesh_data=2, mesh_model=1)
    s_mesh = mesh_lib.make_mesh(s_cfg)
    assert s_mesh.shape == {"slice": n, "data": 2, "model": 1}
    local_dev_procs = {
        d.process_index for d in s_mesh.devices[pid].reshape(-1)
    }
    assert local_dev_procs == {pid}, (
        f"slice row {pid} must hold only this process's devices: "
        f"{local_dev_procs}"
    )
    s_state = mesh_lib.init_sharded_state(s_cfg, s_mesh, jax.random.PRNGKey(0))
    s_step = mesh_lib.make_parallel_train_step(s_cfg, s_mesh)
    s_local_bs = multihost.host_local_batch_size(s_cfg.batch_size)
    s_local = global_batch[pid * s_local_bs : (pid + 1) * s_local_bs]
    s_batch = multihost.global_batch_from_host_local(
        s_local, mesh_lib.batch_sharding(s_mesh)
    )
    s_losses = []
    for i in range(2):
        s_state, s_loss = s_step(s_state, s_batch, jax.random.PRNGKey(i))
        s_losses.append(float(s_loss))
    s_kernel = np.asarray(jax.device_get(s_state.params["head"]["kernel"]))
    print(
        f"SLICE pid={pid} losses={','.join(f'{x:.8f}' for x in s_losses)} "
        f"checksum={float(np.sum(np.abs(s_kernel))):.10f}",
        flush=True,
    )

    # ---- ZeRO-1 checkpoint stage: cross-process-sharded optimizer moments
    # must survive a save→restore round trip (host_complete allgather on
    # every process, coordinator-only write, shard re-placement on restore).
    shared = sys.argv[4] if len(sys.argv) > 4 else None
    if shared:
        from jax.experimental import multihost_utils

        from gan_class_transfer2_tpu.utils import checkpoint as ckpt_lib

        z_dir = os.path.join(shared, "zckpt")
        z_cfg = cfg.replace(zero1=True, mesh_data=2 * n, mesh_model=1,
                            checkpoint_dir=z_dir)
        z_mesh = mesh_lib.make_mesh(z_cfg)
        z_state = mesh_lib.init_sharded_state(z_cfg, z_mesh, jax.random.PRNGKey(0))
        z_step = mesh_lib.make_parallel_train_step(z_cfg, z_mesh)
        z_batch = multihost.global_batch_from_host_local(
            local, mesh_lib.batch_sharding(z_mesh)
        )
        z_state, _ = z_step(z_state, z_batch, jax.random.PRNGKey(0))
        import jax.tree_util as jtu

        n_sharded = sum(
            1
            for leaf in jtu.tree_leaves(z_state.opt_state)
            if isinstance(leaf, jax.Array)
            and not leaf.is_fully_addressable
            and not leaf.is_fully_replicated
        )
        assert n_sharded > 0, "ZeRO-1 produced no cross-process shards"
        host = ckpt_lib.host_complete(z_state)  # collective: BOTH processes
        if multihost.is_coordinator():
            ckpt_lib.save(z_dir, host, z_cfg)
        multihost_utils.sync_global_devices("zckpt written")
        restored = ckpt_lib.restore(z_dir, z_state)
        r_state, r_loss = z_step(restored, z_batch, jax.random.PRNGKey(1))
        r_kernel = np.asarray(jax.device_get(r_state.params["head"]["kernel"]))
        print(
            f"ZERO1CKPT pid={pid} sharded_leaves={n_sharded} "
            f"loss={float(r_loss):.8f} "
            f"checksum={float(np.sum(np.abs(r_kernel))):.10f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
