"""Operating-point sweep on TPU: batch sizes and scoped-VMEM limits.

The remaining MFU gap lives inside XLA's conv emitters (NEXT.md r2
findings); two cheap levers that influence emitter tiling are batch size
(b128 was the r1 winner; b192/b256 untested WITHOUT remat) and the scoped
VMEM limit XLA gives each op's working set.

Usage: python tools/bench_sweep.py "<batch>[:vmem_kib]" ...
e.g.   python tools/bench_sweep.py 128 192 256 128:32768 128:65536
Each spec re-execs in a subprocess (XLA flags are process-global).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(batch: int, vmem_kib: int) -> None:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    cfg = Config(compute_dtype="bfloat16", batch_size=batch, conv_impl="lax",
                 fused_diffusion=True, warm_up=0, checkpoint_dir=None,
                 donate_state=True)
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer_lib.make_train_step(cfg)
    r = np.random.default_rng(0)
    batch_x = jnp.asarray(
        r.uniform(-1, 1, (batch, 256, 256, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    state, loss = step(state, batch_x, rng)
    for _ in range(2):
        state, loss = step(state, batch_x, rng)
    float(loss)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, loss = step(state, batch_x, rng)
    float(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "batch": batch, "vmem_kib": vmem_kib,
        "img_per_sec": round(batch * n / dt, 1),
        "step_ms": round(dt / n * 1000, 2),
    }), flush=True)


def main():
    if os.environ.get("_BENCH_SWEEP_CHILD"):
        spec = os.environ["_BENCH_SWEEP_CHILD"]
        b, _, v = spec.partition(":")
        return run_one(int(b), int(v) if v else 0)
    for spec in sys.argv[1:]:
        env = dict(os.environ)
        env["_BENCH_SWEEP_CHILD"] = spec
        b, _, v = spec.partition(":")
        if v:
            env["LIBTPU_INIT_ARGS"] = (
                env.get("LIBTPU_INIT_ARGS", "")
                + f" --xla_tpu_scoped_vmem_limit_kib={v}"
            ).strip()
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.DEVNULL, text=True)
        sys.stdout.write(proc.stdout or f'{{"spec": "{spec}", "rc": {proc.returncode}}}\n')
        sys.stdout.flush()


if __name__ == "__main__":
    main()
