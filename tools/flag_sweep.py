"""Bounded LIBTPU/XLA flag exploration at the flagship operating point.

Each candidate flag set runs in a SUBPROCESS (LIBTPU_INIT_ARGS is read at
backend init) that times the flagship train step for a few steps. Unknown
flags fail the remote compile quickly and are reported as rejected.
NEXT.md "Performance (next)": this is the last unexplored lever on the
~20% conv-emitter MFU gap.

Usage: python tools/flag_sweep.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = "--xla_tpu_scoped_vmem_limit_kib=32768"

CANDIDATES = [
    ("control", ""),
    ("dot_strength_red_off", "--xla_tpu_enable_dot_strength_reduction=false"),
    ("mem_bound_loop_opt", "--xla_tpu_memory_bound_loop_optimizer_options=enabled:true"),
    ("rwb_fusion_off", "--xla_tpu_rwb_fusion=false"),
    ("licm_inflation_2", "--xla_tpu_licm_size_inflation_ratio=2"),
    ("vmem_dmas", "--xla_tpu_enable_vmem_to_vmem_dmas=true"),
    ("async_copy_bw_2", "--xla_tpu_async_copy_bandwidth_scaling_factor=2"),
]

CHILD = r"""
import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from gan_class_transfer2_tpu.config import Config
from gan_class_transfer2_tpu.parallel import mesh as mesh_lib
cfg = Config(compute_dtype="bfloat16", batch_size=256, size=256,
             pixel_size=128, max_size=512, donate_state=True,
             fused_diffusion=True)
mesh = mesh_lib.make_mesh(cfg)
state = mesh_lib.init_sharded_state(cfg, mesh, jax.random.PRNGKey(0))
step = mesh_lib.make_parallel_train_step(cfg, mesh)
r = np.random.default_rng(0)
batch = jax.device_put(jnp.asarray(r.uniform(-1,1,(256,256,256,3)).astype(np.float32)),
                       mesh_lib.batch_sharding(mesh))
rng = jax.random.PRNGKey(1)
for _ in range(3):
    state, loss = step(state, batch, rng)
print("warm loss", float(loss), flush=True)
t0 = time.perf_counter()
for _ in range(15):
    state, loss = step(state, batch, rng)
float(loss)
dt = time.perf_counter() - t0
print("RESULT", 15*256/dt)
"""


def main():
    results = {}
    for name, flag in CANDIDATES:
        env = dict(os.environ)
        env["LIBTPU_INIT_ARGS"] = (BASE + " " + flag).strip()
        # flag changes invalidate the persistent compile cache keying? keep
        # the cache off for honesty (flags may not be in the cache key)
        env["JAX_COMPILATION_CACHE_DIR"] = ""
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD.format(repo=REPO)],
                env=env, capture_output=True, text=True, timeout=600,
            )
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
            print(f"{name}: timeout", flush=True)
            continue
        out = proc.stdout
        if proc.returncode != 0 or "RESULT" not in out:
            tail = (proc.stdout + proc.stderr)[-300:].replace("\n", " ")
            results[name] = f"rejected ({tail[-120:]})"
            print(f"{name}: REJECTED/FAILED", flush=True)
            continue
        ips = float(out.rsplit("RESULT", 1)[1].strip().split()[0])
        results[name] = round(ips, 1)
        print(f"{name}: {ips:.1f} img/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
