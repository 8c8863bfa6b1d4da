"""Sampler throughput across mesh sizes (VERDICT r2 next #3).

Two modes:
  --virtual  : force CPU with 8 virtual devices and sweep the data mesh
               1/2/4/8 at a tiny config — validates that the data-sharded
               sampler program compiles, executes, and SCALES (correctness
               + scaling shape; CPU timings are not hardware numbers).
  (default)  : real backend, single chip — the b32/b64 operating points for
               BASELINE_MEASURED.md.

Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    from gan_class_transfer2_tpu.config import Config, tiny_test_config
    from gan_class_transfer2_tpu.parallel import mesh as mesh_lib
    from gan_class_transfer2_tpu.utils.benchmark import run_sampler_benchmark

    if args.virtual:
        cfg = tiny_test_config(size=32, pixel_size=8, max_size=16, octaves=3,
                               steps=20)
        for n in (1, 2, 4, 8):
            mesh = mesh_lib.make_mesh(devices=jax.devices()[:n], data=n, model=1)
            out = run_sampler_benchmark(cfg, batch=16, iters=args.iters, mesh=mesh)
            print(json.dumps({"mode": "virtual-cpu", **out}), flush=True)
        return 0

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cfg = Config(compute_dtype="bfloat16", fused_diffusion=False,
                 checkpoint_dir=None)
    mesh = mesh_lib.make_mesh(cfg)
    for batch in (32, 64):
        out = run_sampler_benchmark(cfg, batch=batch, iters=args.iters, mesh=mesh)
        print(json.dumps({"mode": jax.default_backend(), **out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
