"""Measure the (size × batch) training-throughput grid on the chip.

Feeds parallel/planner.MEASURED_GRID: per-size batch ladders of real
img/s/chip at the TPU-native operating point (bf16, fused diffusion, lax
convs, 32 MiB scoped VMEM — bench.py's configuration). One JSON line per
point; paste the result into the planner's grid when it changes.

    python tools/bench_grid.py                       # full default grid
    python tools/bench_grid.py --grid 256:16,256:256 # chosen points
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--xla_tpu_scoped_vmem_limit_kib" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=32768"
    ).strip()

DEFAULT_GRID = ",".join(
    [f"64:{b}" for b in (32, 64, 128, 256, 512)]
    + [f"128:{b}" for b in (32, 64, 128, 256)]
    + [f"256:{b}" for b in (16, 32, 64, 128, 256)]
    + [f"512:{b}" for b in (8, 16, 32, 64)]
    + [f"1024:{b}" for b in (8, 16)]
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default=DEFAULT_GRID)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    import jax

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.utils.benchmark import run_benchmark

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    backend = jax.default_backend()
    by_size = {}
    for spec in args.grid.split(","):
        size, batch = (int(v) for v in spec.split(":"))
        cfg = Config(
            size=size, octaves=4 if size == 64 else 6, batch_size=batch,
            compute_dtype="bfloat16", conv_impl="lax",
            fused_diffusion=backend == "tpu",
            warm_up=0, checkpoint_dir=None, donate_state=True,
        )
        try:
            result = run_benchmark(cfg, steps=args.steps, warmup=args.warmup)
            ips = round(result.value, 1)
        except Exception as e:  # OOM etc. — record and continue
            print(json.dumps({"size": size, "batch": batch,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        by_size.setdefault(size, []).append((batch, ips))
        print(json.dumps({"size": size, "batch": batch, "ips": ips,
                          "backend": backend}), flush=True)

    print("MEASURED_GRID = {")
    for size in sorted(by_size):
        pts = ", ".join(f"({b}, {v})" for b, v in sorted(by_size[size]))
        if len(by_size[size]) == 1:
            pts += ","  # keep a 1-point ladder a tuple-of-tuples
        print(f"    {size}: ({pts}),")
    print("}")


if __name__ == "__main__":
    main()
