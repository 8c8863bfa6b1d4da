"""Validate `gct2 plan`'s throughput model against the real chip.

The planner predicts per-chip img/s by interpolating the measured
(size × batch) grid (parallel/planner.MEASURED_GRID) in log2(size) ×
log2(batch), with the sublane batch-padding model on top. This tool
measures REAL training throughput at operating points that are NOT grid
rows (interpolation, not reproduction) and prints predicted-vs-measured
per point, so the error bar is a measurement rather than a promise.

NOTE: keep --points off the grid. A point that later gets folded into
MEASURED_GRID reproduces exactly by construction and validates nothing —
pick fresh batches between the measured rungs.

Run on the TPU (the grid is chip numbers):
    python tools/validate_planner.py
    python tools/validate_planner.py --steps 12 --points 512:48,128:96
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# same operating environment as bench.py's anchors (32 MiB scoped VMEM)
if "--xla_tpu_scoped_vmem_limit_kib" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=32768"
    ).strip()

# held-out defaults: batches BETWEEN the grid's measured rungs at each size
# (the r4 validation campaign's points — 64:96 etc. — were folded into the
# grid afterwards, so they no longer validate anything)
DEFAULT_POINTS = "64:192,128:96,256:224,512:48,1024:12"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default=DEFAULT_POINTS,
                    help="comma list of size:batch")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    import jax

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.parallel import planner
    from gan_class_transfer2_tpu.utils.benchmark import run_benchmark

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    backend = jax.default_backend()
    rows = []
    for spec in args.points.split(","):
        size, batch = (int(v) for v in spec.split(":"))
        octaves = 4 if size == 64 else 6
        cfg = Config(
            size=size, octaves=octaves, batch_size=batch,
            compute_dtype="bfloat16", conv_impl="lax",
            fused_diffusion=backend == "tpu",
            warm_up=0, checkpoint_dir=None, donate_state=True,
        )
        pred = planner.predict_ips_per_chip(cfg, batch)
        result = run_benchmark(cfg, steps=args.steps, warmup=args.warmup)
        measured = result.value
        rows.append({
            "size": size, "batch": batch,
            "predicted_ips": round(pred, 1),
            "measured_ips": round(measured, 1),
            "error": round(pred / measured - 1, 4),
            "backend": backend,
        })
        print(json.dumps(rows[-1]), flush=True)

    worst = max(abs(r["error"]) for r in rows)
    print(json.dumps({
        "summary": "planner throughput validation",
        "points": len(rows),
        "worst_abs_error": round(worst, 4),
        "within_20pct": bool(worst <= 0.20),
    }))


if __name__ == "__main__":
    main()
