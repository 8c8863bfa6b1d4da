"""Validate `gct2 plan`'s throughput model against the real chip.

The planner predicts per-chip img/s by interpolating measured anchors
(parallel/planner.MEASURED_ANCHORS) and scaling by the batch-efficiency
curve. Its stated error bar is ±20% first-order. This tool measures REAL
training throughput at operating points the model was NOT fitted on
(different batch than every anchor at that size) and prints
predicted-vs-measured per point, so the error bar is a measurement rather
than a promise.

Run on the TPU (the anchors are chip numbers):
    python tools/validate_planner.py
    python tools/validate_planner.py --steps 12 --points 512:32,128:64,64:128
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

# held-out defaults: at each size, a batch NO anchor used (anchors: 64²/b512,
# 128²/b256, 256²/b256+the b16..b256 ladder, 512²/b64, 1024²/b16)
DEFAULT_POINTS = "512:32,128:64,64:128"


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
