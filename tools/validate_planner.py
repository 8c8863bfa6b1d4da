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


def _measure_gan_step(cfg, steps: int, warmup: int) -> float:
    """Real cycle-GAN img/s per class per chip (train/gan.py step)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.train import gan as gan_lib

    rng = jax.random.PRNGKey(cfg.seed)
    state = gan_lib.init_gan_state(cfg, rng)
    step = gan_lib.make_gan_train_step(cfg)
    r = np.random.default_rng(0)
    shape = (cfg.batch_size, cfg.size, cfg.size, 3)
    a = jnp.asarray(r.uniform(-1, 1, shape).astype(np.float32))
    b = jnp.asarray(r.uniform(-1, 1, shape).astype(np.float32))
    steps = max(1, steps)
    for _ in range(warmup):
        state, m = step(state, a, b, rng)
    if warmup > 0:
        float(m["g_loss"])  # value-fetch sync (axon rule)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, a, b, rng)
    float(m["g_loss"])
    return steps * cfg.batch_size / (time.perf_counter() - t0)


def validate_gan(args):
    """Predicted-vs-measured for the GAN step-cost model (planner.
    GAN_STEP_COST, anchored at 256² b16) at HELD-OUT operating points —
    off-anchor batches and the lever configs' elision behavior."""
    import jax

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.parallel import planner

    backend = jax.default_backend()
    rows = []
    # (size, per-class batch, cycle_weight, identity_weight): batches sit
    # between grid rungs; the weight pairs exercise all three cost tiers
    points = [
        (256, 24, 10.0, 5.0),
        (256, 24, 10.0, 0.0),
        (256, 24, 0.0, 0.0),
        (128, 48, 10.0, 5.0),
    ]
    for size, batch, cyc, idt in points:
        cfg = Config(
            size=size, octaves=6, batch_size=batch,
            compute_dtype="bfloat16", conv_impl="lax",
            fused_diffusion=backend == "tpu",
            cycle_weight=cyc, identity_weight=idt,
            warm_up=0, checkpoint_dir=None,
        )
        ratio = planner.gan_step_cost_ratio(cfg)
        pred = planner.predict_ips_per_chip(cfg, batch) / ratio
        measured = _measure_gan_step(cfg, args.steps, args.warmup)
        rows.append({
            "size": size, "batch_per_class": batch,
            "cycle": cyc > 0, "identity": idt > 0,
            "cost_ratio": round(ratio, 3),
            "predicted_ips_class": round(pred, 1),
            "measured_ips_class": round(measured, 1),
            "error": round(pred / measured - 1, 4),
            "backend": backend,
        })
        print(json.dumps(rows[-1]), flush=True)
    worst = max(abs(r["error"]) for r in rows)
    print(json.dumps({
        "summary": "planner GAN step-cost validation",
        "points": len(rows),
        "worst_abs_error": round(worst, 4),
        "within_25pct": bool(worst <= 0.25),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default=DEFAULT_POINTS,
                    help="comma list of size:batch")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--gan", action="store_true",
                    help="validate the GAN step-cost model instead")
    args = ap.parse_args()

    if args.gan:
        return validate_gan(args)

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
