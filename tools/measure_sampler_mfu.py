"""Attribute the sampler's MFU gap vs the train step (VERDICT r4 #5).

bench.py r2-r5 measures sampler MFU ≈ 0.68 at b32 against the train
step's 0.81 at b256. Two hypotheses from the r4 verdict: small-batch
conv-emitter efficiency vs host gaps between jitted segments. This tool
separates them with three measurements on the chip, mirroring the r2
train-step roofline methodology:

1. **Batch ladder** — run_sampler_benchmark at b16..b256. If MFU climbs
   with batch the gap is launch-width economics (same shape as the
   measured TRAIN ladder: 0.53 MFU at b32 → 0.81 at b256), not sampler
   overhead; the fix is batching requests/epochs, already what the
   serving batcher does.
2. **Forward-only anchor** — a jitted denoiser forward at the same batch,
   timed alone. sampler_step_ms / (T × fwd_ms) isolates what the scan's
   elementwise update algebra and carry plumbing add on top of the T
   denoiser calls (reference train.py:439-496 runs these as 401 eager
   dispatches instead).
3. **Device-plane trace** (optional, --trace) — device busy time vs wall
   per sampler launch: any residual is host gaps between launches.

Run on the TPU:  python tools/measure_sampler_mfu.py [--trace]
Each row prints as one JSON line; paste the table into BASELINE_MEASURED.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--xla_tpu_scoped_vmem_limit_kib" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=32768"
    ).strip()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,64,128,256")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace", action="store_true",
                    help="capture a device-plane trace at --trace-batch")
    ap.add_argument("--trace-batch", type=int, default=32)
    ap.add_argument("--trace-dir", default="/tmp/sampler_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.models import unet
    from gan_class_transfer2_tpu.sample import sampler
    from gan_class_transfer2_tpu.train import trainer as trainer_lib
    from gan_class_transfer2_tpu.utils import profiler
    from gan_class_transfer2_tpu.utils.benchmark import (
        _peak_tflops, model_flops_per_image, run_sampler_benchmark,
    )

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = Config(
        compute_dtype="bfloat16", batch_size=256, size=256,
        conv_impl="lax", fused_diffusion=jax.default_backend() == "tpu",
        warm_up=0, checkpoint_dir=None,
    )
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(cfg.seed))
    peak = _peak_tflops(cfg.compute_dtype)
    fwd_flops = model_flops_per_image(cfg)
    n_calls = len(sampler.sample_timesteps(cfg))

    # ---- 1. sampler batch ladder ----
    for b in (int(v) for v in args.batches.split(",")):
        row = run_sampler_benchmark(cfg, batch=b, iters=args.iters)
        row["kind"] = "sampler_ladder"
        print(json.dumps(row), flush=True)

    # ---- 2. forward-only anchor at each ladder batch ----
    # the same denoiser forward the scan makes, launched bare — its MFU is
    # the conv-emitter ceiling at that batch; the sampler can't beat it
    r = np.random.default_rng(0)
    fwd = jax.jit(lambda p, x: unet.unet_apply(cfg, p, x))
    for b in (int(v) for v in args.batches.split(",")):
        x = jnp.asarray(r.normal(size=(b, cfg.size, cfg.size, 3)).astype(np.float32))
        y = fwd(state.params, x)
        float(jnp.sum(y))  # compile + sync (axon rule: value-fetch)
        iters = max(args.iters * 8, 16)
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fwd(state.params, x)
        float(jnp.sum(y))
        dt = time.perf_counter() - t0
        ms = dt / iters * 1000
        tflops = b * fwd_flops / (dt / iters) / 1e12
        print(json.dumps({
            "kind": "forward_only",
            "batch": b,
            "fwd_ms": round(ms, 3),
            "fwd_tflops": round(tflops, 2),
            "fwd_mfu": round(tflops / peak, 4) if peak else None,
            "scan_equivalent_ms": round(ms * n_calls, 1),
        }), flush=True)

    # ---- 3. optional device-plane trace at one batch ----
    if args.trace:
        b = args.trace_batch
        init = jnp.asarray(
            r.normal(size=(b, cfg.size, cfg.size, 3)).astype(np.float32))
        fn = jax.jit(lambda p, x: sampler.sample(
            cfg, p, x, snapshots=False).images)
        imgs = fn(state.params, init)
        float(jnp.sum(imgs))
        with profiler.trace(args.trace_dir):
            t0 = time.perf_counter()
            imgs = fn(state.params, init)
            float(jnp.sum(imgs))
            wall_ms = (time.perf_counter() - t0) * 1000
        ops = profiler.parse_xplane_device_ops(args.trace_dir, top=12)
        busy = sum(o["ms"] for o in ops) if ops else None
        print(json.dumps({
            "kind": "trace",
            "batch": b,
            "wall_ms": round(wall_ms, 1),
            "device_op_ms_top12_sum": round(busy, 1) if busy else None,
            "trace_dir": args.trace_dir,
            "top_ops": ops,
        }), flush=True)


if __name__ == "__main__":
    main()
