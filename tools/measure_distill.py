"""Measure progressive sampler distillation: quality at each halved stride.

NEXT.md claims distillation (train/distill.py) makes the ``sample_stride``
trade *free* — "k rounds -> sample_stride 2^k at matched quality". This tool
measures that claim end-to-end on one chip:

  1. train a diffusion teacher on the synthetic circles corpus (the same
     corpus the FID campaign used, tools/measure_fid_steps.py);
  2. score the TEACHER's samples at mechanical strides 1/2/4/8
     (cfg.sample_stride alone, no distillation — the quality the stride
     trade costs);
  3. run progressive distillation round by round and score each student at
     its stride (the quality distillation buys back);
  4. record sampler throughput at each stride.

KID is the primary score (unbiased — floor ~0 at any eval-set size,
docs/FID.md); FID rides along. Eval sets are held-out draws (seed 1000),
disjoint from the training pool (seed 0). One JSON line per measurement,
one summary line at the end.

Usage:
  python tools/measure_distill.py                      # TPU (default platform)
  python tools/measure_distill.py --platform cpu --train-steps 50 \
      --distill-steps 10 --eval-n 32                   # smoke
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=3000,
                    help="teacher optimizer steps (3000 = the measured "
                    "99.5%%-KID-closure point of the FID campaign)")
    ap.add_argument("--distill-steps", type=int, default=1000,
                    help="optimizer steps per halving round")
    ap.add_argument("--target-stride", type=int, default=8)
    ap.add_argument("--steps", type=int, default=32, help="diffusion T")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--learning-rate", type=float, default=2e-4)
    ap.add_argument("--eval-n", type=int, default=256,
                    help="samples per quality score (and held-out set size)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--flagship", action="store_true",
                    help="the reference operating point (train.py:17,24): "
                    "256², T=200, full 41.7M U-Net widths, bf16 + fused "
                    "diffusion — overrides --size/--steps and the widths")
    ap.add_argument("--eval-batch", type=int, default=0,
                    help="sampler batch for scoring (0 = eval-n in one "
                    "launch; flagship 256² needs chunks to fit HBM)")
    args = ap.parse_args()

    import jax

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.data import synthetic
    from gan_class_transfer2_tpu.data.device_augment import HBMDataset
    from gan_class_transfer2_tpu.sample import sampler
    from gan_class_transfer2_tpu.train import distill, trainer
    from gan_class_transfer2_tpu.utils import benchmark, metrics

    if args.flagship:
        on_tpu = jax.default_backend() == "tpu"
        cfg = Config(
            size=256, pixel_size=128, max_size=512, octaves=6, steps=200,
            batch_size=args.batch_size,
            learning_rate=args.learning_rate, warm_up=200, ema_decay=0.99,
            compute_dtype="bfloat16" if on_tpu else "float32",
            fused_diffusion=on_tpu, conv_impl="lax", mesh_data=1,
            donate_state=False, checkpoint_dir=None,
        ).validate()
    else:
        cfg = Config(
            size=args.size, pixel_size=32, max_size=64, octaves=3,
            steps=args.steps, batch_size=args.batch_size,
            learning_rate=args.learning_rate, warm_up=200, ema_decay=0.99,
            compute_dtype="float32", fused_diffusion=False, mesh_data=1,
            donate_state=False, checkpoint_dir=None,
        ).validate()

    # training pool (seed 0) and held-out eval set (seed 1000) — disjoint.
    # HBM-resident draws (not device_iterator): on the axon tunnel every
    # host→device batch transfer leaks its byte size in host RSS (~50
    # MB/step at 256²/b64 — tools/probe_transfer_leak.py), which OOM-killed
    # the first flagship run; the pool gather ships only int32 indices.
    # Same EpochIndexStream(seed=0), so the draw order is unchanged.
    train_pool = synthetic.circles(512, cfg.size, seed=0)
    eval_set = synthetic.circles(args.eval_n, cfg.size, seed=1000)
    data_iter = iter(
        HBMDataset(train_pool, cfg.size, cfg.batch_size, seed=0))
    extractor = metrics.get_extractor("auto")
    fixed_init = jnp.asarray(np.random.default_rng(42).normal(
        size=(args.eval_n, cfg.size, cfg.size, 3)).astype(np.float32))

    def emit(obj):
        print(json.dumps(obj), flush=True)

    def score(params, stride, tag):
        """KID/FID of args.eval_n fresh samples at the given stride."""
        c = cfg.replace(sample_stride=stride)
        fn = jax.jit(lambda p, b: sampler.sample(c, p, b).images)
        eb = args.eval_batch or args.eval_n
        imgs = np.concatenate([
            np.asarray(fn(params, fixed_init[i : i + eb]))
            for i in range(0, args.eval_n, eb)
        ])
        float(imgs.sum())  # sync (axon rule: fetch a value)
        both = metrics.fid_and_kid(imgs, eval_set, extractor=extractor)
        out = {
            "which": tag, "sample_stride": stride,
            "sampler_calls": len(sampler.sample_timesteps(c)),
            "kid": round(both["kid"], 4),
            "fid": round(both["fid"], 2),
        }
        emit(out)
        return out

    # noise floor of the metric pair on this corpus: held-out vs a second
    # disjoint draw (what a perfect sampler would score)
    floor_draw = synthetic.circles(args.eval_n, cfg.size, seed=2000)
    floor = metrics.fid_and_kid(floor_draw, eval_set, extractor=extractor)
    emit({
        "which": "floor_same_class",
        "kid": round(floor["kid"], 4),
        "fid": round(floor["fid"], 2),
        "eval_n": args.eval_n,
    })

    # ---- 1. teacher training -------------------------------------------
    t0 = time.time()
    state = trainer.init_state(cfg, jax.random.PRNGKey(cfg.seed))
    step_fn = trainer.make_train_step(cfg)
    rng = jax.random.PRNGKey(cfg.seed + 1)
    sync_every = cfg.host_sync_every or args.train_steps
    for i in range(args.train_steps):
        state, loss = step_fn(state, next(data_iter), rng)
        if (i + 1) % sync_every == 0:
            # bounded in-flight dispatch: an unsynced 3000-step loop at
            # 256²/b64 pinned 130 GB of host batch buffers (OOM-killed, r5)
            float(loss)
    loss = float(loss)
    teacher = (state.ema_params if state.ema_params is not None
               else state.params)
    emit({"which": "teacher_trained", "steps": args.train_steps,
          "final_loss": round(loss, 5),
          "wall_s": round(time.time() - t0, 1)})

    strides = []
    s = 2
    while s <= args.target_stride:
        strides.append(s)
        s *= 2

    # ---- 2. mechanical stride baseline (no distillation) ----------------
    results = {"mechanical": {}, "distilled": {}}
    results["mechanical"][1] = score(teacher, 1, "teacher_stride_1")
    for s in strides:
        results["mechanical"][s] = score(teacher, s, "mechanical")

    # ---- 3. progressive distillation, scored per round ------------------
    params = teacher
    rng = jax.random.PRNGKey(cfg.seed + 101)
    for s in strides:
        rng, sub = jax.random.split(rng)
        t1 = time.time()
        params, dloss = distill.distill_round(
            cfg, params, data_iter, s, args.distill_steps, sub,
            log=lambda *_: None)
        emit({"which": "distill_round", "stride": s,
              "distill_steps": args.distill_steps,
              "final_loss": round(float(dloss), 6),
              "wall_s": round(time.time() - t1, 1)})
        results["distilled"][s] = score(params, s, "distilled")

    # ---- 4. sampler throughput per stride --------------------------------
    ips = {}
    for s in [1] + strides:
        b = benchmark.run_sampler_benchmark(
            cfg.replace(sample_stride=s), batch=args.batch_size, iters=3)
        ips[s] = b["sampler_images_per_sec"]
        emit({"which": "sampler_throughput", "sample_stride": s, **b})

    # ---- summary ---------------------------------------------------------
    final = args.target_stride
    emit({
        "metric": "distill_quality_vs_mechanical_stride",
        "corpus": f"synthetic circles {cfg.size}x{cfg.size}, T={cfg.steps}",
        "teacher_kid_stride_1": results["mechanical"][1]["kid"],
        "mechanical_kid": {s: results["mechanical"][s]["kid"] for s in strides},
        "distilled_kid": {s: results["distilled"][s]["kid"] for s in strides},
        "sampler_images_per_sec": ips,
        "speedup_at_target": round(ips[final] / ips[1], 2),
        "eval": "held-out synthetic draws (seed 1000), disjoint from the "
                "training pool (seed 0)",
    })


if __name__ == "__main__":
    main()
