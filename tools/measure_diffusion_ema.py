"""Measure what weight-EMA buys DIFFUSION sample quality.

``Config.ema_decay`` exists as a TPU addition (the reference has no EMA —
train.py:498-523 trains and samples one weight set), and the GAN-side FID
campaign measured EMA as a tie there (BASELINE_MEASURED.md r3b,
ema 0.999 ≈ base). Diffusion is the open case: EMA is standard practice in
DDPM pipelines, so the framework should know — on ITS workload — whether
sampling from the averaged weights beats the raw ones, and at which decay.

Design: EMA is a pure observer of the training trajectory (it never feeds
back into updates), so ONE training run scores every variant — the raw
params plus an externally-maintained EMA tree per decay — at each
checkpoint. KID is primary (unbiased, floor ~0; docs/FID.md), FID rides
along. Held-out eval draws (seed 1000) are disjoint from the training pool
(seed 0); the synthetic circles corpus matches the distillation/FID
campaigns so numbers compare across tools.

Usage:
  python tools/measure_diffusion_ema.py                   # TPU, 3000 steps
  python tools/measure_diffusion_ema.py --platform cpu \
      --train-steps 40 --check-every 20 --eval-n 32       # smoke
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
                    help="optimizer steps (3000 = the FID campaign's "
                    "99.5%%-closure point on this corpus)")
    ap.add_argument("--check-every", type=int, default=500)
    ap.add_argument("--decays", type=float, nargs="*",
                    default=[0.99, 0.999])
    ap.add_argument("--steps", type=int, default=32, help="diffusion T")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--learning-rate", type=float, default=2e-4)
    ap.add_argument("--eval-n", type=int, default=256)
    ap.add_argument("--platform", default=None)
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
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset, device_iterator
    from gan_class_transfer2_tpu.sample import sampler
    from gan_class_transfer2_tpu.train import trainer
    from gan_class_transfer2_tpu.utils import metrics

    cfg = Config(
        size=args.size, pixel_size=32, max_size=64, octaves=3,
        steps=args.steps, batch_size=args.batch_size,
        learning_rate=args.learning_rate, warm_up=200, ema_decay=0.0,
        compute_dtype="float32", fused_diffusion=False, mesh_data=1,
        donate_state=False, checkpoint_dir=None,
    ).validate()

    train_pool = synthetic.circles(512, cfg.size, seed=0)
    eval_set = synthetic.circles(args.eval_n, cfg.size, seed=1000)
    data_iter = device_iterator(
        ArrayDataset(train_pool, cfg.batch_size, seed=0, flip=False))
    extractor = metrics.get_extractor("auto")
    fixed_init = jnp.asarray(np.random.default_rng(42).normal(
        size=(args.eval_n, cfg.size, cfg.size, 3)).astype(np.float32))

    def emit(obj):
        print(json.dumps(obj), flush=True)

    sample_fn = jax.jit(lambda p, b: sampler.sample(cfg, p, b).images)

    def score(params, step, tag):
        imgs = np.asarray(sample_fn(params, fixed_init))
        float(imgs.sum())  # sync (axon rule: fetch a value)
        both = metrics.fid_and_kid(imgs, eval_set, extractor=extractor)
        out = {"which": tag, "step": step,
               "kid": round(both["kid"], 4), "fid": round(both["fid"], 2)}
        emit(out)
        return out

    floor_draw = synthetic.circles(args.eval_n, cfg.size, seed=2000)
    floor = metrics.fid_and_kid(floor_draw, eval_set, extractor=extractor)
    emit({"which": "floor_same_class", "kid": round(floor["kid"], 4),
          "fid": round(floor["fid"], 2), "eval_n": args.eval_n})

    # EMA as observer: blend(e, p) per decay, jitted once, donating the old
    # EMA tree (the new one replaces it)
    def make_blend(d):
        return jax.jit(
            lambda e, p: jax.tree_util.tree_map(
                lambda ev, pv: ev * d + pv * (1.0 - d), e, p),
            donate_argnums=(0,),
        )

    blends = {d: make_blend(d) for d in args.decays}

    state = trainer.init_state(cfg, jax.random.PRNGKey(cfg.seed))
    emas = {d: jax.tree_util.tree_map(jnp.copy, state.params)
            for d in args.decays}
    step_fn = trainer.make_train_step(cfg)
    rng = jax.random.PRNGKey(cfg.seed + 1)

    history = []
    t0 = time.time()
    for i in range(1, args.train_steps + 1):
        state, loss = step_fn(state, next(data_iter), rng)
        for d in args.decays:
            emas[d] = blends[d](emas[d], state.params)
        if i % args.check_every == 0 or i == args.train_steps:
            row = {"step": i, "loss": round(float(loss), 5),
                   "raw": score(state.params, i, "raw")}
            for d in args.decays:
                row[f"ema_{d}"] = score(emas[d], i, f"ema_{d}")
            history.append(row)

    # summary: best KID per variant over the trajectory + final-step values
    summary = {"which": "summary", "train_steps": args.train_steps,
               "wall_s": round(time.time() - t0, 1), "eval_n": args.eval_n,
               "floor_kid": round(floor["kid"], 4)}
    variants = ["raw"] + [f"ema_{d}" for d in args.decays]
    for v in variants:
        kids = [h[v]["kid"] for h in history]
        summary[f"{v}_best_kid"] = min(kids)
        summary[f"{v}_final_kid"] = kids[-1]
        summary[f"{v}_final_fid"] = history[-1][v]["fid"]
    emit(summary)


if __name__ == "__main__":
    main()
