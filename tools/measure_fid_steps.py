"""Re-measure steps-to-fixed-FID with true held-out eval sets.

VERDICT r1 weak #4: the round-1 number (6000 steps to transfer-FID 0.005)
drew eval images from the training iterators. This re-runs the headline
metric with eval sets generated DISJOINTLY (fresh synthetic draws under an
eval-only seed, never seen by the training streams).

Usage: python tools/measure_fid_steps.py [--target 0.005] [--max-steps 12000]
Prints the FID trajectory and one final JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--target", type=float, default=None,
        help="absolute FID target; default = --target-x times the measured "
        "same-class floor (extractor-agnostic: the floor carries the "
        "embedding's units)",
    )
    ap.add_argument("--target-x", type=float, default=1.5)
    ap.add_argument(
        "--target-closure", type=float, default=None,
        help="alternative target: close this FRACTION of the floor-to-"
        "untransferred FID gap (e.g. 0.995). Scale-free and robust to the "
        "eval-set size, unlike --target-x: the same-class floor is almost "
        "entirely the FID estimator's finite-sample bias (23→3.5 as n goes "
        "64→512 on this corpus), so a floor MULTIPLE conflates estimator "
        "bias with real distribution gap",
    )
    ap.add_argument(
        "--extractor", default="auto", choices=("auto", "trained", "random"),
        help="feature embedding (utils/metrics.get_extractor)",
    )
    ap.add_argument(
        "--metric", default="fid", choices=("fid", "kid"),
        help="quality score: fid (BASELINE-named; finite-sample-biased "
        "floor) or kid (unbiased MMD² — floor ≈ 0 at any eval-set size, "
        "docs/FID.md)",
    )
    ap.add_argument("--max-steps", type=int, default=12000)
    ap.add_argument("--check-every", type=int, default=1000)
    ap.add_argument(
        "--lr-schedule", default="warmup",
        help="Config.lr_schedule; 'cosine' decays to zero over --max-steps "
        "(the horizon is wired to the budget here)",
    )
    ap.add_argument("--learning-rate", type=float, default=2e-4)
    ap.add_argument("--ema-decay", type=float, default=0.99)
    ap.add_argument("--pixel-size", type=int, default=32)
    ap.add_argument("--max-size", type=int, default=64)
    ap.add_argument("--cycle-weight", type=float, default=5.0)
    ap.add_argument("--identity-weight", type=float, default=0.5)
    ap.add_argument("--diffaug", type=str, default="",
                    help="Config.diffaug policy (color,translation,cutout)")
    ap.add_argument("--r1-weight", type=float, default=0.0)
    ap.add_argument(
        "--fid-samples", type=int, default=64,
        help="eval-set size per class; larger sets shrink the FID "
        "estimator's finite-sample bias (the floor drops with n)",
    )
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.target_closure is not None and not 0 < args.target_closure < 1:
        ap.error("--target-closure must be a FRACTION in (0, 1), e.g. 0.995")

    import jax

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.data import synthetic
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset
    from gan_class_transfer2_tpu.train.gan_loop import GANRunner
    from gan_class_transfer2_tpu.utils.benchmark import steps_to_fixed_fid

    cfg = Config(
        size=32, pixel_size=args.pixel_size, max_size=args.max_size,
        octaves=3, steps=10,
        batch_size=64, learning_rate=args.learning_rate, warm_up=0,
        lr_schedule=args.lr_schedule,
        # cosine horizon = the full step budget (epochs × steps_per_epoch)
        epochs=max(args.max_steps // args.check_every, 1),
        steps_per_epoch=args.check_every,
        gan_loss="lsgan", cycle_weight=args.cycle_weight,
        identity_weight=args.identity_weight,
        diffaug=args.diffaug, r1_weight=args.r1_weight,
        ema_decay=args.ema_decay, compute_dtype="float32", fused_diffusion=False,
        classes=("circles", "crosses"), log_dir="/tmp/fid_logs", checkpoint_dir=None,
        mesh_data=1, fid_samples=args.fid_samples, donate_state=False,
    ).validate()

    # train pool: seeds 0/1; eval pool: seeds 1000/1001 — disjoint draws
    ds_a = ArrayDataset(synthetic.circles(512, cfg.size, seed=0),
                        cfg.batch_size, seed=0, flip=False)
    ds_b = ArrayDataset(synthetic.crosses(512, cfg.size, seed=1),
                        cfg.batch_size, seed=1, flip=False)
    eval_a = synthetic.circles(cfg.fid_samples, cfg.size, seed=1000)
    eval_b = synthetic.crosses(cfg.fid_samples, cfg.size, seed=1001)
    cfg = cfg.replace(fid_extractor=args.extractor)
    runner = GANRunner(cfg, dataset_a=ds_a, dataset_b=ds_b,
                       eval_a=eval_a, eval_b=eval_b)

    # reference floors: same-class noise floor and untransferred distance.
    # The floor carries the embedding's units, so the default target
    # (--target-x times floor) is meaningful under ANY extractor — the
    # pinned trained embedding's scores are thousands where the old random
    # projection's were hundredths.
    from gan_class_transfer2_tpu.utils import metrics
    x = metrics.get_extractor(args.extractor)
    metric_fn = metrics.fid if args.metric == "fid" else metrics.kid
    floor = metric_fn(
        synthetic.crosses(cfg.fid_samples, cfg.size, seed=77), eval_b,
        extractor=x,
    )
    untransferred = metric_fn(eval_a, eval_b, extractor=x)
    if args.target is None:
        if args.target_closure is not None:
            args.target = float(floor) + (1.0 - args.target_closure) * (
                float(untransferred) - float(floor)
            )
        else:
            args.target = args.target_x * float(floor)
    print(json.dumps({"extractor": args.extractor,
                      "quality_metric": args.metric,
                      f"{args.metric}_floor_same_class": round(float(floor), 5),
                      f"{args.metric}_untransferred": round(float(untransferred), 5),
                      "target": round(float(args.target), 5)}),
          flush=True)

    t0 = time.time()
    steps, fid = steps_to_fixed_fid(
        runner, target_fid=args.target, max_steps=args.max_steps,
        check_every=args.check_every, metric=args.metric,
    )
    runner.close()
    print(json.dumps({
        "metric": f"steps_to_fixed_{args.metric}_heldout",
        "lr_schedule": args.lr_schedule,
        "learning_rate": args.learning_rate,
        "ema_decay": args.ema_decay,
        "pixel_size": args.pixel_size,
        "diffaug": args.diffaug,
        "r1_weight": args.r1_weight,
        "fid_samples": args.fid_samples,
        "target_fid": args.target,
        "steps": steps,
        "final_fid": round(float(fid), 5),
        "wall_s": round(time.time() - t0, 1),
        "eval": "held-out synthetic draws (seeds 1000/1001), disjoint from training pools",
    }), flush=True)


if __name__ == "__main__":
    main()
