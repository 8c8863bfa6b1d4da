"""Unconditional pair-GAN probe: is a class pair learnable WITHOUT the
multi-class conditional game?

Motivation (r5): in the config-5 60-epoch extension, five of six transfer
pairs end below their identity baselines, but crosses→rings (1→2)
oscillates above its (unusually easy) baseline for the whole second half
of the run while its REVERSE (2→1) sits below — an asymmetric laggard
inside the 3-class conditional game. This tool trains the plain 2-class
cycle GAN (train/gan.py — separate per-direction generators, no class
embedding) on the same pair, same scale, same losses and budget:

  * if the pair GAN lands both directions well below the baseline, the
    conditional game (one shared generator serving 6 transfer directions
    through an 8-d class embedding) is the bottleneck, not the pair's
    geometry;
  * if crosses→rings lags here too, the asymmetry is in the data
    (ring topology: the generator must open a hole), not the game.

Usage:
  python tools/probe_pair_gan.py                     # 256², TPU, ~15 min
  python tools/probe_pair_gan.py --platform cpu --size 32 --epochs 2 \
      --steps-per-epoch 5 --eval-n 16                # smoke
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class-a", default="crosses",
                    help="synthetic corpus name (data/synthetic.py)")
    ap.add_argument("--class-b", default="rings")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--steps-per-epoch", type=int, default=200)
    ap.add_argument("--eval-n", type=int, default=64)
    ap.add_argument("--pool-n", type=int, default=128,
                    help="training images per class (config-5 parity)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--patch-d", default="true",
                    help="patch_discriminator (true/false) — the r5 "
                    "mechanism test flips this: a PatchGAN receptive field "
                    "cannot see global topology (a ring's hole), so its "
                    "adversarial gradient for topology-changing transfers "
                    "is weak against the pixel-global cycle/identity pulls")
    ap.add_argument("--tag", default="",
                    help="suffix for grid filenames (variant runs)")
    ap.add_argument("--keep-best-dir", default="",
                    help="enable Config.keep_best with this checkpoint dir "
                    "and report best.json vs the final epoch — demonstrates "
                    "best-checkpoint selection under the oscillation this "
                    "probe reproduces")
    ap.add_argument("--grid-dir", default=os.path.join(REPO, "docs",
                                                       "baseline_grids"))
    ap.add_argument("--override", action="append", default=[],
                    help="Config field override key=value (repeatable), "
                    "e.g. --override identity_weight_final=0 "
                    "--override loss_anneal_steps=2000 — the r5 anneal "
                    "probe flips the identity/cycle pulls this tool's "
                    "baseline runs showed feeding the relapse")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.data import device_augment, synthetic
    from gan_class_transfer2_tpu.train import gan
    from gan_class_transfer2_tpu.train.gan_loop import GANRunner
    from gan_class_transfer2_tpu.utils import metrics
    from gan_class_transfer2_tpu.utils.grid import grid_png

    size = args.size
    stored = size + 16  # config-5 margin (272 at 256²)
    on_tpu = jax.default_backend() == "tpu"
    # config-5's exact settings minus the conditioning (run_baseline_configs
    # run_config5): lsgan, cycle 5.0, identity 0.5, ema 0.99, b8, octave
    # stack pixel 32 / max 128 / octaves 5 at 256² (scaled down for smoke)
    octaves = 5 if size >= 256 else 3
    cfg = Config(
        size=size, pixel_size=32, max_size=128 if size >= 256 else 64,
        octaves=octaves, steps=10, batch_size=args.batch_size,
        learning_rate=2e-4, warm_up=0, gan_loss="lsgan",
        cycle_weight=5.0, identity_weight=0.5, ema_decay=0.99,
        compute_dtype="bfloat16" if on_tpu else "float32",
        fused_diffusion=False,
        classes=(f"synthetic-{args.class_a}", f"synthetic-{args.class_b}"),
        checkpoint_dir=args.keep_best_dir or None,
        checkpoint_every=0,  # only best-improvement saves, no periodic ones
        keep_best=bool(args.keep_best_dir),
        log_dir="/tmp/pair_gan_logs",
        donate_state=False, fid_samples=args.eval_n, mesh_data=1,
        patch_discriminator=args.patch_d.lower() in ("1", "true", "yes"),
    ).validate()
    if args.override:
        kw = {}
        for ov in args.override:
            k, v = ov.split("=", 1)
            try:
                kw[k] = json.loads(v)  # floats/ints/bools; strings fall back
            except json.JSONDecodeError:
                kw[k] = v
        cfg = cfg.replace(**kw).validate()
        print(json.dumps({"which": "overrides", "overrides": kw}), flush=True)

    make_a = getattr(synthetic, args.class_a)
    make_b = getattr(synthetic, args.class_b)

    def to_uint8(x):
        return np.clip((x + 1.0) * 128.0, 0, 255).astype(np.uint8)

    # pools seeded like config5's per-class datasets (seed = class index:
    # crosses=1, rings=2), eval draws at 1000 + class index
    ds_a = device_augment.HBMDataset(
        to_uint8(make_a(args.pool_n, stored, seed=1)), size, cfg.batch_size,
        seed=1)
    ds_b = device_augment.HBMDataset(
        to_uint8(make_b(args.pool_n, stored, seed=2)), size, cfg.batch_size,
        seed=2)
    off = (stored - size) // 2
    ev_a = make_a(args.eval_n, stored, seed=1001)[:, off:off + size,
                                                  off:off + size]
    ev_b = make_b(args.eval_n, stored, seed=1002)[:, off:off + size,
                                                  off:off + size]

    def emit(obj):
        print(json.dumps(obj), flush=True)

    # the do-nothing score both directions must beat (symmetric)
    x = metrics.get_extractor("auto")
    base = metrics.fid_and_kid(ev_a, ev_b, extractor=x)
    emit({"which": "identity_baseline", "fid": round(base["fid"], 1),
          "kid": round(base["kid"], 1), "eval_n": args.eval_n})

    runner = GANRunner(cfg, dataset_a=ds_a, dataset_b=ds_b,
                       eval_a=ev_a, eval_b=ev_b)
    t0 = time.time()
    runner.fit(epochs=args.epochs, steps_per_epoch=args.steps_per_epoch)
    wall = time.time() - t0

    from gan_class_transfer2_tpu.utils import tensorboard as tb

    ev = list(tb.read_events(runner.writer.path))
    out = {"which": "trajectory"}
    for d in ("ab", "ba"):
        tr = [(e[0], round(e[3], 1)) for e in ev if e[1] == f"transfer_fid_{d}"]
        vals = [v for _, v in tr]
        out[f"fid_{d}"] = tr
        out[f"fid_{d}_min"] = min(vals) if vals else None
        out[f"fid_{d}_final"] = vals[-1] if vals else None
    emit(out)

    os.makedirs(args.grid_dir, exist_ok=True)
    grids = {}
    for d, src in (("ab", ev_a), ("ba", ev_b)):
        fake = np.asarray(
            gan.transfer(cfg, runner.state, jnp.asarray(src[:16]), d))
        suffix = f"_{args.tag}" if args.tag else ""
        grids[d] = os.path.relpath(grid_png(fake, os.path.join(
            args.grid_dir,
            f"pair_{args.class_a}_{args.class_b}_{d}{suffix}.png")), REPO)
    if args.keep_best_dir:
        from gan_class_transfer2_tpu.utils import checkpoint as ckpt_lib

        rec = ckpt_lib.read_best(args.keep_best_dir)
        final_mean = (out["fid_ab_final"] + out["fid_ba_final"]) / 2
        emit({
            "which": "keep_best",
            "best": rec,
            "final_epoch_fid_mean": round(final_mean, 1),
            "improvement_vs_final": (
                None if rec is None
                else round(final_mean / rec["value"], 2)),
        })
    emit({
        "metric": "pair_gan_probe",
        "pair": f"{args.class_a}<->{args.class_b}",
        "size": size,
        "identity_baseline_fid": round(base["fid"], 1),
        "fid_ab_min": out["fid_ab_min"], "fid_ab_final": out["fid_ab_final"],
        "fid_ba_min": out["fid_ba_min"], "fid_ba_final": out["fid_ba_final"],
        "steps": args.epochs * args.steps_per_epoch,
        "images_per_sec": round(
            args.epochs * args.steps_per_epoch * cfg.batch_size / wall, 1),
        "grids": grids,
    })
    runner.close()


if __name__ == "__main__":
    main()
