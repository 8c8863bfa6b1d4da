"""One-command reproducible runs of BASELINE.json configs 3-5
(VERDICT r2 next #5).

No dataset downloads exist in this environment, so the deterministic
synthetic shape corpus (data/synthetic.py) stands in for CIFAR/CelebA —
what each run demonstrates is the named INFRASTRUCTURE end-to-end:

  3: 64² class-pair transfer with the ON-DEVICE augmentation pipeline
     (HBM-resident uint8 images, jitted crop/flip/normalize draw)
  4: 128² attribute-style transfer, DATA-PARALLEL over the whole mesh
     (8-way on the virtual CPU mesh; the single real chip on TPU)
  5: 256² MULTI-CLASS conditional transfer with cycle/identity losses and
     EMA sampling (StarGAN-style step, per-target transfer grids)

Each run emits one JSON artifact line {config, throughput, loss/FID
trajectory, grid paths} for BASELINE_MEASURED.md and writes sample grids
under docs/baseline_grids/.

Usage: python tools/run_baseline_configs.py [--configs 3 4 5]
       [--steps-per-epoch 40] [--epochs 3] [--platform cpu]
CI-runnable: --configs 3 --steps-per-epoch 2 --epochs 1 --platform cpu
finishes in ~2 min (exercised by tests/test_baseline_configs.py).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _to_uint8(images):
    import numpy as np

    return np.clip((images + 1.0) * 128.0, 0, 255).astype(np.uint8)


def _steady_state_ips(traj) -> float:
    """Last per-epoch images_per_sec the runner itself logged — the
    wall-clock division below includes the (minutes-long on a tunneled
    TPU) first-epoch compile, so the event-file number is the honest
    steady-state throughput."""
    pts = traj.get("images_per_sec", [])
    return pts[-1][1] if pts else 0.0


def _trajectory(writer_path, tags):
    """Read scalar trajectories back out of the run's own event file."""
    from gan_class_transfer2_tpu.utils import tensorboard as tb

    out = {t: [] for t in tags}
    if writer_path is None:
        return out
    for step, tag, kind, payload in tb.read_events(writer_path):
        if kind == "scalar" and tag in out:
            out[tag].append([step, round(float(payload), 5)])
    return out


def run_config3(args):
    """64² class-pair + on-device augmentation (BASELINE config 3)."""
    import numpy as np

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.data import device_augment, synthetic
    from gan_class_transfer2_tpu.train import gan
    from gan_class_transfer2_tpu.train.gan_loop import GANRunner
    from gan_class_transfer2_tpu.utils.grid import grid_png
    import jax.numpy as jnp

    size, stored = 64, 72  # stored larger than the crop → real random crops
    cfg = Config(
        size=size, pixel_size=32, max_size=64, octaves=3, steps=10,
        batch_size=32, learning_rate=2e-4, warm_up=0, gan_loss="lsgan",
        cycle_weight=5.0, identity_weight=0.5, ema_decay=0.0,
        compute_dtype=args.dtype, fused_diffusion=False,
        classes=("synthetic-circles", "synthetic-crosses"),
        checkpoint_dir=None, log_dir=args.workdir, donate_state=False,
        fid_samples=64, mesh_data=1,
    ).validate()

    n = 512
    ds_a = device_augment.HBMDataset(
        _to_uint8(synthetic.circles(n, stored, seed=0)), size, cfg.batch_size,
        seed=0,
    )
    ds_b = device_augment.HBMDataset(
        _to_uint8(synthetic.crosses(n, stored, seed=1)), size, cfg.batch_size,
        seed=1,
    )
    # disjoint eval draws (fresh seeds), center-cropped deterministically
    off = (stored - size) // 2
    ev_a = synthetic.circles(64, stored, seed=1000)[:, off:off + size, off:off + size]
    ev_b = synthetic.crosses(64, stored, seed=1001)[:, off:off + size, off:off + size]

    runner = GANRunner(cfg, dataset_a=ds_a, dataset_b=ds_b,
                       eval_a=ev_a, eval_b=ev_b)
    t0 = time.perf_counter()
    runner.fit(epochs=args.epochs, steps_per_epoch=args.steps_per_epoch)
    dt = time.perf_counter() - t0
    fake_b = np.asarray(gan.transfer(cfg, runner.state, jnp.asarray(ev_a[:16]), "ab"))
    grid = grid_png(fake_b, os.path.join(args.grid_dir,
                                         "config3_transfer_ab.png"))
    steps = args.epochs * args.steps_per_epoch
    result = {
        "config": 3,
        "what": "64^2 class pair, on-device augment (HBM uint8)",
        "images_per_sec": round(steps * cfg.batch_size / dt, 2),
        "final_fid_ab": round(runner.transfer_fid("ab"), 4),
        "trajectory": (traj := _trajectory(
            runner.writer.path,
            ("g_loss", "d_loss", "transfer_fid_ab", "images_per_sec"),
        )),
        "steady_state_images_per_sec": _steady_state_ips(traj),
        "grid": os.path.relpath(grid, REPO),
    }
    runner.close()
    return result


def run_config4(args):
    """128² pair transfer, data-parallel over the full mesh (config 4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.data import device_augment, synthetic
    from gan_class_transfer2_tpu.train import gan
    from gan_class_transfer2_tpu.train.gan_loop import GANRunner
    from gan_class_transfer2_tpu.utils.grid import grid_png
    from gan_class_transfer2_tpu.parallel import mesh as mesh_lib

    n_dev = jax.device_count()
    size, stored = 128, 144
    cfg = Config(
        size=size, pixel_size=32, max_size=128, octaves=4, steps=10,
        batch_size=8 * n_dev, learning_rate=2e-4, warm_up=0,
        gan_loss="lsgan", cycle_weight=5.0, identity_weight=0.5,
        compute_dtype=args.dtype, fused_diffusion=False,
        classes=("synthetic-circles", "synthetic-rings"),
        checkpoint_dir=None, log_dir=args.workdir, donate_state=False,
        fid_samples=32, mesh_data=0,  # 0 = ALL devices (the DP axis)
    ).validate()

    mesh = mesh_lib.make_mesh(cfg)
    sharding = mesh_lib.batch_sharding(mesh)
    n = 256
    ds_a = device_augment.HBMDataset(
        _to_uint8(synthetic.circles(n, stored, seed=0)), size, cfg.batch_size,
        seed=0, sharding=sharding,
    )
    ds_b = device_augment.HBMDataset(
        _to_uint8(synthetic.rings(n, stored, seed=1)), size, cfg.batch_size,
        seed=1, sharding=sharding,
    )
    off = (stored - size) // 2
    ev_a = synthetic.circles(32, stored, seed=1000)[:, off:off + size, off:off + size]
    ev_b = synthetic.rings(32, stored, seed=1001)[:, off:off + size, off:off + size]

    runner = GANRunner(cfg, dataset_a=ds_a, dataset_b=ds_b,
                       eval_a=ev_a, eval_b=ev_b)
    t0 = time.perf_counter()
    runner.fit(epochs=args.epochs, steps_per_epoch=args.steps_per_epoch)
    dt = time.perf_counter() - t0
    fake_b = np.asarray(gan.transfer(cfg, runner.state, jnp.asarray(ev_a[:16]), "ab"))
    grid = grid_png(fake_b, os.path.join(args.grid_dir,
                                         "config4_transfer_ab.png"))
    steps = args.epochs * args.steps_per_epoch
    result = {
        "config": 4,
        "what": f"128^2 attribute transfer, {mesh.size}-way data parallel",
        "n_devices": mesh.size,
        "global_batch": cfg.batch_size,
        "images_per_sec": round(steps * cfg.batch_size / dt, 2),
        "final_fid_ab": round(runner.transfer_fid("ab"), 4),
        "trajectory": (traj := _trajectory(
            runner.writer.path,
            ("g_loss", "d_loss", "transfer_fid_ab", "images_per_sec"),
        )),
        "steady_state_images_per_sec": _steady_state_ips(traj),
        "grid": os.path.relpath(grid, REPO),
    }
    runner.close()
    return result


def run_config5(args):
    """256² multi-class conditional + cycle/identity + EMA (config 5)."""
    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.data import device_augment, synthetic
    from gan_class_transfer2_tpu.train import conditional_gan as cgan
    from gan_class_transfer2_tpu.train.conditional_gan_loop import (
        ConditionalGANRunner,
    )
    from gan_class_transfer2_tpu.utils.grid import grid_png

    size, stored = 256, 272
    classes = (synthetic.circles, synthetic.crosses, synthetic.rings)
    cfg = Config(
        size=size, pixel_size=32, max_size=128, octaves=5, steps=10,
        batch_size=8, learning_rate=2e-4, warm_up=0, gan_loss="lsgan",
        cycle_weight=args.cycle_weight, identity_weight=args.identity_weight,
        ema_decay=0.99,
        num_classes=len(classes), class_embed_dim=args.class_embed_dim,
        compute_dtype=args.dtype, fused_diffusion=False,
        classes=tuple(f"synthetic-{i}" for i in range(len(classes))),
        checkpoint_dir=None, log_dir=args.workdir, donate_state=False,
        fid_samples=args.eval_n, mesh_data=1,
        lr_schedule=args.lr_schedule,
        d_learning_rate=args.d_learning_rate,
        epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
    ).validate()

    n = 128
    datasets = [
        device_augment.HBMDataset(
            _to_uint8(fn(n, stored, seed=k)), size, cfg.batch_size, seed=k
        )
        for k, fn in enumerate(classes)
    ]
    off = (stored - size) // 2
    # held-out draws; args.eval_n matters: at n=16 the FID estimator's
    # finite-sample bias swamps the trend (docs/FID.md — bias falls 23→3.5
    # going n 64→512), which is exactly how the r3 artifact run's
    # "regression after epoch 2" could be estimator noise
    eval_sets = [
        fn(args.eval_n, stored, seed=1000 + k)[:, off:off + size, off:off + size]
        for k, fn in enumerate(classes)
    ]

    runner = ConditionalGANRunner(cfg, datasets=datasets, eval_sets=eval_sets)
    t0 = time.perf_counter()
    runner.fit(epochs=args.epochs, steps_per_epoch=args.steps_per_epoch)
    dt = time.perf_counter() - t0
    # EMA sampling: transfer the class-0 eval set to every other class with
    # the EMA generator (cgan.transfer prefers ema_generator when present)
    grids = []
    for tgt in range(1, cfg.num_classes):
        out = np.asarray(
            cgan.transfer(cfg, runner.state, jnp.asarray(eval_sets[0]), tgt)
        )
        grids.append(
            os.path.relpath(
                grid_png(out, os.path.join(
                    args.grid_dir, f"config5_to_{tgt}.png"
                )),
                REPO,
            )
        )
    steps = args.epochs * args.steps_per_epoch
    fid01 = runner.transfer_fid(0, 1)
    result = {
        "config": 5,
        "what": "256^2 multi-class conditional, cycle/identity + EMA",
        "num_classes": cfg.num_classes,
        "images_per_sec": round(steps * cfg.batch_size / dt, 2),
        "final_fid_0_to_1": None if fid01 is None else round(fid01, 4),
        "trajectory": (traj := _trajectory(
            runner.writer.path,
            ("g_loss", "d_loss", "cycle", "identity", "transfer_fid_0_to_1",
             "images_per_sec"),
        )),
        "steady_state_images_per_sec": _steady_state_ips(traj),
        "grids": grids,
    }
    runner.close()
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, nargs="*", default=[3, 4, 5])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps-per-epoch", type=int, default=40)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--workdir", default="/tmp/baseline_configs_logs")
    ap.add_argument("--eval-n", type=int, default=16,
                    help="config 5: held-out images per class for the "
                    "per-pair FID/KID (16 = the r3 artifact setting; use "
                    ">=64 for a bias-dominated-regime escape, docs/FID.md)")
    ap.add_argument("--lr-schedule", default="warmup",
                    help="config 5: warmup (constant after 0 here) or "
                    "cosine — the one lever the r3b FID campaign measured "
                    "as genuinely helping")
    ap.add_argument("--d-learning-rate", type=float, default=0.0,
                    help="config 5: TTUR discriminator LR (0 = same as G)")
    ap.add_argument("--cycle-weight", type=float, default=5.0,
                    help="config 5: cycle-consistency weight. 5.0 (the r3 "
                    "setting) provably collapses the conditional G to the "
                    "identity map — every per-pair FID plateaus AT its "
                    "identity baseline (BASELINE_MEASURED.md r4)")
    ap.add_argument("--identity-weight", type=float, default=0.5,
                    help="config 5: identity-mapping loss weight")
    ap.add_argument("--class-embed-dim", type=int, default=8,
                    help="config 5: class-embedding width — the identity "
                    "plateau's hypothesised bottleneck is the conditioning "
                    "pathway's maturity (BASELINE_MEASURED.md r4)")
    ap.add_argument(
        "--grid-dir", default=os.path.join(REPO, "docs", "baseline_grids"),
        help="where sample grids are written. The ARTIFACT pass (TPU, full "
        "step budget) uses the default docs/baseline_grids; the CI smoke "
        "(tests/test_baseline_configs.py) passes a temp dir so test runs "
        "never overwrite the committed TPU artifact grids",
    )
    args = ap.parse_args()
    os.makedirs(args.grid_dir, exist_ok=True)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    args.dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    runners = {3: run_config3, 4: run_config4, 5: run_config5}
    results = []
    for c in args.configs:
        print(f"--- config {c} ---", flush=True)
        r = runners[c](args)
        r["backend"] = jax.default_backend()
        print(json.dumps(r), flush=True)
        results.append(r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
