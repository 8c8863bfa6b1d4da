"""End-to-end flagship validation: train the full reference workload (256²,
41.7 M params, T=200) through the REAL driver at the measured operating
point and report the per-epoch preview RMSE ("example loss" — the
reference's regression signal, train.py:357-361).

Data: synthetic 288² soft-disk images resident in HBM (HBMDataset), so the
1-core host's decode rate does not bound the 1.2k img/s device demand.

Usage: python tools/validate_flagship.py [--steps-per-epoch 500]
       [--epochs 3] [--batch 256] [--moment-dtype float32]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synthetic_images(n: int, side: int, rng) -> "np.ndarray":
    import numpy as np

    xs = np.linspace(-1, 1, side)
    xx, yy = np.meshgrid(xs, xs)
    out = np.empty((n, side, side, 3), np.uint8)
    for i in range(n):
        cx, cy = rng.uniform(-0.4, 0.4, 2)
        rad = rng.uniform(0.25, 0.7)
        d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        disk = np.clip((rad - d) * 6, -1, 1)  # soft edge
        col = rng.uniform(0.3, 1.0, 3)
        img = (disk[..., None] * col[None, None] * 0.5 + 0.5) * 255
        out[i] = np.clip(img, 0, 255).astype(np.uint8)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-epoch", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--moment-dtype", default="bfloat16")
    ap.add_argument("--optimizer", default="adam_tf")
    ap.add_argument("--n-images", type=int, default=512)
    args = ap.parse_args()

    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=32768"
    ).strip()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.data.device_augment import HBMDataset
    from gan_class_transfer2_tpu.train.loop import Runner
    from gan_class_transfer2_tpu.utils import tensorboard as tb

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        batch_size=args.batch if on_tpu else 2,
        size=256 if on_tpu else 16,
        pixel_size=128 if on_tpu else 4,
        max_size=512 if on_tpu else 8,
        octaves=6 if on_tpu else 2,
        steps=200 if on_tpu else 4,
        optimizer=args.optimizer,
        moment_dtype=args.moment_dtype,
        fused_diffusion=on_tpu,
        steps_per_epoch=args.steps_per_epoch,
        epochs=args.epochs,
        checkpoint_dir=None,
        log_dir=os.path.join(REPO, "logs_validate"),
    )
    rng = np.random.default_rng(0)
    imgs = synthetic_images(
        args.n_images + 1, cfg.size + cfg.size // 8, rng
    )
    # held-out example image from the same distribution — the preview RMSE
    # ("example loss") only means something on in-distribution data
    from PIL import Image

    example_path = os.path.join(REPO, "logs_validate", "example.png")
    os.makedirs(os.path.dirname(example_path), exist_ok=True)
    Image.fromarray(imgs[-1]).save(example_path)
    cfg = cfg.replace(example_image_path=example_path)
    dataset = HBMDataset(imgs[:-1], cfg.size, cfg.batch_size, seed=0, raw=True)

    runner = Runner(cfg, dataset=dataset)
    try:
        runner.fit()
        events = []
        for root, _dirs, files in os.walk(cfg.log_dir):
            for f in files:
                if f.startswith("events"):
                    events.append(os.path.join(root, f))
        latest = max(events, key=os.path.getmtime)
        rmse = [
            (e[0], e[3]) for e in tb.read_events(latest)
            if e[1] == "example loss" and e[2] == "scalar"
        ]
        print("example-loss trajectory:",
              [f"step {s}: {v:.4f}" for s, v in rmse])
    finally:
        runner.close()


if __name__ == "__main__":
    main()
