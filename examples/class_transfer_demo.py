"""End-to-end class-transfer demo on synthetic data (no downloads needed).

Trains the cycle-GAN pair on circles↔crosses and writes transfer grids —
the BASELINE.json "smoke run: tiny G/D on 32×32 class pair" workflow, with
synthetic geometry standing in for MNIST digits.

    python examples/class_transfer_demo.py --platform cpu --steps 200
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--out", default="demo_out")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset
    from gan_class_transfer2_tpu.data import synthetic
    from gan_class_transfer2_tpu.train.gan_loop import GANRunner

    cfg = Config(
        size=args.size,
        pixel_size=16,
        max_size=64,
        octaves=3,
        steps=10,
        batch_size=8,
        learning_rate=2e-4,
        warm_up=0,
        gan_loss="lsgan",
        cycle_weight=5.0,
        identity_weight=0.5,
        ema_decay=0.99,
        compute_dtype="float32",
        fused_diffusion=False,
        classes=("circles", "crosses"),
        log_dir=os.path.join(args.out, "logs"),
        checkpoint_dir=os.path.join(args.out, "ckpt"),
        checkpoint_every=max(args.steps // 2, 1),
        mesh_data=1,
    ).validate()

    ds_a = ArrayDataset(synthetic.circles(256, cfg.size), cfg.batch_size, seed=0, flip=False)
    ds_b = ArrayDataset(synthetic.crosses(256, cfg.size), cfg.batch_size, seed=1, flip=False)
    runner = GANRunner(cfg, dataset_a=ds_a, dataset_b=ds_b)
    runner.fit(epochs=1, steps_per_epoch=args.steps)
    runner.log_sample(1)
    runner.close()
    print(f"done — transfer grids logged under {runner.log_dir}")


if __name__ == "__main__":
    main()
