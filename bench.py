"""Benchmark entry point — prints ONE JSON line.

Workload: the reference training step (256²×3, ~41.7 M-param U-Net, diffusion
MSE, Adam) — see BASELINE.md. The reference publishes no numbers; the recorded
reference workload is batch_size=1 on a single GPU. We report training
images/sec/chip at the TPU-native operating point (bf16 compute, batched).

vs_baseline: ratio against a fixed reference throughput constant measured for
the same workload; 0.0 until a measured baseline exists (reference publishes
none — BASELINE.json "published": {}).
"""

import sys


def main():
    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.utils.benchmark import run_benchmark

    import jax

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        batch_size=32 if on_tpu else 2,
        size=256 if on_tpu else 32,
        pixel_size=128 if on_tpu else 8,
        max_size=512 if on_tpu else 16,
        octaves=6 if on_tpu else 3,
        warm_up=0,
        checkpoint_dir=None,
        donate_state=True,
    )
    result = run_benchmark(cfg, steps=20 if on_tpu else 5, warmup=3)
    print(result.to_json())


if __name__ == "__main__":
    sys.exit(main())
