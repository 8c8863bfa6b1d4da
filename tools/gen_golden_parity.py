"""Generate tests/golden/forward_parity.npz — a TF-free parity oracle.

Builds the Keras equivalent of the reference Denoiser topology (reference
train.py:175-215 at block_depth=0) at the tiny test config, runs one forward
pass, and stores (weights, input, output). tests/test_reference_parity.py's
golden test then imports those weights into this framework and checks
forward equality WITHOUT TensorFlow at test time (VERDICT r1 next #3).

Run: python tools/gen_golden_parity.py  (requires TF; one-time)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import tensorflow as tf

    tf.keras.utils.set_random_seed(0)

    from gan_class_transfer2_tpu.config import tiny_test_config
    from test_reference_parity import _build_keras_equivalent

    cfg = tiny_test_config(size=32, pixel_size=8, max_size=32, octaves=3)
    model = _build_keras_equivalent(cfg)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, cfg.size, cfg.size, 3)).astype(np.float32)
    y = np.asarray(model(x))

    out = {"x": x, "y": y}
    for i, w in enumerate(model.get_weights()):
        out[f"w_{i:03d}"] = np.asarray(w)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "forward_parity.npz",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(out) - 2} weights, y shape {y.shape}")


if __name__ == "__main__":
    main()
