"""TF-side reference training-step harness for bit-level step parity.

Runs N reference-semantics Trainer steps (reference train.py:217-280) with a
live TF/Keras model of the reference topology and *injected* randomness
(t, ε supplied by the caller), so the identical draws can be fed to this
framework's `make_injected_train_step` and compared step by step.

Not a test module — imported by tests/test_step_parity.py (live-TF test) and
tools/gen_golden_step_parity.py (golden capture for TF-free runs).
"""

import numpy as np


def alpha_dash_np(t, steps):
    """ᾱ(t), quadratic active schedule (reference train.py:93), float32."""
    t = np.asarray(t, np.float32)
    return (1.0 - t / np.float32(steps + 1)) ** 2 * np.float32(0.25)


def build_keras_reference(cfg):
    """Keras functional model with the reference Denoiser topology at
    block_depth=0 (reference train.py:175-204): strided convs down,
    transposed convs up, concat skips, linear Dense head."""
    import tensorflow as tf

    x_in = tf.keras.Input((cfg.size, cfg.size, 3))
    skips = [x_in]
    h = x_in
    for i in range(cfg.octaves):
        f = cfg.octave_filters(i)
        h = tf.keras.layers.Conv2D(
            f, 4, 2, "same", activation="relu",
            kernel_initializer="glorot_uniform",
        )(h)
        skips.append(h)
    for i in reversed(range(cfg.octaves)):
        u = cfg.octave_up_filters(i)
        h = tf.keras.layers.Conv2DTranspose(
            u, 4, 2, "same", activation="relu",
            kernel_initializer="glorot_uniform",
        )(h)
        h = tf.keras.layers.Concatenate()([h, skips[i]])
    out = tf.keras.layers.Dense(3)(h)
    return tf.keras.Model(x_in, out)


def run_tf_reference_steps(cfg, batches, t_draws, eps_draws):
    """Run len(batches) reference Trainer steps in TF/Keras.

    Per step (reference train.py:223-272, predict_x parameterization):
      noised = x·√ᾱ(t) + ε·√(1-ᾱ(t));  loss = mean((x - model(noised))²)
    optimizer: Adam(WarmUp(lr, warm), eps=cfg.adam_eps) — reference
    train.py:50-65, 75.

    Returns (initial_flat_weights, losses, final_flat_weights).
    """
    import tensorflow as tf

    class WarmUp(tf.keras.optimizers.schedules.LearningRateSchedule):
        # reference train.py:50-65: base·(step+1)/(warm+1) below warm
        def __init__(self, base, warm):
            self.base, self.warm = base, warm

        def __call__(self, step):
            step = tf.cast(step, tf.float32)
            ramp = self.base * (step + 1.0) / (self.warm + 1.0)
            return tf.where(step < self.warm, ramp, self.base)

    model = build_keras_reference(cfg)
    init_weights = [np.array(w) for w in model.get_weights()]
    opt = tf.keras.optimizers.Adam(
        WarmUp(cfg.learning_rate, cfg.warm_up), epsilon=cfg.adam_eps
    )

    losses = []
    for x, t, eps in zip(batches, t_draws, eps_draws):
        ad = alpha_dash_np(t.reshape(-1, 1, 1, 1), cfg.steps)
        noised = x * np.sqrt(ad) + eps * np.sqrt(1.0 - ad)
        noised = tf.constant(noised, tf.float32)
        x_t = tf.constant(x, tf.float32)
        with tf.GradientTape() as tape:
            pred = model(noised, training=True)
            loss = tf.reduce_mean(tf.square(x_t - pred))
        grads = tape.gradient(loss, model.trainable_variables)
        opt.apply_gradients(zip(grads, model.trainable_variables))
        losses.append(float(loss))

    final_weights = [np.array(w) for w in model.get_weights()]
    return init_weights, losses, final_weights


def make_parity_case(cfg, n_steps, seed=0):
    """Deterministic (batches, t_draws, eps_draws) for a parity run."""
    rng = np.random.default_rng(seed)
    batches = [
        rng.uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)).astype(
            np.float32
        )
        for _ in range(n_steps)
    ]
    t_draws = [
        rng.integers(1, cfg.steps + 1, (cfg.batch_size,)).astype(np.int32)
        for _ in range(n_steps)
    ]
    eps_draws = [
        rng.standard_normal((cfg.batch_size, cfg.size, cfg.size, 3)).astype(
            np.float32
        )
        for _ in range(n_steps)
    ]
    return batches, t_draws, eps_draws


def parity_config():
    """The shared tiny config for step parity (live and golden tests)."""
    from gan_class_transfer2_tpu.config import tiny_test_config

    return tiny_test_config(
        size=16,
        pixel_size=8,
        max_size=16,
        octaves=2,
        steps=200,  # real ᾱ range (reference train.py:24)
        batch_size=2,
        warm_up=4,  # exercises both the ramp and the constant region
        learning_rate=1e-3,
        optimizer="adam_tf",
        parameterization="x",
        donate_state=False,
    )
