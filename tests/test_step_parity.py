"""Bit-level TRAINING-STEP parity vs the reference semantics in live TF.

VERDICT r1 missing #3 asked for fixed-seed parity; exact cross-RNG stream
equality is meaningless (different PRNG algorithms), so this harness removes
the RNG from the comparison: the SAME (x, t, ε) draws are fed to

  * a live TF/Keras model + Adam(WarmUp) step implementing the reference
    Trainer semantics verbatim (reference train.py:217-280, 50-65, 75), and
  * this framework's `make_injected_train_step` with `optimizer="adam_tf"`
    (exact Keras Adam update math),

starting from identical weights. Losses must match per step and the final
weights must match elementwise after several steps — i.e. the *entire* step
(diffusion algebra → U-Net fwd/bwd → warmup schedule → Adam update) is
semantically identical; the only remaining differences are conv-kernel
floating-point reassociation.

The golden test at the bottom replays the same comparison against a captured
TF run (tests/golden/step_parity.npz, tools/gen_golden_step_parity.py) so it
runs without TF installed.
"""

import os

import numpy as np

from helpers_tf_step import (
    make_parity_case,
    parity_config,
    run_tf_reference_steps,
)
from test_reference_parity import needs_tf

N_STEPS = 4


def run_jax_steps(cfg, init_flat, batches, t_draws, eps_draws):
    """Replay the same steps in this framework from the TF initial weights."""
    import jax
    import jax.numpy as jnp

    from gan_class_transfer2_tpu.models import unet
    from gan_class_transfer2_tpu.train import trainer as trainer_mod
    from gan_class_transfer2_tpu.utils import tf_import

    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    params = tf_import.import_flat_weights(cfg, params, init_flat)
    opt_state = trainer_mod.make_optimizer(cfg).init(params)
    state = trainer_mod.TrainState(
        jnp.zeros((), jnp.int32), params, opt_state, None, None
    )
    step = trainer_mod.make_injected_train_step(cfg)
    losses = []
    for x, t, eps in zip(batches, t_draws, eps_draws):
        state, loss = step(state, jnp.asarray(x), t, eps)
        losses.append(float(loss))
    return losses, tf_import.export_flat_weights(cfg, state.params)


def _assert_step_parity(tf_losses, tf_final, jax_losses, jax_final):
    np.testing.assert_allclose(jax_losses, tf_losses, rtol=2e-5, atol=1e-7)
    for got, want in zip(jax_final, tf_final):
        np.testing.assert_allclose(got, want, atol=2e-5)


@needs_tf
def test_train_step_parity_live_tf():
    cfg = parity_config()
    batches, t_draws, eps_draws = make_parity_case(cfg, N_STEPS, seed=0)
    init_flat, tf_losses, tf_final = run_tf_reference_steps(
        cfg, batches, t_draws, eps_draws
    )
    jax_losses, jax_final = run_jax_steps(
        cfg, init_flat, batches, t_draws, eps_draws
    )
    _assert_step_parity(tf_losses, tf_final, jax_losses, jax_final)


def test_train_step_parity_against_golden_npz():
    """TF-free replay of a captured TF reference training run."""
    path = os.path.join(os.path.dirname(__file__), "golden", "step_parity.npz")
    data = np.load(path)
    cfg = parity_config()
    n_init = int(data["n_init"])
    init_flat = [data[f"w_{i:03d}"] for i in range(n_init)]
    tf_final = [data[f"f_{i:03d}"] for i in range(n_init)]
    batches = list(data["batches"])
    t_draws = list(data["t_draws"])
    eps_draws = list(data["eps_draws"])
    jax_losses, jax_final = run_jax_steps(
        cfg, init_flat, batches, t_draws, eps_draws
    )
    _assert_step_parity(
        list(data["losses"]), tf_final, jax_losses, jax_final
    )


def test_adam_tf_matches_keras_math():
    """Unit check of the adam_tf transform against a NumPy transcription of
    Keras Adam.update_step (keras/src/optimizers/adam.py): eps is added
    AFTER sqrt(v); bias correction folds into the step size."""
    import jax.numpy as jnp

    from gan_class_transfer2_tpu.train.trainer import _scale_by_adam_tf

    b1, b2, eps = 0.9, 0.999, 1e-7
    tx = _scale_by_adam_tf(b1, b2, eps)
    g_seq = [np.array([0.5, -2.0, 0.01], np.float32) * (i + 1) for i in range(3)]

    p = np.zeros(3, np.float32)
    state = tx.init(jnp.asarray(p))
    m = np.zeros(3, np.float64)
    v = np.zeros(3, np.float64)
    for i, g in enumerate(g_seq):
        upd, state = tx.update(jnp.asarray(g), state)
        t = i + 1
        m += (g - m) * (1 - b1)
        v += (g * g - v) * (1 - b2)
        alpha = np.sqrt(1 - b2**t) / (1 - b1**t)
        want = alpha * m / (np.sqrt(v) + eps)
        # fp32 transform vs fp64 oracle: a few ulps of headroom
        np.testing.assert_allclose(np.asarray(upd), want, rtol=3e-5)
