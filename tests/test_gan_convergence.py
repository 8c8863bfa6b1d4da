"""GAN class-transfer learning test (BASELINE config 1 analogue): two
synthetic classes with distinct channel statistics; after a few hundred
steps the A→B generator must move images toward B's statistics.

The full few-hundred-step run is opt-in (RUN_SLOW=1); the default variant
runs a shorter schedule and only checks the loss signal is alive.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.train import gan


def _class_batch(rng, b, size, red: bool):
    """Class A: red-dominant images; class B: blue-dominant."""
    base = rng.uniform(-0.2, 0.2, (b, size, size, 3)).astype(np.float32)
    if red:
        base[..., 0] += 0.6
        base[..., 2] -= 0.6
    else:
        base[..., 0] -= 0.6
        base[..., 2] += 0.6
    return jnp.asarray(np.clip(base, -1, 0.99))


def _channel_gap(images):
    """red-minus-blue mean: positive = A-like, negative = B-like."""
    arr = np.asarray(images)
    return float(arr[..., 0].mean() - arr[..., 2].mean())


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1", reason="slow; RUN_SLOW=1")
def test_transfer_learns_target_statistics():
    cfg = tiny_test_config(
        batch_size=4, learning_rate=2e-4, cycle_weight=5.0,
        identity_weight=0.0, adversarial_weight=1.0, gan_loss="lsgan",
        donate_state=False,
    )
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    step = gan.make_gan_train_step(cfg)
    r = np.random.default_rng(0)

    a_fixed = _class_batch(np.random.default_rng(99), 4, cfg.size, red=True)
    gap_before = _channel_gap(gan.transfer(cfg, state, a_fixed, "ab", use_ema=False))

    for i in range(300):
        a = _class_batch(r, cfg.batch_size, cfg.size, red=True)
        b = _class_batch(r, cfg.batch_size, cfg.size, red=False)
        state, metrics = step(state, a, b, jax.random.PRNGKey(i))

    fake_b = gan.transfer(cfg, state, a_fixed, "ab", use_ema=False)
    gap_after = _channel_gap(fake_b)
    # Inputs are red-dominant (gap ≈ +1.2); training must push the transfer
    # decisively toward B's blue-dominant statistics (gap < 0), clearly past
    # the untrained generator's near-zero output gap.
    assert gap_after < min(gap_before, 0.0) - 0.05, (gap_before, gap_after)
    assert gap_after < _channel_gap(a_fixed)  # far from the A inputs


def test_gan_losses_move_quickly():
    cfg = tiny_test_config(
        batch_size=2, learning_rate=2e-4, gan_loss="lsgan", donate_state=False
    )
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    step = gan.make_gan_train_step(cfg)
    r = np.random.default_rng(0)
    d_losses = []
    for i in range(12):
        a = _class_batch(r, cfg.batch_size, cfg.size, red=True)
        b = _class_batch(r, cfg.batch_size, cfg.size, red=False)
        state, metrics = step(state, a, b, jax.random.PRNGKey(i))
        d_losses.append(float(metrics["d_loss"]))
    assert all(np.isfinite(d_losses))
    # discriminator learns to separate real/fake at least a little
    assert d_losses[-1] < d_losses[0]
