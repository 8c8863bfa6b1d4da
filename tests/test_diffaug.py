"""Differentiable augmentation (ops/diffaug.py) + R1 penalty wiring.

Framework-side GAN quality levers (no reference counterpart — the
reference has no discriminator, SURVEY §0); parity default keeps both off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.ops import diffaug


def _x(n=4, h=16):
    r = np.random.default_rng(0)
    return jnp.asarray(r.uniform(-1, 1, (n, h, h, 3)).astype(np.float32))


def test_empty_policy_is_identity_noop():
    cfg = tiny_test_config()
    x = _x()
    out = diffaug.augment(cfg, jax.random.PRNGKey(0), x)
    assert out is x  # no-op, not even a copy — parity path untouched


def test_policies_preserve_shape_and_are_deterministic():
    cfg = tiny_test_config(diffaug="color,translation,cutout")
    x = _x()
    a = diffaug.augment(cfg, jax.random.PRNGKey(1), x)
    b = diffaug.augment(cfg, jax.random.PRNGKey(1), x)
    c = diffaug.augment(cfg, jax.random.PRNGKey(2), x)
    assert a.shape == x.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_cutout_zeroes_a_square_per_sample():
    cfg = tiny_test_config(diffaug="cutout")
    ones = jnp.ones((4, 16, 16, 3), jnp.float32)
    out = np.asarray(diffaug.augment(cfg, jax.random.PRNGKey(3), ones))
    for i in range(4):
        zeros = (out[i, :, :, 0] == 0.0)
        assert 0 < zeros.sum() <= 8 * 8  # clipped square of side h/2
        # contiguous rectangle: the zero set equals its bounding box
        ys, xs = np.where(zeros)
        assert zeros.sum() == (np.ptp(ys) + 1) * (np.ptp(xs) + 1)
        # untouched pixels keep their value
        assert np.all(out[i][~zeros] == 1.0)


def test_translation_pads_with_zeros_keeps_interior():
    cfg = tiny_test_config(diffaug="translation")
    ones = jnp.ones((8, 16, 16, 3), jnp.float32)
    out = np.asarray(diffaug.augment(cfg, jax.random.PRNGKey(4), ones))
    # shift is at most h/8 = 2 px, so the centre is always covered...
    assert np.all(out[:, 4:12, 4:12, :] == 1.0)
    # ...and every value is either original or zero padding
    assert set(np.unique(out)) <= {0.0, 1.0}


def test_color_is_differentiable_and_batched():
    cfg = tiny_test_config(diffaug="color")
    x = _x()

    def f(x):
        return jnp.sum(diffaug.augment(cfg, jax.random.PRNGKey(5), x) ** 2)

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_config_rejects_unknown_policy():
    with pytest.raises(ValueError, match="diffaug"):
        tiny_test_config(diffaug="color,solarize").validate()
    with pytest.raises(ValueError, match="r1_weight"):
        tiny_test_config(r1_weight=-1.0).validate()


def test_gan_step_with_diffaug_and_r1():
    """The full GAN step runs with both levers on: finite losses, an r1
    metric, and the penalty actually contributes to the D gradients."""
    from gan_class_transfer2_tpu.train import gan

    cfg = tiny_test_config(
        diffaug="color,translation,cutout", r1_weight=10.0,
        gan_loss="lsgan", ema_decay=0.99, donate_state=False,
    )
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    step = gan.make_gan_train_step(cfg)
    a, b = _x(2, cfg.size), _x(2, cfg.size)
    state, metrics = step(state, a, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["g_loss"]))
    assert np.isfinite(float(metrics["d_loss"]))
    assert float(metrics["r1"]) > 0.0


def test_conditional_gan_step_with_diffaug_and_r1():
    from gan_class_transfer2_tpu.train import conditional_gan as cgan

    cfg = tiny_test_config(
        num_classes=3, diffaug="color,cutout", r1_weight=1.0,
        gan_loss="lsgan", donate_state=False,
    )
    state = cgan.init_conditional_gan_state(cfg, jax.random.PRNGKey(0))
    step = cgan.make_conditional_gan_train_step(cfg)
    batch = {
        "image": _x(4, cfg.size),
        "label": jnp.asarray([0, 1, 2, 0], jnp.int32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["g_loss"]))
    assert float(metrics["r1"]) > 0.0


def test_r1_penalty_matches_manual_value():
    """r1_penalty == mean over batch of ‖∇ₓ sum(D(x))‖² computed directly."""
    from gan_class_transfer2_tpu.models import discriminator as d_lib
    from gan_class_transfer2_tpu.train import gan

    cfg = tiny_test_config()
    params = d_lib.init_discriminator(jax.random.PRNGKey(0), cfg)
    x = _x(3, cfg.size)
    got = float(gan.r1_penalty(cfg, params, x))

    def one(xi):
        g = jax.grad(
            lambda v: jnp.sum(
                d_lib.discriminator_apply(cfg, params, v[None]).astype(
                    jnp.float32
                )
            )
        )(xi)
        return jnp.sum(g.astype(jnp.float32) ** 2)

    want = float(jnp.mean(jax.vmap(one)(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_diffaug_draws_vary_with_step(monkeypatch):
    """Augmentation keys must differ between consecutive training steps —
    the runner passes ONE rng per fit call, so the step must fold in
    state.step or every step reuses identical draws (review r3c)."""
    from gan_class_transfer2_tpu.ops import diffaug as da
    from gan_class_transfer2_tpu.train import gan
    from gan_class_transfer2_tpu.train.trainer import make_optimizer

    seen = []
    real_augment = da.augment

    def spy(cfg, k, x):
        seen.append(np.asarray(k).tobytes())
        return real_augment(cfg, k, x)

    monkeypatch.setattr(da, "augment", spy)

    cfg = tiny_test_config(
        diffaug="cutout", gan_loss="lsgan", donate_state=False
    )
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    g_opt, d_opt = make_optimizer(cfg), gan._d_optimizer(cfg)
    a, b = _x(2, cfg.size), _x(2, cfg.size)
    rng = jax.random.PRNGKey(7)  # SAME rng both steps, as the runner does
    state, _ = gan.gan_train_step(cfg, g_opt, d_opt, state, a, b, rng)
    n = len(seen)
    state, _ = gan.gan_train_step(cfg, g_opt, d_opt, state, a, b, rng)
    assert n and len(seen) == 2 * n
    assert set(seen[:n]).isdisjoint(seen[n:])
