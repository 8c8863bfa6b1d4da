"""GAN-mode tests: G/D init, adversarial losses, one full cycle-GAN step
(BASELINE.json north-star capabilities; no reference counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.models import discriminator as d_lib
from gan_class_transfer2_tpu.train import gan


def _cfg(**kw):
    base = dict(learning_rate=1e-4, ema_decay=0.99, donate_state=False)
    base.update(kw)
    return tiny_test_config(**base)


def _batches(cfg, seed=0):
    r = np.random.default_rng(seed)
    a = jnp.asarray(r.uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)), jnp.float32)
    b = jnp.asarray(r.uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)), jnp.float32)
    return a, b


def test_discriminator_shapes():
    cfg = _cfg()
    params = d_lib.init_discriminator(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, cfg.size, cfg.size, 3))
    logits = d_lib.discriminator_apply(cfg, params, x)
    s = cfg.size // (2 ** (cfg.d_octaves or cfg.octaves))
    assert logits.shape == (2, s, s, 1)  # PatchGAN
    cfg2 = _cfg(patch_discriminator=False)
    logits = d_lib.discriminator_apply(cfg2, params, x)
    assert logits.shape == (2, 1)


def test_class_conditional_discriminator():
    cfg = _cfg()
    params = d_lib.init_discriminator(jax.random.PRNGKey(0), cfg, num_classes=3)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, cfg.size, cfg.size, 3)),
        jnp.float32,
    )
    l0 = d_lib.discriminator_apply(cfg, params, x, jnp.asarray([0, 0]))
    l1 = d_lib.discriminator_apply(cfg, params, x, jnp.asarray([1, 1]))
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


@pytest.mark.parametrize("loss", ["nonsaturating", "lsgan", "hinge"])
def test_gan_step_runs(loss):
    cfg = _cfg(gan_loss=loss)
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    step = gan.make_gan_train_step(cfg)
    a, b = _batches(cfg)
    state, metrics = step(state, a, b, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 1


def test_gan_params_update_and_ema_lags():
    cfg = _cfg()
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    step = gan.make_gan_train_step(cfg)
    a, b = _batches(cfg)
    head0 = np.asarray(state.g_ab["head"]["kernel"])
    for i in range(2):
        state, _ = step(state, a, b, jax.random.PRNGKey(i))
    head1 = np.asarray(state.g_ab["head"]["kernel"])
    assert not np.allclose(head0, head1)  # G updated
    ema = np.asarray(state.ema_g_ab["head"]["kernel"])
    assert not np.allclose(ema, head1)  # EMA lags params


def test_transfer_directions():
    cfg = _cfg()
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    a, _ = _batches(cfg)
    out_ab = gan.transfer(cfg, state, a, "ab")
    out_ba = gan.transfer(cfg, state, a, "ba")
    assert out_ab.shape == a.shape
    assert not np.allclose(np.asarray(out_ab), np.asarray(out_ba))


def test_identity_warm_generator_prefers_identity():
    """With overwhelming identity weight, a few steps should reduce
    ‖G(b) − b‖ (sanity that gradients flow through the right terms)."""
    cfg = _cfg(
        identity_weight=10.0, cycle_weight=0.0, adversarial_weight=0.0,
        learning_rate=1e-3,
    )
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    step = gan.make_gan_train_step(cfg)
    a, b = _batches(cfg)

    def ident_err(state):
        out = gan.transfer(cfg, state, b, "ab", use_ema=False)
        return float(jnp.mean(jnp.abs(out - b)))

    before = ident_err(state)
    for i in range(10):
        state, _ = step(state, a, b, jax.random.PRNGKey(i))
    after = ident_err(state)
    assert after < before


def _traced_conv_count(cfg):
    """conv ops in the traced (pre-optimization) step program."""
    from gan_class_transfer2_tpu.train.trainer import make_optimizer

    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    a, b = _batches(cfg)
    jaxpr = jax.make_jaxpr(
        lambda s, x, y, k: gan.gan_train_step(
            cfg, make_optimizer(cfg), gan._d_optimizer(cfg), s, x, y, k
        )
    )(state, a, b, jax.random.PRNGKey(1))
    return str(jaxpr).count("conv_general_dilated")


def test_zero_weight_terms_are_elided():
    """cycle/identity at weight 0 must not be computed at all — each costs
    two full U-Net forwards that XLA cannot DCE while the value feeds the
    metrics dict. Disabled terms report 0 in metrics instead."""
    full = _traced_conv_count(_cfg())
    no_ident = _traced_conv_count(_cfg(identity_weight=0.0))
    no_both = _traced_conv_count(_cfg(identity_weight=0.0, cycle_weight=0.0))
    assert no_ident < full
    assert no_both < no_ident

    cfg = _cfg(identity_weight=0.0, cycle_weight=0.0)
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    a, b = _batches(cfg)
    step = gan.make_gan_train_step(cfg)
    _, metrics = step(state, a, b, jax.random.PRNGKey(1))
    assert float(metrics["cycle"]) == 0.0
    assert float(metrics["identity"]) == 0.0


def test_gan_ema_gated_under_grad_accum():
    """Under grad_accum the EMA must move ONLY on applied optimizer updates
    (trainer.ema_update's gate) — the old ungated blend decayed toward
    unchanged params every micro-step, compounding the effective decay to
    d^accum (review r4)."""
    cfg = _cfg(grad_accum=2, ema_decay=0.5)
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    step = gan.make_gan_train_step(cfg)
    a, b = _batches(cfg)
    ema0 = np.asarray(state.ema_g_ab["head"]["kernel"])
    state, _ = step(state, a, b, jax.random.PRNGKey(1))  # micro-step 1: no-op
    np.testing.assert_array_equal(
        np.asarray(state.ema_g_ab["head"]["kernel"]), ema0
    )
    state, _ = step(state, a, b, jax.random.PRNGKey(2))  # window closes
    assert not np.allclose(
        np.asarray(state.ema_g_ab["head"]["kernel"]), ema0
    )


def test_gan_step_normalizes_uint8_batches():
    """Cached uint8 batches must go through the on-device crop/flip/
    normalize like the diffusion step — raw 0..255 pixels previously fed
    the generators directly (review r4)."""
    cfg = _cfg()
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    step = gan.make_gan_train_step(cfg)
    r = np.random.default_rng(0)
    store = cfg.size + cfg.size // 8
    a = jnp.asarray(
        r.integers(0, 256, (cfg.batch_size, store, store, 3)), jnp.uint8
    )
    b = jnp.asarray(
        r.integers(0, 256, (cfg.batch_size, store, store, 3)), jnp.uint8
    )
    state, metrics = step(state, a, b, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_select_generator_rejects_bad_direction():
    cfg = _cfg()
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="direction"):
        gan.select_generator(state, "AB")
