"""Normalization ops (GAN-mode; the reference model has none — SURVEY §2.2,
the parity default keeps d_norm=g_norm='none')."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.ops import norm as norm_ops


def _x(b=2, h=8, w=8, c=128, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.normal(2.0, 3.0, (b, h, w, c)).astype(np.float32))


def test_instance_norm_statistics():
    x = _x()
    g = jnp.ones((128,))
    b = jnp.zeros((128,))
    y = np.asarray(norm_ops.instance_norm(x, g, b))
    m = y.mean(axis=(1, 2))
    v = y.var(axis=(1, 2))
    np.testing.assert_allclose(m, 0.0, atol=1e-4)
    np.testing.assert_allclose(v, 1.0, atol=1e-3)


def test_instance_norm_affine():
    x = _x()
    g = jnp.full((128,), 2.0)
    b = jnp.full((128,), -1.0)
    y = np.asarray(norm_ops.instance_norm(x, g, b))
    np.testing.assert_allclose(y.mean(axis=(1, 2)), -1.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(1, 2)), 2.0, atol=1e-3)


def test_instance_norm_pallas_matches_ref():
    x = _x(seed=3)
    r = np.random.default_rng(4)
    g = jnp.asarray(r.normal(1, 0.2, (128,)).astype(np.float32))
    b = jnp.asarray(r.normal(0, 0.2, (128,)).astype(np.float32))
    y_ref = norm_ops._instance_norm_ref(x, g, b)
    y_pal = norm_ops._instance_norm_pallas(x, g, b, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=2e-5)


def test_instance_norm_custom_vjp_matches_autodiff():
    x = _x(b=2, h=4, w=4, c=8, seed=5)
    r = np.random.default_rng(6)
    g = jnp.asarray(r.normal(1, 0.2, (8,)).astype(np.float32))
    b = jnp.asarray(r.normal(0, 0.2, (8,)).astype(np.float32))

    def f_custom(x, g, b):
        return jnp.sum(norm_ops.instance_norm(x, g, b) ** 2)

    def f_ref(x, g, b):
        return jnp.sum(norm_ops._instance_norm_ref(x, g, b) ** 2)

    g1 = jax.grad(f_custom, argnums=(0, 1, 2))(x, g, b)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, g, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-3, rtol=1e-4)


def test_batch_norm_statistics():
    x = _x()
    y = np.asarray(norm_ops.batch_norm(x, jnp.ones((128,)), jnp.zeros((128,))))
    np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.var(axis=(0, 1, 2)), 1.0, atol=1e-3)


def test_unet_g_norm_forward_and_params():
    from gan_class_transfer2_tpu.models import unet

    cfg = tiny_test_config(g_norm="instance")
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    assert "down_norm" in params["octaves"][0]
    assert "up_norm" in params["octaves"][0]
    x = _x(2, cfg.size, cfg.size, 3)
    y = unet.unet_apply(cfg, params, x)
    assert y.shape == (2, cfg.size, cfg.size, 3)
    assert np.isfinite(np.asarray(y)).all()

    # parity default: no norm params, exact reference param count preserved
    cfg0 = tiny_test_config()
    p0 = unet.init_unet(jax.random.PRNGKey(0), cfg0)
    assert "down_norm" not in p0["octaves"][0]


def test_gan_step_with_norms():
    from gan_class_transfer2_tpu.train import gan

    cfg = tiny_test_config(
        d_norm="instance", g_norm="instance", donate_state=False,
        learning_rate=1e-4,
    )
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    step = gan.make_gan_train_step(cfg)
    r = np.random.default_rng(0)
    a = jnp.asarray(r.uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)).astype(np.float32))
    b = jnp.asarray(r.uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)).astype(np.float32))
    state, metrics = step(state, a, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["g_loss"]))
    assert np.isfinite(float(metrics["d_loss"]))


def test_bad_norm_rejected():
    import pytest

    with pytest.raises(ValueError, match="unknown norm"):
        tiny_test_config(d_norm="banana").validate()
