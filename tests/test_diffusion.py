"""Tests for the diffusion algebra: forward process, targets, and the
round-trip identities that the reference's inversion/sampling loops rely on
(reference train.py:223-272, 325-355, 369-496)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.core import diffusion
from gan_class_transfer2_tpu.core.schedule import alpha_dash


def _data(shape=(2, 4, 4, 3), seed=0):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=shape), jnp.float32)
    eps = jnp.asarray(r.normal(size=shape), jnp.float32)
    return x, eps


def test_forward_diffuse_matches_formula():
    cfg = tiny_test_config()
    x, eps = _data()
    t = jnp.asarray([[[[3.0]]], [[[7.0]]]])
    got = diffusion.forward_diffuse(cfg, x, eps, t)
    ad = alpha_dash(t, cfg.steps, cfg.schedule)
    want = x * ad**0.5 + eps * (1 - ad) ** 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("param", ["x", "epsilon", "scaled_epsilon", "ode"])
def test_training_target_shapes(param):
    cfg = tiny_test_config(parameterization=param)
    x, eps = _data()
    t = jnp.full((2, 1, 1, 1), 5.0)
    target, scale = diffusion.training_target(cfg, x, eps, t)
    assert target.shape == x.shape
    if param == "x":
        np.testing.assert_allclose(np.asarray(target), np.asarray(x))
    if param == "epsilon":
        np.testing.assert_allclose(np.asarray(target), np.asarray(eps))


def test_prediction_weighting_scales_both_sides():
    cfg = tiny_test_config(parameterization="epsilon", prediction_weighting=True)
    x, eps = _data()
    t = jnp.full((2, 1, 1, 1), 5.0)
    target, scale = diffusion.training_target(cfg, x, eps, t)
    ad = alpha_dash(t, cfg.steps, cfg.schedule)
    np.testing.assert_allclose(
        np.asarray(target), np.asarray(eps * (1 - ad) ** 0.5), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(scale), np.asarray((1 - ad) ** 0.5), rtol=1e-6
    )


@pytest.mark.parametrize("param", ["x", "epsilon", "scaled_epsilon"])
def test_step_update_roundtrip_with_oracle(param):
    """If the model predicted its target perfectly, step_update must recover
    the true (x, ε) that generated the noised input — the algebraic inverse of
    forward_diffuse + training_target."""
    cfg = tiny_test_config(parameterization=param)
    x, eps = _data()
    t = 4.0
    fake = diffusion.forward_diffuse(cfg, x, eps, t)
    perfect_prediction, _ = diffusion.training_target(
        cfg, x, eps, jnp.asarray(t)
    )
    x_theta, eps_theta = diffusion.step_update(
        cfg, perfect_prediction, fake, eps, t
    )
    np.testing.assert_allclose(np.asarray(x_theta), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_theta), np.asarray(eps), atol=1e-4)


def test_step_update_ode_recovers_x_and_keeps_eps_stale():
    cfg = tiny_test_config(parameterization="ode")
    x, eps = _data()
    t = 4.0
    fake = diffusion.forward_diffuse(cfg, x, eps, t)
    perfect_prediction, _ = diffusion.training_target(cfg, x, eps, jnp.asarray(t))
    stale = jnp.ones_like(eps) * 99.0
    x_theta, eps_theta = diffusion.step_update(
        cfg, perfect_prediction, fake, stale, t
    )
    np.testing.assert_allclose(np.asarray(x_theta), np.asarray(x), atol=1e-4)
    # ε_θ intentionally untouched in ODE mode (reference train.py:382-392 quirk)
    np.testing.assert_allclose(np.asarray(eps_theta), np.asarray(stale))


@pytest.mark.parametrize("param", ["x", "epsilon", "scaled_epsilon", "ode"])
def test_preview_denoise_oracle(param):
    cfg = tiny_test_config(parameterization=param)
    x, eps = _data(shape=(1, 4, 4, 3))
    factor = diffusion.preview_image_factor(cfg)
    noised = x * factor**0.5 + eps * (1 - factor) ** 0.5
    if param == "x":
        prediction = x
    elif param == "epsilon":
        prediction = eps
    elif param == "scaled_epsilon":
        prediction = eps * (1 - factor) ** 0.5
    else:  # ode — preview inverts the t = T/2 target (reference train.py:338-347)
        t = cfg.steps / 2
        ad, ad_prev = (
            alpha_dash(t, cfg.steps, cfg.schedule),
            alpha_dash(t - 1, cfg.steps, cfg.schedule),
        )
        # In ODE preview the "noised" input uses factor = ᾱ(T/2)**0.5 while
        # the inversion algebra assumes the t=T/2 mixture; build the exact
        # consistent pair here.
        noised = x * ad**0.5 + eps * (1 - ad) ** 0.5
        prediction = x * ad_prev**0.5 + eps * (1 - ad_prev) ** 0.5
    denoised = diffusion.preview_denoise(cfg, noised, prediction)
    np.testing.assert_allclose(np.asarray(denoised), np.asarray(x), atol=1e-4)


def test_renoise_is_forward_diffuse():
    cfg = tiny_test_config()
    x, eps = _data()
    np.testing.assert_allclose(
        np.asarray(diffusion.renoise(cfg, x, eps, 3.0)),
        np.asarray(diffusion.forward_diffuse(cfg, x, eps, 3.0)),
    )


def test_fused_diffusion_cpu_fallback_statistics():
    """Off-TPU, forward_diffuse_fused falls back to the plain jnp path —
    Pallas interpret mode stubs the PRNG to zeros (a CONSTANT epsilon) on
    some builds and raises on others (review r4). The fallback must have
    the right mixture statistics."""
    import jax

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.ops import kernels

    if jax.default_backend() == "tpu":
        import pytest as _pytest

        _pytest.skip("exercises the off-TPU fallback")
    cfg = tiny_test_config()
    t = jnp.full((64, 1, 1, 1), cfg.steps / 2.0, jnp.float32)
    x = jnp.zeros((64, cfg.size, cfg.size, 3), jnp.float32)
    noised = kernels.forward_diffuse_fused(cfg, x, t, jax.random.PRNGKey(0))
    from gan_class_transfer2_tpu.core.schedule import alpha_dash

    sn = float((1.0 - alpha_dash(cfg.steps / 2.0, cfg.steps, cfg.schedule)) ** 0.5)
    std = float(jnp.std(noised))
    assert abs(std - sn) / sn < 0.05  # N(0, sn²) mixture, not constant
