"""Pallas fused-diffusion kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pallas prng_random_bits is stubbed (zeros) in CPU interpret mode; "
    "run with GCT2_TEST_PLATFORM=tpu on hardware",
)

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.core.schedule import alpha_dash
from gan_class_transfer2_tpu.ops import kernels


def test_fused_diffuse_statistics():
    """noised = x·ss + ε·sn with ε ~ N(0,1): check mean/var of the implied ε."""
    b, n = 4, 2048
    x = jnp.zeros((b, n), jnp.float32)
    ss = jnp.ones((b,), jnp.float32) * 0.5
    sn = jnp.ones((b,), jnp.float32) * 2.0
    out = kernels.fused_forward_diffuse(x, ss, sn, False, seed=7)
    eps = np.asarray(out) / 2.0
    assert abs(eps.mean()) < 0.05
    assert abs(eps.std() - 1.0) < 0.05


def test_fused_diffuse_respects_scales():
    b, n = 2, 512
    x = jnp.ones((b, n), jnp.float32) * 3.0
    ss = jnp.asarray([1.0, 0.0], jnp.float32)
    sn = jnp.asarray([0.0, 1.0], jnp.float32)
    out = np.asarray(kernels.fused_forward_diffuse(x, ss, sn, False, seed=1))
    np.testing.assert_allclose(out[0], 3.0, atol=1e-6)  # pure signal
    assert abs(out[1].std() - 1.0) < 0.15  # pure noise


def test_fused_diffuse_blocks_decorrelated():
    b, n = 1, 4096
    x = jnp.zeros((b, n), jnp.float32)
    ss = jnp.zeros((b,), jnp.float32)
    sn = jnp.ones((b,), jnp.float32)
    out = np.asarray(
        kernels.fused_forward_diffuse(x, ss, sn, False, seed=3)
    ).reshape(-1)
    # different seeds give different draws
    out2 = np.asarray(
        kernels.fused_forward_diffuse(x, ss, sn, False, seed=4)
    ).reshape(-1)
    assert not np.allclose(out, out2)


def test_fused_diffuse_gradient():
    b, n = 2, 256
    x = jnp.asarray(np.random.default_rng(0).normal(size=(b, n)), jnp.float32)
    ss = jnp.asarray([0.5, 0.25], jnp.float32)
    sn = jnp.asarray([0.1, 0.2], jnp.float32)

    def f(x):
        return jnp.sum(kernels.fused_forward_diffuse(x, ss, sn, False, seed=2))

    g = jax.grad(f)(x)
    # d out / d x = scale_signal per sample
    np.testing.assert_allclose(np.asarray(g)[0], 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g)[1], 0.25, atol=1e-6)


def test_forward_diffuse_fused_wrapper():
    cfg = tiny_test_config()
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(-1, 1, (2, cfg.size, cfg.size, 3)), jnp.float32)
    t = jnp.full((2, 1, 1, 1), 3.0)
    out = kernels.forward_diffuse_fused(cfg, x, t, jax.random.PRNGKey(0), interpret=False)
    assert out.shape == x.shape
    # variance check: Var = ad·Var(x) + (1-ad)
    ad = float(alpha_dash(3.0, cfg.steps, cfg.schedule))
    residual = np.asarray(out) - np.asarray(x) * ad**0.5
    assert abs(residual.std() - (1 - ad) ** 0.5) < 0.05
