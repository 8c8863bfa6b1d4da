"""Class-conditional generator tests (BASELINE config 5 capability)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.models import conditional


def test_conditional_output_depends_on_class():
    cfg = tiny_test_config()
    params = conditional.init_conditional_unet(
        jax.random.PRNGKey(0), cfg, num_classes=4
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, cfg.size, cfg.size, 3)),
        jnp.float32,
    )
    y0 = conditional.conditional_unet_apply(cfg, params, x, jnp.asarray([0, 0]))
    y1 = conditional.conditional_unet_apply(cfg, params, x, jnp.asarray([1, 1]))
    assert y0.shape == (2, cfg.size, cfg.size, 3)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_conditional_same_class_same_output():
    cfg = tiny_test_config()
    params = conditional.init_conditional_unet(
        jax.random.PRNGKey(0), cfg, num_classes=4
    )
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (2, cfg.size, cfg.size, 3)),
        jnp.float32,
    )
    y = conditional.conditional_unet_apply(cfg, params, x, jnp.asarray([2, 2]))
    y2 = conditional.conditional_unet_apply(cfg, params, x, jnp.asarray([2, 2]))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_conditional_gradients_flow_to_embedding():
    cfg = tiny_test_config()
    params = conditional.init_conditional_unet(
        jax.random.PRNGKey(0), cfg, num_classes=4
    )
    x = jnp.ones((1, cfg.size, cfg.size, 3))

    def loss(p):
        return jnp.mean(
            conditional.conditional_unet_apply(cfg, p, x, jnp.asarray([1])) ** 2
        )

    g = jax.grad(loss)(params)
    ge = np.asarray(g["embed"])
    assert np.abs(ge[1]).sum() > 0  # selected class gets gradient
    assert np.abs(ge[0]).sum() == 0  # unselected classes don't
