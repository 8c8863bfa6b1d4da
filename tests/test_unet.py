"""Golden shape/param-count tests for the Denoiser U-Net against the derived
topology table in SURVEY.md §2.2 (reference train.py:175-215)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import Config, tiny_test_config
from gan_class_transfer2_tpu.models import unet


def test_default_param_count_41_7M():
    """SURVEY §2.2: the default 256² config has exactly 41,691,660 params."""
    cfg = Config()  # defaults mirror the reference
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    assert unet.param_count(params) == 41_691_660


def test_default_layer_shapes():
    cfg = Config()
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    octs = params["octaves"]
    # down channel progression 3→128→256→512→512→512→512 (SURVEY §2.2)
    downs = [o["down"]["kernel"].shape for o in octs]
    assert downs == [
        (4, 4, 3, 128),
        (4, 4, 128, 256),
        (4, 4, 256, 512),
        (4, 4, 512, 512),
        (4, 4, 512, 512),
        (4, 4, 512, 512),
    ]
    ups = [o["up"]["kernel"].shape for o in octs]
    assert ups == [
        (4, 4, 256, 64),
        (4, 4, 512, 128),
        (4, 4, 1024, 256),
        (4, 4, 1024, 512),
        (4, 4, 1024, 512),
        (4, 4, 512, 512),
    ]
    # head Dense 67→3 (64 up channels + 3 skip input channels)
    assert params["head"]["kernel"].shape == (67, 3)


def test_forward_shape_tiny():
    cfg = tiny_test_config()
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, cfg.size, cfg.size, 3))
    t = jnp.ones((2,), jnp.int32)
    y = unet.unet_apply(cfg, params, x, t)
    assert y.shape == (2, cfg.size, cfg.size, 3)


def test_t_is_ignored():
    """The reference model is unconditional on t (train.py:206-215)."""
    cfg = tiny_test_config()
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, cfg.size, cfg.size, 3)), jnp.float32)
    y1 = unet.unet_apply(cfg, params, x, jnp.asarray([1]))
    y2 = unet.unet_apply(cfg, params, x, jnp.asarray([cfg.steps]))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_block_depth_adds_convs():
    cfg = tiny_test_config(block_depth=2)
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    assert len(params["pre_block"]) == 2
    assert len(params["middle"]) == 2
    assert params["pre_block"][0]["kernel"].shape == (3, 3, 3, cfg.pixel_size)
    x = jnp.zeros((1, cfg.size, cfg.size, 3))
    y = unet.unet_apply(cfg, params, x)
    assert y.shape == (1, cfg.size, cfg.size, 3)


@pytest.mark.parametrize("mode", ["residual", "none"])
def test_skip_modes(mode):
    cfg = tiny_test_config(skip_mode=mode)
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, cfg.size, cfg.size, 3))
    y = unet.unet_apply(cfg, params, x)
    assert y.shape == (1, cfg.size, cfg.size, 3)


def test_per_step_output_head():
    cfg = tiny_test_config(per_step_output=True)
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    assert params["head"]["kernel"].shape[-1] == 3 * cfg.steps
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, cfg.size, cfg.size, 3)),
        jnp.float32,
    )
    y = unet.unet_apply(cfg, params, x, jnp.asarray([1, cfg.steps]))
    assert y.shape == (2, cfg.size, cfg.size, 3)
    # different t picks a different slice per sample
    y2 = unet.unet_apply(cfg, params, x, jnp.asarray([2, cfg.steps]))
    assert not np.allclose(np.asarray(y)[0], np.asarray(y2)[0])
    np.testing.assert_array_equal(np.asarray(y)[1], np.asarray(y2)[1])


def test_bfloat16_compute():
    cfg = tiny_test_config(compute_dtype="bfloat16")
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, cfg.size, cfg.size, 3))
    y = unet.unet_apply(cfg, params, x)
    assert y.dtype == jnp.bfloat16
    # params stay fp32 (mixed-precision semantics, reference train.py:43-45)
    assert params["head"]["kernel"].dtype == jnp.float32


def test_remat_matches_no_remat():
    cfg = tiny_test_config()
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, cfg.size, cfg.size, 3)),
        jnp.float32,
    )
    y1 = unet.unet_apply(cfg, params, x)
    y2 = unet.unet_apply(cfg.replace(remat=True), params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


@pytest.mark.parametrize("depth", [0, 2])
def test_concat_elision_matches_materialised(depth):
    """Split-kernel consumption of unmaterialised concat pairs must be
    value-identical to the explicit concatenate."""
    cfg_e = tiny_test_config(block_depth=depth, concat_elision=True)
    cfg_m = tiny_test_config(block_depth=depth, concat_elision=False)
    params = unet.init_unet(jax.random.PRNGKey(0), cfg_e)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, cfg_e.size, cfg_e.size, 3)),
        jnp.float32,
    )
    y_e = unet.unet_apply(cfg_e, params, x)
    y_m = unet.unet_apply(cfg_m, params, x)
    np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_m), atol=1e-5)


def test_concat_elision_gradients_match():
    cfg_e = tiny_test_config(concat_elision=True)
    cfg_m = tiny_test_config(concat_elision=False)
    params = unet.init_unet(jax.random.PRNGKey(0), cfg_e)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (1, cfg_e.size, cfg_e.size, 3)),
        jnp.float32,
    )
    g_e = jax.grad(lambda p: jnp.mean(unet.unet_apply(cfg_e, p, x) ** 2))(params)
    g_m = jax.grad(lambda p: jnp.mean(unet.unet_apply(cfg_m, p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_e), jax.tree_util.tree_leaves(g_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
