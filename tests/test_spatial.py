"""Spatial (height) sharding parity tests on the virtual 8-device CPU mesh:
halo-exchange + VALID conv must equal the unsharded TF-'SAME' k4/s2 conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gan_class_transfer2_tpu.ops import conv as conv_ops
from gan_class_transfer2_tpu.parallel import spatial


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:4]), ("spatial",))


def test_sharded_down_conv_matches_unsharded(mesh, rng=None):
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 32, 16, 3)), jnp.float32)
    k = jnp.asarray(r.normal(size=(4, 4, 3, 5)), jnp.float32)
    b = jnp.asarray(r.normal(size=(5,)), jnp.float32)

    want = conv_ops.conv2d(x, k, b, stride=2, relu=True)

    fn = spatial.make_spatial_down_conv(mesh)
    xs = jax.device_put(x, spatial.spatial_sharding(mesh))
    got = fn(xs, k, b)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # output stays height-sharded
    assert got.sharding.spec == P(None, "spatial", None, None)


def test_halo_exchange_contents(mesh):
    """Each shard sees exactly [last row of prev | own rows | first row of
    next], zeros at the boundaries."""
    from jax import shard_map

    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1, 1)
    x = jnp.broadcast_to(x, (1, 8, 2, 1))

    fn = shard_map(
        lambda v: spatial.halo_exchange(v, "spatial"),
        mesh=mesh,
        in_specs=P(None, "spatial", None, None),
        out_specs=P(None, "spatial", None, None),
    )
    xs = jax.device_put(x, spatial.spatial_sharding(mesh))
    out = np.asarray(jax.jit(fn)(xs))  # (1, 4*(2+2), 2, 1)
    shards = out.reshape(4, 4, 2)[:, :, 0]  # rows per shard
    # shard 0 owns rows [0,1]: halo = [0(zero), 0, 1, 2]
    np.testing.assert_array_equal(shards[0], [0, 0, 1, 2])
    # shard 1 owns [2,3]: halo = [1, 2, 3, 4]
    np.testing.assert_array_equal(shards[1], [1, 2, 3, 4])
    # shard 3 owns [6,7]: halo = [5, 6, 7, 0(zero)]
    np.testing.assert_array_equal(shards[3], [5, 6, 7, 0])


def test_halo_exchange_zero_rows():
    """lo=0 must contribute an EMPTY halo — x[:, -0:] would prepend the
    whole previous shard (review r4)."""
    import numpy as np
    from jax.sharding import Mesh

    from gan_class_transfer2_tpu.parallel import spatial

    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs), ("spatial",))
    x = jnp.arange(4 * 8 * 4 * 1, dtype=jnp.float32).reshape(4, 8, 4, 1)
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    fn = shard_map(
        lambda b: spatial.halo_exchange(b, "spatial", lo=0, hi=1),
        mesh=mesh, in_specs=P(None, "spatial"),
        out_specs=P(None, "spatial"), check_vma=False,
    )
    out = np.asarray(fn(x))
    # per shard: 2 own rows + 1 bottom halo = 3; global = 12 rows
    assert out.shape == (4, 12, 4, 1)


def test_spatial_down_conv_rejects_odd_shard_height():
    import numpy as np
    import pytest as _pytest
    from jax.sharding import Mesh

    from gan_class_transfer2_tpu.parallel import spatial
    from gan_class_transfer2_tpu.ops import init as init_ops

    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs), ("spatial",))
    fn = spatial.make_spatial_down_conv(mesh)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 20, 16, 3)), jnp.float32)  # 5/shard
    k = jnp.asarray(r.normal(size=(4, 4, 3, 8)), jnp.float32)
    with _pytest.raises(ValueError, match="even per-shard height"):
        fn(jax.device_put(x, spatial.spatial_sharding(mesh)), k,
           jnp.zeros((8,), jnp.float32))


def test_spatial_train_rejects_conditional_model():
    import pytest as _pytest

    from gan_class_transfer2_tpu.parallel import spatial_train

    from gan_class_transfer2_tpu.config import tiny_test_config

    cfg = tiny_test_config(num_classes=3)
    mesh = spatial_train.make_dp_spatial_mesh(2, 2)
    with _pytest.raises(ValueError, match="unconditional"):
        spatial_train.make_dp_spatial_train_step(cfg, mesh)
