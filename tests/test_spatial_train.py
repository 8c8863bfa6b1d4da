"""Spatially-sharded training step: parity with the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.parallel import spatial_train
from gan_class_transfer2_tpu.train import trainer


def test_spatial_train_step_matches_unsharded():
    cfg = tiny_test_config(size=32, pixel_size=4, max_size=8, octaves=2,
                           batch_size=2, donate_state=False,
                           fused_diffusion=False)
    mesh = spatial_train.make_spatial_mesh(4)
    r = np.random.default_rng(0)
    batch = jnp.asarray(r.uniform(-1, 1, (2, cfg.size, cfg.size, 3)), jnp.float32)

    s0 = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    s1, loss1 = step(s0, batch, jax.random.PRNGKey(1))

    s0b = trainer.init_state(cfg, jax.random.PRNGKey(0))
    pstep = spatial_train.make_spatial_train_step(cfg, mesh)
    bsh = jax.device_put(batch, spatial_train.spatial_batch_sharding(mesh))
    s2, loss2 = pstep(s0b, bsh, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s1.params["head"]["kernel"]),
        np.asarray(s2.params["head"]["kernel"]),
        atol=1e-5,
    )


def test_dp_spatial_combined_mesh_matches_unsharded():
    """2-D (data × spatial) sharding: batch AND height sharded, same math."""
    cfg = tiny_test_config(size=32, pixel_size=4, max_size=8, octaves=2,
                           batch_size=4, donate_state=False,
                           fused_diffusion=False)
    mesh = spatial_train.make_dp_spatial_mesh(2, 4)
    r = np.random.default_rng(0)
    batch = jnp.asarray(r.uniform(-1, 1, (4, cfg.size, cfg.size, 3)), jnp.float32)

    s0 = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    s1, loss1 = step(s0, batch, jax.random.PRNGKey(1))

    s0b = trainer.init_state(cfg, jax.random.PRNGKey(0))
    pstep = spatial_train.make_dp_spatial_train_step(cfg, mesh)
    bsh = jax.device_put(batch, spatial_train.dp_spatial_batch_sharding(mesh))
    s2, loss2 = pstep(s0b, bsh, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s1.params["head"]["kernel"]),
        np.asarray(s2.params["head"]["kernel"]),
        atol=1e-5,
    )
