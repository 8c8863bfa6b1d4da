"""Multi-device tests on the virtual 8-device CPU mesh (conftest.py sets
xla_force_host_platform_device_count=8): DP batch sharding, TP kernel
sharding, parity of sharded vs single-device steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.parallel import mesh as mesh_lib
from gan_class_transfer2_tpu.train import trainer


def _batch(cfg, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(
        r.uniform(-1, 1, size=(cfg.batch_size, cfg.size, cfg.size, 3)), jnp.float32
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = mesh_lib.make_mesh(data=4, model=2)
    assert m.shape == {"data": 4, "model": 2}
    m = mesh_lib.make_mesh()  # all devices on data
    assert m.shape == {"data": 8, "model": 1}


def test_dp_step_runs_and_matches_single_device():
    cfg = tiny_test_config(batch_size=8, donate_state=False)
    m = mesh_lib.make_mesh(data=8, model=1)
    state = mesh_lib.init_sharded_state(cfg, m, jax.random.PRNGKey(0))
    pstep = mesh_lib.make_parallel_train_step(cfg, m)
    batch = jax.device_put(_batch(cfg), mesh_lib.batch_sharding(m))
    new_state, loss = pstep(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # single-device oracle
    s0 = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg.replace(donate_state=False))
    s1, loss1 = step(s0, _batch(cfg), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss), float(loss1), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state.params["head"]["kernel"]),
        np.asarray(s1.params["head"]["kernel"]),
        atol=1e-5,
    )


def test_dp_tp_mesh_step_runs():
    cfg = tiny_test_config(batch_size=4, donate_state=False)
    m = mesh_lib.make_mesh(data=4, model=2)
    state = mesh_lib.init_sharded_state(cfg, m, jax.random.PRNGKey(0))
    pstep = mesh_lib.make_parallel_train_step(cfg, m)
    batch = jax.device_put(_batch(cfg), mesh_lib.batch_sharding(m))
    new_state, loss = pstep(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # a second step exercises donated-buffer reuse of sharded state
    new_state, loss2 = pstep(new_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss2))


def test_tp_kernels_actually_sharded():
    cfg = tiny_test_config(batch_size=4)
    m = mesh_lib.make_mesh(data=4, model=2)
    state = mesh_lib.init_sharded_state(cfg, m, jax.random.PRNGKey(0))
    # innermost down kernel has the widest output channels -> sharded
    k = state.params["octaves"][-1]["down"]["kernel"]
    spec = k.sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, None, None, "model")


def test_parallel_eval_runs():
    cfg = tiny_test_config(batch_size=2)
    m = mesh_lib.make_mesh(data=4, model=2)
    state = mesh_lib.init_sharded_state(cfg, m, jax.random.PRNGKey(0))
    eval_fn = mesh_lib.make_parallel_eval_fn(cfg, m)
    r = np.random.default_rng(0)
    image = jnp.asarray(r.uniform(-1, 1, (1, cfg.size, cfg.size, 3)), jnp.float32)
    noise = jnp.asarray(r.normal(size=(2, cfg.size, cfg.size, 3)), jnp.float32)
    dictionary = jnp.asarray(
        r.normal(size=(cfg.size, cfg.size, 2**cfg.bits_per_pixel, 3)), jnp.float32
    )
    out = eval_fn(state.params, image, noise, dictionary)
    assert out["fake"].shape == (6, cfg.size, cfg.size, 3)


def test_parallel_gan_step_runs():
    cfg = tiny_test_config(batch_size=4, donate_state=False, learning_rate=1e-4)
    m = mesh_lib.make_mesh(data=4, model=2)
    state = mesh_lib.init_sharded_gan_state(cfg, m, jax.random.PRNGKey(0))
    pstep = mesh_lib.make_parallel_gan_train_step(cfg, m)
    a = jax.device_put(_batch(cfg, 0), mesh_lib.batch_sharding(m))
    b = jax.device_put(_batch(cfg, 1), mesh_lib.batch_sharding(m))
    state, metrics = pstep(state, a, b, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
