"""Smoke tier — `pytest -m smoke` (VERDICT r3 #7).

One end-to-end path per subsystem, budgeted to finish in < 2 minutes COLD
(empty compilation cache) on this 1-core host. The trick: every test shares
ONE tiny config, so the run compiles exactly three distinct XLA programs
(train step, reverse-diffusion sampler, DP-sharded step) and everything else
rides those or is pure host code.

Covered subsystems: numerics (schedule + diffusion algebra), model + trainer
(loss moves under real updates), data pipeline (decode/augment/normalize),
checkpoint save/restore, sampler, data-parallel mesh step, run driver
(Runner.fit end-to-end with checkpointing), observability (event-file
round-trip), config/CLI surface. Serving and the Pallas kernels are
deliberately NOT here — they carry their own compile budgets; see
tests/test_serve*.py and tests/test_kernels.py.

Time a cold run with a throwaway cache:
    GCT2_TEST_CACHE_DIR=$(mktemp -d) python -m pytest -m smoke -q
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.core import diffusion, schedule
from gan_class_transfer2_tpu.train import trainer as trainer_lib

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def trained(cfg):
    """One compiled train step driven 4 steps — shared by the checkpoint,
    sampler, and driver tests so the program compiles once."""
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer_lib.make_train_step(cfg.replace(donate_state=False))
    batch = jnp.asarray(
        np.random.default_rng(0)
        .uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3))
        .astype(np.float32)
    )
    losses = []
    for i in range(4):
        state, loss = step(state, batch, jax.random.PRNGKey(i + 1))
        losses.append(float(loss))
    return state, losses, batch


def test_numerics_schedule_and_diffusion(cfg):
    # active quadratic schedule endpoints (SURVEY §2.1 row 6)
    assert abs(float(schedule.alpha_dash(1.0, 200)) - 0.24751) < 1e-4
    assert float(schedule.alpha_dash(200.0, 200)) < 1e-5
    # forward diffusion matches the closed form (reference train.py:231-234)
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=(2, cfg.size, cfg.size, 3)), jnp.float32)
    eps = jnp.asarray(r.normal(size=x.shape), jnp.float32)
    t = jnp.asarray([[[[3.0]]], [[[7.0]]]], jnp.float32)
    a = schedule.alpha_dash(t, cfg.steps)
    got = diffusion.forward_diffuse(cfg, x, eps, t)
    want = x * jnp.sqrt(a) + eps * jnp.sqrt(1 - a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_trainer_step_updates_and_loss_finite(trained):
    state, losses, _ = trained
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] != losses[0]  # params actually moved
    assert int(state.step) == 4


def test_checkpoint_roundtrip(cfg, trained, tmp_path):
    from gan_class_transfer2_tpu.utils import checkpoint

    state, _, _ = trained
    d = str(tmp_path / "ckpt")
    checkpoint.save(d, state, cfg, step=int(state.step))
    assert checkpoint.latest_step(d) == int(state.step)
    like = trainer_lib.init_state(cfg, jax.random.PRNGKey(42))
    restored = checkpoint.restore(d, like)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_pipeline_decode_augment_normalize(cfg, tmp_path):
    from PIL import Image

    from gan_class_transfer2_tpu.data import pipeline

    r = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            r.integers(0, 256, (cfg.size + 4, cfg.size + 4, 3), dtype=np.uint8)
        ).save(tmp_path / f"img_{i}.png")
    ds = pipeline.ImageDataset(
        str(tmp_path / "*.png"), size=cfg.size, batch_size=cfg.batch_size
    )
    batch = next(iter(ds))
    assert batch.shape == (cfg.batch_size, cfg.size, cfg.size, 3)
    assert batch.dtype == np.float32
    # /128 - 1 normalization (reference train.py:292)
    assert batch.min() >= -1.0 and batch.max() <= 127 / 128 + 1e-6
    ds.close() if hasattr(ds, "close") else None


def test_sampler_end_to_end(cfg, trained):
    from gan_class_transfer2_tpu.sample import sampler

    state, _, _ = trained
    init = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, cfg.size, cfg.size, 3)),
        jnp.float32,
    )
    out = sampler.sample(cfg, state.params, init)
    assert out.images.shape == init.shape
    assert out.snapshots.shape == (4,) + init.shape
    assert np.all(np.isfinite(np.asarray(out.images)))


def test_parallel_dp_step(cfg):
    from gan_class_transfer2_tpu.parallel import mesh as mesh_lib

    n = min(2, jax.device_count())
    if n < 2:
        pytest.skip("needs >= 2 devices (conftest provides 8 virtual)")
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:n], data=n, model=1)
    p_cfg = cfg.replace(mesh_data=n, donate_state=False)
    state = mesh_lib.init_sharded_state(p_cfg, mesh, jax.random.PRNGKey(0))
    step = mesh_lib.make_parallel_train_step(p_cfg, mesh)
    batch = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0)
            .uniform(-1, 1, (p_cfg.batch_size, cfg.size, cfg.size, 3))
            .astype(np.float32)
        ),
        mesh_lib.batch_sharding(mesh),
    )
    _, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_run_driver_fit_with_checkpointing(cfg, tmp_path):
    """Runner.fit end-to-end: data -> train step -> checkpoint, no eval
    (the eval program has its own compile budget; test_loop covers it)."""
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset
    from gan_class_transfer2_tpu.train.loop import Runner

    r = np.random.default_rng(3)
    images = r.uniform(-1, 1, (8, cfg.size, cfg.size, 3)).astype(np.float32)
    run_cfg = cfg.replace(
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2,
        donate_state=False,
        mesh_data=1,  # single-device: reuse the `trained` fixture's program
    )
    runner = Runner(run_cfg, dataset=ArrayDataset(images, cfg.batch_size))
    runner.fit(epochs=1, steps_per_epoch=2, log_samples=False)
    from gan_class_transfer2_tpu.utils import checkpoint

    assert checkpoint.latest_step(run_cfg.checkpoint_dir) == 2
    runner.close()


def test_observability_event_roundtrip(tmp_path):
    from gan_class_transfer2_tpu.utils import tensorboard as tb

    w = tb.SummaryWriter(str(tmp_path / "tb"))
    w.scalar("example loss", 0.5, step=1)
    w.image("fake", np.zeros((1, 4, 4, 3), np.float32), step=1)
    w.close()
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(tmp_path / "tb")
        for f in fs
    ]
    assert len(files) == 1
    tags = {e[1] for e in tb.read_events(files[0])}
    assert "example loss" in tags
    assert any(t.startswith("fake") for t in tags), tags


def test_config_cli_surface(cfg):
    from gan_class_transfer2_tpu.config import Config

    # JSON round trip and validation errors are the CLI's backbone
    c2 = Config.from_json(cfg.to_json())
    assert c2 == cfg
    with pytest.raises(ValueError, match="schedule"):
        cfg.replace(schedule="banana").validate()
    with pytest.raises(ValueError, match="octaves"):
        cfg.replace(size=20, octaves=3).validate()
