"""Multi-class conditional GAN (StarGAN-style) tests — BASELINE config 5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.train import conditional_gan as cgan


def _cfg(**kw):
    base = dict(
        num_classes=3, learning_rate=1e-4, ema_decay=0.9,
        gan_loss="lsgan", donate_state=False,
    )
    base.update(kw)
    return tiny_test_config(**base)


def _batch(cfg, seed=0):
    r = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(
            r.uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)), jnp.float32
        ),
        "label": jnp.asarray(
            r.integers(0, cfg.num_classes, cfg.batch_size), jnp.int32
        ),
    }


def test_requires_multiple_classes():
    with pytest.raises(ValueError):
        cgan.init_conditional_gan_state(
            tiny_test_config(num_classes=0), jax.random.PRNGKey(0)
        )


def test_step_runs_and_updates():
    cfg = _cfg()
    state = cgan.init_conditional_gan_state(cfg, jax.random.PRNGKey(0))
    step = cgan.make_conditional_gan_train_step(cfg)
    head0 = np.asarray(state.generator["unet"]["head"]["kernel"])
    for i in range(2):
        state, metrics = step(state, _batch(cfg, i), jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 2
    assert not np.allclose(head0, np.asarray(state.generator["unet"]["head"]["kernel"]))
    # EMA exists and lags
    assert state.ema_generator is not None
    assert not np.allclose(
        np.asarray(state.ema_generator["unet"]["head"]["kernel"]),
        np.asarray(state.generator["unet"]["head"]["kernel"]),
    )


def test_transfer_by_target_class():
    cfg = _cfg()
    state = cgan.init_conditional_gan_state(cfg, jax.random.PRNGKey(0))
    x = _batch(cfg)["image"]
    y0 = cgan.transfer(cfg, state, x, 0)
    y1 = cgan.transfer(cfg, state, x, 1)
    assert y0.shape == x.shape
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    # per-sample targets
    y_mixed = cgan.transfer(cfg, state, x, jnp.asarray([0, 1]))
    np.testing.assert_allclose(np.asarray(y_mixed[0]), np.asarray(y0[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_mixed[1]), np.asarray(y1[1]), atol=1e-6)


def test_conditional_gan_runner_end_to_end(tmp_path):
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset
    from gan_class_transfer2_tpu.train.conditional_gan_loop import (
        ConditionalGANRunner,
    )
    from gan_class_transfer2_tpu.utils import tensorboard as tb

    cfg = _cfg(
        steps_per_epoch=2, epochs=1,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2, mesh_data=1,
        classes=("a", "b", "c"),
    )
    r = np.random.default_rng(0)
    mk = lambda s: ArrayDataset(
        r.integers(0, 256, (6, cfg.size, cfg.size, 3), dtype=np.uint8), cfg.batch_size, seed=s
    )
    runner = ConditionalGANRunner(cfg, datasets=[mk(0), mk(1), mk(2)])
    runner.fit(epochs=1, steps_per_epoch=2)
    runner.close()
    tags = {e[1] for e in tb.read_events(runner.writer.path)}
    for t in ("transfer_to_0/image/0", "transfer_to_1/image/0", "transfer_to_2/image/0", "g_loss"):
        assert t in tags, (t, tags)
    import os

    assert os.path.isdir(os.path.join(cfg.checkpoint_dir, "step_000000002"))


def test_reconstruction_weight_active_in_conditional_mode():
    """cfg.reconstruction_weight was silently ignored by the conditional
    step (review r4) — it must change the generator loss."""
    import numpy as np

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train import conditional_gan as cgan

    cfg0 = tiny_test_config(
        num_classes=3, learning_rate=1e-4, donate_state=False,
        reconstruction_weight=0.0,
    )
    cfg5 = cfg0.replace(reconstruction_weight=5.0)
    r = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            r.uniform(-1, 1, (cfg0.batch_size, cfg0.size, cfg0.size, 3)),
            jnp.float32,
        ),
        "label": jnp.zeros((cfg0.batch_size,), jnp.int32),
    }
    losses = {}
    for name, cfg in (("off", cfg0), ("on", cfg5)):
        state = cgan.init_conditional_gan_state(cfg, jax.random.PRNGKey(0))
        step = cgan.make_conditional_gan_train_step(cfg)
        _, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses[name] = float(metrics["g_loss"])
    assert losses["on"] != losses["off"]
