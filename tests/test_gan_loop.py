"""GANRunner end-to-end smoke: two synthetic class datasets, one epoch,
transfer images logged, checkpoint/resume."""

import os

import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.data.pipeline import ArrayDataset
from gan_class_transfer2_tpu.train.gan_loop import GANRunner
from gan_class_transfer2_tpu.utils import tensorboard as tb


def test_gan_runner_end_to_end(tmp_path):
    cfg = tiny_test_config(
        steps_per_epoch=2,
        epochs=1,
        learning_rate=1e-4,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2,
        donate_state=False,
        classes=("a", "b"),  # datasets injected below
        mesh_data=1,
    )
    r = np.random.default_rng(0)
    mk = lambda seed: ArrayDataset(
        r.integers(0, 256, size=(6, cfg.size, cfg.size, 3), dtype=np.uint8),
        cfg.batch_size,
        seed=seed,
    )
    runner = GANRunner(cfg, dataset_a=mk(0), dataset_b=mk(1))
    runner.fit(epochs=1, steps_per_epoch=2)
    runner.close()

    tags = {e[1] for e in tb.read_events(runner.writer.path)}
    for tag in ("transfer_ab/image/0", "transfer_ba/image/0", "cycle_aba/image/0",
                "g_loss", "d_loss", "cycle"):
        assert tag in tags, (tag, tags)
    assert os.path.isdir(os.path.join(cfg.checkpoint_dir, "step_000000002"))

    # resume
    runner2 = GANRunner(cfg, dataset_a=mk(0), dataset_b=mk(1))
    assert int(runner2.state.step) == 2
    runner2.close()


def test_gan_runner_requires_two_classes(tmp_path):
    cfg = tiny_test_config(classes=("only_one",))
    with pytest.raises(ValueError):
        GANRunner(cfg)


def test_transfer_fid_logged(tmp_path):
    cfg = tiny_test_config(
        steps_per_epoch=1, epochs=1, learning_rate=1e-4,
        log_dir=str(tmp_path / "logs"), checkpoint_dir=None,
        donate_state=False, classes=("a", "b"), mesh_data=1,
        fid_samples=4,
    )
    r = np.random.default_rng(0)
    mk = lambda seed: ArrayDataset(
        r.integers(0, 256, size=(6, cfg.size, cfg.size, 3), dtype=np.uint8),
        cfg.batch_size,
        seed=seed,
    )
    runner = GANRunner(cfg, dataset_a=mk(0), dataset_b=mk(1))
    runner.fit(epochs=1, steps_per_epoch=1)
    runner.close()
    tags = {e[1] for e in tb.read_events(runner.writer.path)}
    assert "transfer_fid_ab" in tags and "transfer_fid_ba" in tags


def test_steps_to_fixed_fid_harness(tmp_path):
    from gan_class_transfer2_tpu.utils.benchmark import steps_to_fixed_fid

    cfg = tiny_test_config(
        steps_per_epoch=1, epochs=1, learning_rate=1e-4,
        log_dir=str(tmp_path / "logs"), checkpoint_dir=None,
        donate_state=False, classes=("a", "b"), mesh_data=1,
        fid_samples=4,
    )
    r = np.random.default_rng(0)
    mk = lambda seed: ArrayDataset(
        r.integers(0, 256, size=(6, cfg.size, cfg.size, 3), dtype=np.uint8),
        cfg.batch_size,
        seed=seed,
    )
    runner = GANRunner(cfg, dataset_a=mk(0), dataset_b=mk(1))
    # unreachable target within a 2-step budget -> returns (None, fid)
    steps, fid = steps_to_fixed_fid(runner, target_fid=0.0, max_steps=2, check_every=2)
    runner.close()
    assert steps is None and np.isfinite(fid)
    assert int(runner.state.step) == 2
