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


def _mk_cfg(tmp_path, **kw):
    kw.setdefault("steps_per_epoch", 2)
    kw.setdefault("epochs", 1)
    kw.setdefault("learning_rate", 1e-4)
    kw.setdefault("log_dir", str(tmp_path / "logs"))
    kw.setdefault("checkpoint_dir", str(tmp_path / "ckpt"))
    kw.setdefault("checkpoint_every", 2)
    kw.setdefault("donate_state", False)
    kw.setdefault("classes", ("a", "b"))
    kw.setdefault("mesh_data", 1)
    return tiny_test_config(**kw)


def _mk_ds(cfg, seed):
    r = np.random.default_rng(seed)
    return ArrayDataset(
        r.integers(0, 256, size=(6, cfg.size, cfg.size, 3), dtype=np.uint8),
        cfg.batch_size,
        seed=seed,
    )


def test_gan_fit_resilient_recovers_from_failure(tmp_path):
    """GANRunner gets the same restart path as the diffusion Runner
    (VERDICT r1 next #7)."""
    cfg = _mk_cfg(tmp_path)
    runner = GANRunner(cfg, dataset_a=_mk_ds(cfg, 0), dataset_b=_mk_ds(cfg, 1))
    runner.fit(epochs=1, steps_per_epoch=2, log_samples=False)  # ckpt @2

    calls = {"n": 0}
    real_step = runner.train_step

    def flaky_step(state, a, b, rng):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected fault")
        return real_step(state, a, b, rng)

    runner.train_step = flaky_step
    runner.fit_resilient(max_restarts=2, epochs=1, steps_per_epoch=2,
                         log_samples=False)
    runner.close()
    assert calls["n"] >= 3  # failed once, restarted, completed


def test_conditional_gan_fit_resilient(tmp_path):
    from gan_class_transfer2_tpu.train.conditional_gan_loop import (
        ConditionalGANRunner,
    )

    cfg = _mk_cfg(tmp_path, classes=("a", "b"), num_classes=2)
    runner = ConditionalGANRunner(
        cfg, datasets=[_mk_ds(cfg, 0), _mk_ds(cfg, 1)]
    )
    runner.fit(epochs=1, steps_per_epoch=2, log_samples=False)

    calls = {"n": 0}
    real_step = runner.train_step

    def flaky_step(state, batch, rng):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected fault")
        return real_step(state, batch, rng)

    runner.train_step = flaky_step
    runner.fit_resilient(max_restarts=2, epochs=1, steps_per_epoch=2,
                         log_samples=False)
    runner.close()
    assert calls["n"] >= 3


def test_gan_keyboard_interrupt_saves_checkpoint(tmp_path):
    """Ctrl-C mid-GAN-run keeps the work (ADVICE r1)."""
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt_lib

    cfg = _mk_cfg(tmp_path, checkpoint_every=100)  # no periodic save
    runner = GANRunner(cfg, dataset_a=_mk_ds(cfg, 0), dataset_b=_mk_ds(cfg, 1))

    real_step = runner.train_step
    calls = {"n": 0}

    def interrupting_step(state, a, b, rng):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt
        return real_step(state, a, b, rng)

    runner.train_step = interrupting_step
    with pytest.raises(KeyboardInterrupt):
        runner.fit(epochs=1, steps_per_epoch=4, log_samples=False)
    assert ckpt_lib.latest_step(cfg.checkpoint_dir) == 1
    runner.close()


def test_transfer_fid_uses_held_out_files(tmp_path):
    """Eval files are reserved at construction and never reach the training
    datasets (VERDICT r1 next #5 / ADVICE: train-eval leakage)."""
    from PIL import Image as PILImage

    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        r = np.random.default_rng(0 if cls == "a" else 1)
        for i in range(8):
            arr = r.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
            PILImage.fromarray(arr).save(d / f"{i}.png")

    cfg = _mk_cfg(
        tmp_path,
        classes=(str(tmp_path / "a" / "*.png"), str(tmp_path / "b" / "*.png")),
        fid_samples=3,
        checkpoint_dir=None,
        native_loader=False,
    )
    runner = GANRunner(cfg)
    try:
        for cls, ds in (("a", runner.dataset_a), ("b", runner.dataset_b)):
            held = set(runner._eval_files[cls])
            assert len(held) == 3
            assert held.isdisjoint(set(ds.files))
            assert len(ds.files) == 5
        fid = runner.transfer_fid("ab")
        assert np.isfinite(fid) and fid >= 0
    finally:
        runner.close()


def test_gan_data_position_restored_across_restart(tmp_path):
    """Both class streams' positions ride the checkpoint sidecar."""
    cfg = _mk_cfg(tmp_path, checkpoint_every=2)
    ds_a, ds_b = _mk_ds(cfg, 0), _mk_ds(cfg, 1)
    runner = GANRunner(cfg, dataset_a=ds_a, dataset_b=ds_b)
    runner.fit(epochs=1, steps_per_epoch=2, log_samples=False)  # ckpt @2
    runner.close()

    ds_a2, ds_b2 = _mk_ds(cfg, 0), _mk_ds(cfg, 1)
    runner2 = GANRunner(cfg, dataset_a=ds_a2, dataset_b=ds_b2)
    # EXACT consumed position (DeviceIterator.consumed_state) — the old
    # prefetch-inflated counter skipped one batch per restart (review r4)
    assert ds_a2.state_dict()["position"] == 2
    assert ds_b2.state_dict()["position"] == 2
    runner2.close()


def test_cli_gan_train_then_eval(tmp_path, capsys):
    """The product loop for the transfer headline: `gct2 gan-train` on two
    class globs, then `gct2 eval --model gan` re-scores the checkpoint's
    transfer-FID pair from the inherited config."""
    import json

    import numpy as np
    from PIL import Image as PILImage

    from gan_class_transfer2_tpu import cli

    r = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(6):
            arr = r.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
            PILImage.fromarray(arr).save(d / f"{i}.png")

    ckpt = str(tmp_path / "ckpt")
    common = [
        "--platform", "cpu",
        "--classes", str(tmp_path / "a" / "*.png"), str(tmp_path / "b" / "*.png"),
        "--size", "16", "--pixel-size", "4", "--max-size", "8",
        "--octaves", "2", "--steps", "4", "--batch-size", "2",
        "--warm-up", "0", "--fused-diffusion", "false",
        "--fid-samples", "2", "--native-loader", "false", "--mesh-data", "1",
    ]
    rc = cli.main([
        "gan-train", *common,
        "--steps-per-epoch", "2", "--epochs", "1",
        "--log-dir", str(tmp_path / "logs"), "--checkpoint-dir", ckpt,
        "--checkpoint-every", "2",
    ])
    assert rc == 0
    capsys.readouterr()

    rc = cli.main(["eval", "--model", "gan", "--platform", "cpu",
                   "--checkpoint-dir", ckpt])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["step"] == 2
    for k in ("transfer_fid_ab", "transfer_fid_ba"):
        assert np.isfinite(out[k]) and out[k] >= 0
    for k in ("transfer_kid_ab", "transfer_kid_ba"):
        assert np.isfinite(out[k])  # unbiased: slightly negative is valid


def test_r1_metric_reaches_tensorboard(tmp_path):
    """cfg-dependent step metrics (r1) must flow through the epoch
    accumulator into the event file, not be dropped by a fixed key set."""
    cfg = tiny_test_config(
        steps_per_epoch=2, epochs=1, learning_rate=1e-4,
        r1_weight=1.0, gan_loss="lsgan",
        log_dir=str(tmp_path / "logs"), checkpoint_dir=None,
        donate_state=False, classes=("a", "b"), mesh_data=1,
    )
    r = np.random.default_rng(0)
    mk = lambda seed: ArrayDataset(
        r.integers(0, 256, size=(6, cfg.size, cfg.size, 3), dtype=np.uint8),
        cfg.batch_size, seed=seed,
    )
    runner = GANRunner(cfg, dataset_a=mk(0), dataset_b=mk(1))
    runner.fit(epochs=1, steps_per_epoch=2, log_samples=False)
    runner.close()
    events = [e for e in tb.read_events(runner.writer.path) if e[1] == "r1"]
    assert events and events[0][2] == "scalar" and events[0][3] > 0


def test_transfer_scores_skips_degenerate_eval_sets(tmp_path):
    """A 2-file class leaves 1 held-out eval file; fid_and_kid needs >= 2
    images per set, so the metric must be SKIPPED (None + no TB scalar),
    not abort training mid-run (review r3e)."""
    from PIL import Image as PILImage

    r = np.random.default_rng(0)
    for cls, n in (("a", 2), ("b", 8)):
        d = tmp_path / cls
        d.mkdir()
        for i in range(n):
            PILImage.fromarray(
                r.integers(0, 256, (20, 20, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    cfg = tiny_test_config(
        classes=(str(tmp_path / "a" / "*.png"), str(tmp_path / "b" / "*.png")),
        fid_samples=3,
        checkpoint_dir=None,
        log_dir=str(tmp_path / "logs"),
        native_loader=False,
        mesh_data=1,
        donate_state=False,
    )
    runner = GANRunner(cfg)
    try:
        # class a reserves min(3, 2-1) = 1 eval file -> both directions
        # touch a degenerate set on one side
        assert runner.transfer_scores("ba") is None  # tgt = a (1 image)
        assert runner.transfer_fid("ba") is None
        runner.log_sample(0)  # must not raise
        tags = {e[1] for e in tb.read_events(runner.writer.path)}
        assert "transfer_fid_ba" not in tags
    finally:
        runner.close()


def test_tb_epoch_index_is_monotonic_across_explicit_fits(tmp_path):
    """Repeated fit(epochs=1) harness loops (benchmark.steps_to_fixed_fid)
    must log at advancing TB steps, not overwrite epoch 0 (review r3e)."""
    cfg = tiny_test_config(
        steps_per_epoch=2,
        learning_rate=1e-4,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=None,
        donate_state=False,
        classes=("a", "b"),
        mesh_data=1,
    )
    r = np.random.default_rng(0)
    mk = lambda seed: ArrayDataset(
        r.integers(0, 256, size=(6, cfg.size, cfg.size, 3), dtype=np.uint8),
        cfg.batch_size,
        seed=seed,
    )
    runner = GANRunner(cfg, dataset_a=mk(0), dataset_b=mk(1))
    try:
        for _ in range(3):
            runner.fit(epochs=1, steps_per_epoch=2, log_samples=False)
        steps = sorted(
            e[0] for e in tb.read_events(runner.writer.path) if e[1] == "g_loss"
        )
        assert steps == [0, 1, 2], steps
    finally:
        runner.close()


def test_gan_runner_keep_best(tmp_path):
    """keep_best on a GAN run: the mean per-direction transfer FID is
    tracked and a consumable best/ checkpoint dir appears (r5 — cycle-GAN
    FID oscillates late in training, the final epoch is not the best)."""
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt_lib

    cfg = tiny_test_config(
        steps_per_epoch=2, epochs=2, learning_rate=1e-4,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2, donate_state=False,
        classes=("a", "b"), mesh_data=1,
        fid_samples=4, keep_best=True,
    )
    r = np.random.default_rng(0)
    mk = lambda seed: ArrayDataset(
        r.integers(0, 256, size=(6, cfg.size, cfg.size, 3), dtype=np.uint8),
        cfg.batch_size, seed=seed,
    )
    ev = lambda seed: np.random.default_rng(seed).uniform(
        -1, 1, (4, cfg.size, cfg.size, 3)).astype(np.float32)
    runner = GANRunner(cfg, dataset_a=mk(0), dataset_b=mk(1),
                       eval_a=ev(10), eval_b=ev(11))
    runner.fit(epochs=2, steps_per_epoch=2)
    runner.close()
    rec = ckpt_lib.read_best(cfg.checkpoint_dir)
    assert rec is not None and rec["metric"] == "transfer_fid_mean"
    assert len(ckpt_lib.all_steps(
        os.path.join(cfg.checkpoint_dir, "best"))) == 1


def _png_class_dirs(tmp_path, n_classes=2, n=6, side=20):
    """Per-class PNG dirs + the glob patterns, for file-driven runner tests."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(0)
    patterns = []
    for k in range(n_classes):
        d = tmp_path / f"class{k}"
        d.mkdir()
        for i in range(n):
            arr = rng.integers(0, 256, size=(side, side, 3), dtype=np.uint8)
            PILImage.fromarray(arr).save(d / f"img_{i}.png")
        patterns.append(str(d / "*.png"))
    return tuple(patterns)


def test_gan_runner_data_hbm(tmp_path):
    """GANRunner with cfg.data_hbm: both class datasets are HBM-resident
    (decode once, on-device augment) and the run trains + checkpoints."""
    patterns = _png_class_dirs(tmp_path)
    cfg = tiny_test_config(
        steps_per_epoch=2, epochs=1, learning_rate=1e-4,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2, donate_state=False,
        classes=patterns, mesh_data=1, data_hbm=20, fid_samples=0,
    )
    runner = GANRunner(cfg)
    from gan_class_transfer2_tpu.data import device_augment

    assert isinstance(runner.dataset_a, device_augment.HBMDataset)
    runner.fit(epochs=1, steps_per_epoch=2)
    runner.close()
    assert os.path.isdir(os.path.join(cfg.checkpoint_dir, "step_000000002"))


def test_conditional_gan_runner_data_hbm(tmp_path):
    """ConditionalGANRunner with cfg.data_hbm: LabeledDataset composed over
    HBM-resident per-class datasets (device image + host label per batch)."""
    from gan_class_transfer2_tpu.train.conditional_gan_loop import (
        ConditionalGANRunner,
    )

    patterns = _png_class_dirs(tmp_path)
    cfg = tiny_test_config(
        steps_per_epoch=2, epochs=1, learning_rate=1e-4,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2, donate_state=False,
        classes=patterns, num_classes=2, mesh_data=1,
        data_hbm=20, fid_samples=0,
    )
    runner = ConditionalGANRunner(cfg)
    batch = next(runner.data_iter)
    assert set(batch) == {"image", "label"}
    assert batch["image"].shape == (cfg.batch_size, cfg.size, cfg.size, 3)
    runner.fit(epochs=1, steps_per_epoch=2, log_samples=False)
    runner.close()
