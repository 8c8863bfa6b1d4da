"""End-to-end smoke test of the run driver (the framework analogue of the
reference __main__, train.py:498-523): tiny config, synthetic data, 1 epoch
with sampling callback, TensorBoard artifacts, checkpoint, resume."""

import glob
import json
import os

import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.data.pipeline import ArrayDataset
from gan_class_transfer2_tpu.train.loop import Runner
from gan_class_transfer2_tpu.utils import tensorboard as tb


@pytest.fixture
def cfg(tmp_path):
    return tiny_test_config(
        steps=4,
        steps_per_epoch=3,
        epochs=1,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=3,
        mesh_data=1,
    )


def _dataset(cfg):
    images = np.random.default_rng(0).integers(
        0, 256, size=(8, cfg.size, cfg.size, 3), dtype=np.uint8
    )
    return ArrayDataset(images, cfg.batch_size, seed=0)


def test_runner_fit_end_to_end(cfg, tmp_path):
    runner = Runner(cfg, dataset=_dataset(cfg))
    runner.fit(epochs=1, steps_per_epoch=3)
    runner.close()

    # reference TensorBoard tags present (train.py:356-361, 489-496)
    events = list(tb.read_events(runner.writer.path))
    tags = {e[1] for e in events}
    for tag in (
        "example loss",
        "denoised/image",
        "fake/image/0",
        "step_1/image/0",
        "step_0.25/image/0",
        "step_0.5/image/0",
        "step_0.75/image/0",
        "loss",
        "images_per_sec",
    ):
        assert tag in tags, (tag, tags)

    # checkpoint written at step 3
    assert os.path.isdir(os.path.join(cfg.checkpoint_dir, "step_000000003"))


def test_runner_resumes_from_checkpoint(cfg):
    runner = Runner(cfg, dataset=_dataset(cfg))
    runner.fit(epochs=1, steps_per_epoch=3, log_samples=False)
    runner.close()

    runner2 = Runner(cfg, dataset=_dataset(cfg))
    assert int(runner2.state.step) == 3
    runner2.close()


def test_resume_finishes_original_budget_not_more(cfg):
    """Re-running the configured run after a crash must complete the
    ORIGINAL epoch budget, not extend it: fit() (epochs=None) counts
    restored epochs against cfg.epochs; explicit fit(epochs=k) stays
    incremental."""
    cfg = cfg.replace(epochs=4, steps_per_epoch=2, checkpoint_every=2)
    r1 = Runner(cfg, dataset=_dataset(cfg))
    r1.fit(epochs=2, log_samples=False)  # explicit: incremental 2 epochs
    assert int(r1.state.step) == 4
    r1.close()

    # "crash": new process re-runs the same configured command
    r2 = Runner(cfg, dataset=_dataset(cfg))
    assert int(r2.state.step) == 4
    r2.fit(log_samples=False)  # budget mode: only 2 epochs remain
    assert int(r2.state.step) == 8, "resume must stop at the original budget"
    r2.fit(log_samples=False)  # budget exhausted: no-op
    assert int(r2.state.step) == 8
    r2.fit(epochs=1, log_samples=False)  # explicit stays incremental
    assert int(r2.state.step) == 10
    r2.close()


def test_resume_from_unaligned_checkpoint_exact_budget(cfg):
    """A checkpoint mid-epoch (checkpoint_every not a multiple of
    steps_per_epoch) must resume with a PARTIAL epoch so the total lands
    exactly on the budget — not re-run the broken epoch in full."""
    cfg = cfg.replace(epochs=2, steps_per_epoch=4, checkpoint_every=3)
    r1 = Runner(cfg, dataset=_dataset(cfg))
    # run 3 steps explicitly, checkpoint lands at step 3 (mid-epoch-0)
    r1.fit(epochs=1, steps_per_epoch=3, log_samples=False)
    assert int(r1.state.step) == 3
    r1.close()

    r2 = Runner(cfg, dataset=_dataset(cfg))
    assert int(r2.state.step) == 3
    r2.fit(log_samples=False)  # budget: 2×4 = 8 total → 5 more steps
    assert int(r2.state.step) == 8, "must finish at the exact step budget"
    r2.close()


def test_cli_export_weights_roundtrip(cfg, tmp_path):
    """export-weights writes the Keras-build-order npz; re-importing it
    reproduces the checkpointed forward pass exactly."""
    import jax
    import jax.numpy as jnp

    from gan_class_transfer2_tpu import cli
    from gan_class_transfer2_tpu.models import unet
    from gan_class_transfer2_tpu.utils import tf_import

    runner = Runner(cfg, dataset=_dataset(cfg))
    runner.fit(epochs=1, steps_per_epoch=3, log_samples=False)  # ckpt at 3
    trained = runner.state.params
    runner.close()

    out = str(tmp_path / "weights.npz")
    rc = cli.main([
        "export-weights", "--platform", "cpu",
        "--checkpoint-dir", cfg.checkpoint_dir, "--out", out,
    ])
    assert rc == 0
    data = np.load(out)
    flat = [data[k] for k in sorted(data.files)]

    fresh = unet.init_unet(jax.random.PRNGKey(9), cfg)
    imported = tf_import.import_flat_weights(cfg, fresh, flat)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, cfg.size, cfg.size, 3)),
        jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(unet.unet_apply(cfg, imported, x)),
        np.asarray(unet.unet_apply(cfg, trained, x)),
        atol=1e-6,
    )


def test_cli_config_construction():
    from gan_class_transfer2_tpu.cli import main
    import argparse

    # parse-only path: build a config from flags without running
    from gan_class_transfer2_tpu import cli

    parser = argparse.ArgumentParser()
    cli._add_config_args(parser)
    args = parser.parse_args(
        ["--size", "32", "--batch-size", "4", "--parameterization", "epsilon",
         "--octaves", "2", "--pixel-size", "4"]
    )
    args.config = None
    c = cli.config_from_args(args)
    assert c.size == 32 and c.batch_size == 4 and c.parameterization == "epsilon"


def test_cli_compilation_cache_resolution(tmp_path, monkeypatch):
    """--compilation-cache resolution: flag > $GCT2_COMPILATION_CACHE >
    ~/.cache default; 'none'/'off'/'' disables. The cache exists because the
    reference re-traces+recompiles on every launch (reference
    train.py:505-514) and a tunneled-TPU compile is minutes of RPC."""
    import jax

    from gan_class_transfer2_tpu import cli

    calls = []
    monkeypatch.setattr(
        jax.config, "update", lambda k, v: calls.append((k, v))
    )

    # flag value wins over the env var
    monkeypatch.setenv("GCT2_COMPILATION_CACHE", str(tmp_path / "env"))
    cli._setup_compilation_cache(str(tmp_path / "flag"))
    assert ("jax_compilation_cache_dir", str(tmp_path / "flag")) in calls

    # env var wins over the home default
    calls.clear()
    cli._setup_compilation_cache(None)
    assert ("jax_compilation_cache_dir", str(tmp_path / "env")) in calls

    # no flag, no env → the documented ~/.cache default
    calls.clear()
    monkeypatch.delenv("GCT2_COMPILATION_CACHE")
    cli._setup_compilation_cache(None)
    (dir_call,) = [c for c in calls if c[0] == "jax_compilation_cache_dir"]
    assert dir_call[1] == os.path.join(
        os.path.expanduser("~"), ".cache", "gan_class_transfer2_tpu",
        "xla-cache",
    )

    # explicit opt-out never touches jax.config
    for off in ("none", "OFF", ""):
        calls.clear()
        cli._setup_compilation_cache(off)
        assert calls == []


def test_cli_inherits_default_checkpoint_dir_config(tmp_path, monkeypatch):
    """sample/edit/serve with NO --checkpoint-dir must still pick up the
    config.json under the DEFAULT checkpoint dir, or restores rebuild the
    wrong state structure (code-review r2 finding)."""
    import argparse

    from gan_class_transfer2_tpu import cli
    from gan_class_transfer2_tpu.config import Config

    ckpt = tmp_path / "checkpoints"  # the Config default dir name
    ckpt.mkdir()
    saved = Config(optimizer="adam_tf", num_classes=3, schedule="cosine2")
    (ckpt / "config.json").write_text(saved.to_json())
    monkeypatch.chdir(tmp_path)

    parser = argparse.ArgumentParser()
    cli._add_config_args(parser)
    args = parser.parse_args([])  # no flags at all
    args.config = None
    c = cli.config_from_args(args, checkpoint_config=True)
    assert c.optimizer == "adam_tf"
    assert c.num_classes == 3
    assert c.schedule == "cosine2"
    # explicit flags still win over the saved config
    args2 = parser.parse_args(["--schedule", "quadratic"])
    args2.config = None
    c2 = cli.config_from_args(args2, checkpoint_config=True)
    assert c2.schedule == "quadratic" and c2.optimizer == "adam_tf"
    # train commands do NOT inherit (checkpoint_config=False)
    c3 = cli.config_from_args(args, checkpoint_config=False)
    assert c3.optimizer == "adam"


def test_fit_resilient_recovers_from_failure(cfg):
    runner = Runner(cfg, dataset=_dataset(cfg))
    runner.fit(epochs=1, steps_per_epoch=3, log_samples=False)  # checkpoint @3

    calls = {"n": 0}
    real_step = runner.train_step

    def flaky_step(state, batch, rng):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected fault")
        return real_step(state, batch, rng)

    runner.train_step = flaky_step
    runner.fit_resilient(max_restarts=2, epochs=1, steps_per_epoch=3,
                         log_samples=False)
    runner.close()
    assert calls["n"] >= 4  # failed once, restarted, completed


def test_fit_resilient_gives_up(cfg):
    runner = Runner(cfg, dataset=_dataset(cfg))

    def always_fail(state, batch, rng):
        raise RuntimeError("permanent fault")

    runner.train_step = always_fail
    with pytest.raises(RuntimeError):
        runner.fit_resilient(max_restarts=1, epochs=1, steps_per_epoch=1,
                             log_samples=False)
    runner.close()


def test_cli_train_end_to_end(tmp_path):
    """Drive the real CLI entry (main) through a tiny training run."""
    from PIL import Image as PILImage

    from gan_class_transfer2_tpu import cli

    rng = np.random.default_rng(0)
    for i in range(4):
        arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        PILImage.fromarray(arr).save(tmp_path / f"img_{i}.png")

    rc = cli.main([
        "train",
        "--dataset-pattern", str(tmp_path / "*.png"),
        "--size", "16", "--pixel-size", "4", "--max-size", "8",
        "--octaves", "2", "--steps", "4", "--batch-size", "2",
        "--steps-per-epoch", "2", "--epochs", "1", "--warm-up", "2",
        "--test-step", "2", "--fused-diffusion", "false",
        "--log-dir", str(tmp_path / "logs"),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--checkpoint-every", "2", "--mesh-data", "1",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(str(tmp_path / "ckpt"), "step_000000002"))


def test_fid_logging(cfg):
    cfg = cfg.replace(fid_samples=4)
    runner = Runner(cfg, dataset=_dataset(cfg))
    runner.fit(epochs=1, steps_per_epoch=1)
    runner.close()
    tags = {e[1] for e in tb.read_events(runner.writer.path)}
    assert "fid" in tags


def test_data_position_restored_across_process_restart(cfg):
    """Checkpoint sidecar carries the data-stream position: a NEW runner on
    the same checkpoint dir resumes the stream instead of silently replaying
    the first samples (VERDICT r1 weak #6)."""
    ds = _dataset(cfg)
    runner = Runner(cfg, dataset=ds)
    runner.fit(epochs=1, steps_per_epoch=3, log_samples=False)  # ckpt @3
    pos_after = ds.state_dict()["position"]
    assert pos_after >= 3
    runner.close()

    ds2 = _dataset(cfg)  # fresh dataset at position 0
    runner2 = Runner(cfg, dataset=ds2)
    # position restored from the step_3 sidecar — EXACT: the sidecar records
    # the consumed position (DeviceIterator.consumed_state), not the
    # prefetch-inflated dataset counter (review r4: the old one-ahead
    # counter silently skipped a batch per restart)
    assert ds2.state_dict()["position"] == 3
    runner2.close()


def test_fid_uses_held_out_files(tmp_path):
    """Twin of test_transfer_fid_uses_held_out_files for the diffusion
    Runner: with fid_samples > 0 and pattern-built datasets, the FID
    comparison set is reserved files that never reach the training
    iterators (VERDICT r2 weak #1)."""
    from PIL import Image as PILImage

    d = tmp_path / "imgs"
    d.mkdir()
    r = np.random.default_rng(0)
    for i in range(8):
        arr = r.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        PILImage.fromarray(arr).save(d / f"{i}.png")

    cfg = tiny_test_config(
        steps=4,
        dataset_pattern=str(d / "*.png"),
        fid_samples=3,
        checkpoint_dir=None,
        log_dir=str(tmp_path / "logs"),
        native_loader=False,
        mesh_data=1,
    )
    runner = Runner(cfg)
    try:
        held = set(runner._eval_files)
        assert len(held) == 3
        assert held.isdisjoint(set(runner.dataset.files))
        assert len(runner.dataset.files) == 5
        fid = runner.compute_fid()
        assert np.isfinite(fid) and fid >= 0
        # the reference set is fixed (cached) across evals
        ref = runner._fid_reference
        assert ref is not None and len(ref) == 3
    finally:
        runner.close()


def test_metric_sample_mesh_parity(tmp_path):
    """The FID/KID sample batch is value-identical whether the sampler runs
    single-device or data-parallel over the mesh (padded to the data extent,
    padding sliced back) — quality scores must not depend on mesh shape."""
    import jax
    import jax.numpy as jnp

    from gan_class_transfer2_tpu.sample import sampler

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    cfg = tiny_test_config(
        steps=4,
        batch_size=8,  # training batch must divide over the data axis
        fid_samples=3,  # NOT divisible by 8: exercises sampler padding
        checkpoint_dir=None,
        log_dir=str(tmp_path / "logs"),
        mesh_data=8,
    )
    runner = Runner(cfg, dataset=_dataset(cfg))
    try:
        params = runner.state.params
        init = jax.random.normal(
            jax.random.PRNGKey(7), (3, cfg.size, cfg.size, 3), jnp.float32
        )
        meshed = np.asarray(runner._metric_sample(params, init))
        single = np.asarray(sampler.sample(cfg, params, init).images)
        assert meshed.shape == single.shape == (3, cfg.size, cfg.size, 3)
        np.testing.assert_allclose(meshed, single, atol=1e-5)
        scores = runner.quality_scores()
        assert np.isfinite(scores["fid"]) and np.isfinite(scores["kid"])
    finally:
        runner.close()


def test_cli_rejects_process_flags_without_coordinator(capsys):
    """--num-processes/--process-id without --coordinator would silently run
    independent single-host jobs racing the shared dirs (review r3)."""
    from gan_class_transfer2_tpu import cli

    with pytest.raises(SystemExit):
        cli.main(["train", "--num-processes", "2"])
    assert "--coordinator" in capsys.readouterr().err


def test_fid_reference_set_stays_class_0(tmp_path):
    """When class 0's glob has fewer than fid_samples+1 files, the FID
    reference set must stay PURE class 0 (smaller set) rather than
    silently spilling into class 1's held-out files (review r3b)."""
    from PIL import Image as PILImage

    r = np.random.default_rng(0)
    for cls, n in (("a", 3), ("b", 8)):
        d = tmp_path / cls
        d.mkdir()
        for i in range(n):
            arr = r.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
            PILImage.fromarray(arr).save(d / f"{i}.png")

    cfg = tiny_test_config(
        steps=4,
        classes=(str(tmp_path / "a" / "*.png"), str(tmp_path / "b" / "*.png")),
        num_classes=2,
        fid_samples=4,  # > class a's possible eval quota of 2
        checkpoint_dir=None,
        log_dir=str(tmp_path / "logs"),
        native_loader=False,
        mesh_data=1,
    )
    runner = Runner(cfg)
    try:
        class_a = {str(tmp_path / "a" / f"{i}.png") for i in range(3)}
        held = set(runner._eval_files)
        # capped at len(class a) - 1 = 2 and entirely class a
        assert len(held) == 2
        assert held <= class_a
        ref = runner._fid_reference_set(cfg.fid_samples)
        assert len(ref) == 2  # smaller unbiased set, never mixed-class
    finally:
        runner.close()


def test_cli_eval_scores_checkpoint(tmp_path, capsys):
    """`gct2 eval` scores a trained checkpoint's held-out FID without
    training — one JSON line, config inherited from the checkpoint dir."""
    import json

    from PIL import Image as PILImage

    from gan_class_transfer2_tpu import cli

    d = tmp_path / "imgs"
    d.mkdir()
    r = np.random.default_rng(0)
    for i in range(8):
        arr = r.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        PILImage.fromarray(arr).save(d / f"{i}.png")

    ckpt = str(tmp_path / "ckpt")
    rc = cli.main([
        "train", "--platform", "cpu",
        "--dataset-pattern", str(d / "*.png"),
        "--size", "16", "--pixel-size", "4", "--max-size", "8",
        "--octaves", "2", "--steps", "4", "--batch-size", "2",
        "--steps-per-epoch", "3", "--epochs", "1", "--warm-up", "2",
        "--test-step", "2", "--fused-diffusion", "false",
        "--fid-samples", "3", "--native-loader", "false", "--mesh-data", "1",
        "--log-dir", str(tmp_path / "logs"), "--checkpoint-dir", ckpt,
        "--checkpoint-every", "3",
    ])
    assert rc == 0
    capsys.readouterr()

    rc = cli.main(["eval", "--platform", "cpu", "--checkpoint-dir", ckpt])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["model"] == "diffusion"
    assert out["step"] == 3
    assert np.isfinite(out["fid"]) and out["fid"] >= 0
    assert np.isfinite(out["kid"])  # unbiased: slightly negative is valid


def test_cadence_zero_disables_checkpoints_and_sampling(tmp_path):
    """--checkpoint-every 0 / --log-images-every 0 mean 'never', not
    ZeroDivisionError on the first step (review r3e)."""
    cfg = tiny_test_config(
        steps_per_epoch=2,
        epochs=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=0,
        log_images_every=0,
        log_dir=str(tmp_path / "logs"),
        mesh_data=1,
    )
    runner = Runner(cfg, dataset=_dataset(cfg))
    runner.fit(epochs=1, steps_per_epoch=2)  # log_samples defaults on
    runner.close()
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt

    assert ckpt.all_steps(cfg.checkpoint_dir) == []  # never saved mid-run
    tags = {e[1] for e in tb.read_events(runner.writer.path)}
    assert "loss" in tags and "denoised/image" not in tags  # no log_sample


def test_host_sync_every_bounds_inflight_dispatch(cfg):
    """Config.host_sync_every (r5): the epoch loop fetches the running
    metric accumulator every N steps so the producer can never queue
    unbounded un-executed steps (each pins a host batch buffer — an
    unsynced 3000-step flagship loop was OOM-killed at 130 GB RSS on the
    tunneled TPU). sync cadence 1 = fetch after every step; results must
    be identical to the unsynced run."""
    import jax

    # distinct checkpoint dirs: a shared one would make run 2 RESUME run 1
    c1 = cfg.replace(host_sync_every=1, seed=7,
                     checkpoint_dir=cfg.checkpoint_dir + "_s1")
    c0 = cfg.replace(host_sync_every=0, seed=7,
                     checkpoint_dir=cfg.checkpoint_dir + "_s0")
    r1 = Runner(c1, dataset=_dataset(c1))
    r1.fit(epochs=1, steps_per_epoch=3, log_samples=False)
    r0 = Runner(c0, dataset=_dataset(c0))
    r0.fit(epochs=1, steps_per_epoch=3, log_samples=False)
    a = jax.tree_util.tree_leaves(r1.state.params)
    b = jax.tree_util.tree_leaves(r0.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    r1.close()
    r0.close()


def test_host_sync_every_validation():
    with pytest.raises(ValueError, match="host_sync_every"):
        tiny_test_config(host_sync_every=-1).validate()


def test_cli_train_data_hbm_end_to_end(tmp_path):
    """--data-hbm N trains from the HBM-resident pool (decode once, draw +
    augment on device — r5; the streaming path's per-step host->device put
    leaks its byte size on tunneled platforms) and resumes from the sidecar
    stream position like the streamed path."""
    from PIL import Image as PILImage

    from gan_class_transfer2_tpu import cli

    rng = np.random.default_rng(0)
    for i in range(4):
        arr = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        PILImage.fromarray(arr).save(tmp_path / f"img_{i}.png")

    argv = [
        "train",
        "--dataset-pattern", str(tmp_path / "*.png"),
        "--size", "16", "--pixel-size", "4", "--max-size", "8",
        "--octaves", "2", "--steps", "4", "--batch-size", "2",
        "--steps-per-epoch", "2", "--epochs", "1", "--warm-up", "2",
        "--test-step", "2", "--fused-diffusion", "false",
        "--data-hbm", "20", "--fid-samples", "0",
        "--log-dir", str(tmp_path / "logs"),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--checkpoint-every", "2", "--mesh-data", "1",
    ]
    assert cli.main(argv) == 0
    assert os.path.isdir(os.path.join(str(tmp_path / "ckpt"), "step_000000002"))
    # the sidecar restores the HBM index-stream position on resume
    extra = os.path.join(str(tmp_path / "ckpt"), "step_000000002.extra.json")
    assert os.path.exists(extra)
    assert cli.main(argv + ["--epochs", "2"]) == 0
    assert os.path.isdir(os.path.join(str(tmp_path / "ckpt"), "step_000000004"))


def test_runner_data_hbm_mesh_sharded(tmp_path):
    """data_hbm over a multi-device mesh: the pool is replicated on the
    batch sharding's mesh and draws come out sharded over 'data'."""
    import jax

    if jax.device_count() < 2:
        import pytest as _pytest

        _pytest.skip("needs a multi-device platform (run under "
                     "xla_force_host_platform_device_count)")
    from PIL import Image as PILImage

    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(6):
        arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        PILImage.fromarray(arr).save(d / f"img_{i}.png")
    cfg = tiny_test_config(
        steps=4, steps_per_epoch=2, epochs=1,
        dataset_pattern=str(d / "*.png"), data_hbm=16,
        batch_size=jax.device_count(), mesh_data=jax.device_count(),
        fid_samples=0,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=None,
    )
    runner = Runner(cfg)
    batch = next(runner.data_iter)
    assert len(batch.sharding.device_set) == jax.device_count()
    runner.fit(epochs=1, steps_per_epoch=2, log_samples=False)
    runner.close()


def test_restore_tolerates_cross_input_path_sidecar(cfg, tmp_path):
    """A checkpoint written under one input path (its sidecar format) must
    not crash a resume under another: the stream position is skipped with a
    warning and training continues from the restored weights (r5 — a
    native-loader sidecar restored into an HBMDataset raised KeyError at
    Runner construction)."""
    runner = Runner(cfg, dataset=_dataset(cfg))
    runner.fit(epochs=1, steps_per_epoch=3, log_samples=False)
    runner.close()
    # rewrite the sidecar in the native loader's format
    import json as _json

    extra = os.path.join(cfg.checkpoint_dir, "step_000000003.extra.json")
    with open(extra, "w") as fh:
        _json.dump({"data": {"dataset": {"batches_served": 3,
                                         "resume_round": 0}}}, fh)
    runner2 = Runner(cfg, dataset=_dataset(cfg))  # must not raise
    assert int(runner2.state.step) == 3
    runner2.fit(epochs=1, steps_per_epoch=3, log_samples=False)
    runner2.close()


def test_keep_best_tracker_monotone(cfg, tmp_path):
    """_maybe_keep_best saves only on (lower-is-better) improvement, and
    best/ is a normal checkpoint dir any consumer can point at."""
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt_lib

    cfg = cfg.replace(keep_best=True)
    runner = Runner(cfg, dataset=_dataset(cfg))
    runner.fit(epochs=1, steps_per_epoch=3, log_samples=False)

    assert runner._maybe_keep_best(5.0, 0, "fid") is not None
    assert runner._maybe_keep_best(7.0, 1, "fid") is None   # worse
    assert runner._maybe_keep_best(3.0, 2, "fid") is not None
    rec = ckpt_lib.read_best(cfg.checkpoint_dir)
    assert rec == {"metric": "fid", "value": 3.0, "step": 3, "epoch": 2,
                   "fid_extractor": cfg.fid_extractor}
    best_dir = os.path.join(cfg.checkpoint_dir, "best")
    # exactly one step dir + its config.json (self-contained consumer dir)
    assert ckpt_lib.all_steps(best_dir) == [3]
    assert os.path.exists(os.path.join(best_dir, "config.json"))
    runner.close()

    # a restarted run continues the tracker from best.json instead of
    # overwriting the better earlier checkpoint with its first eval
    runner2 = Runner(cfg, dataset=_dataset(cfg))
    assert runner2._maybe_keep_best(4.0, 0, "fid") is None  # 4.0 >= 3.0
    assert runner2._maybe_keep_best(2.0, 1, "fid") is not None
    assert ckpt_lib.read_best(cfg.checkpoint_dir)["value"] == 2.0
    runner2.close()


def test_keep_best_ignores_incomparable_record(cfg, tmp_path, capsys):
    """best.json written under a different metric or fid_extractor must NOT
    gate the new run's saves — the values are incomparable (e.g. repo-local
    FID 3.2 vs Inception units starting near 280); the tracker restarts
    fresh and overwrites (r5 review)."""
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt_lib

    cfg = cfg.replace(keep_best=True)
    runner = Runner(cfg, dataset=_dataset(cfg))
    runner.fit(epochs=1, steps_per_epoch=3, log_samples=False)
    assert runner._maybe_keep_best(3.2, 0, "fid") is not None
    runner.close()

    # same dir reused by a GAN-style run with a different metric name:
    # 280 >> 3.2, but the record is incomparable so it must still save
    runner2 = Runner(cfg, dataset=_dataset(cfg))
    assert runner2._maybe_keep_best(280.0, 0, "transfer_fid_mean") is not None
    out = capsys.readouterr().out
    assert "incomparable" in out
    rec = ckpt_lib.read_best(cfg.checkpoint_dir)
    assert rec["metric"] == "transfer_fid_mean" and rec["value"] == 280.0
    runner2.close()

    # different extractor, same metric name: also incomparable
    runner3 = Runner(
        cfg.replace(fid_extractor="random"), dataset=_dataset(cfg))
    assert runner3._maybe_keep_best(500.0, 0, "transfer_fid_mean") is not None
    runner3.close()

    # a pre-r5 record without the extractor field is trusted (legacy)
    best_json = os.path.join(cfg.checkpoint_dir, "best", "best.json")
    with open(best_json) as f:
        legacy = json.load(f)
    legacy.pop("fid_extractor")
    legacy.update(metric="fid", value=1.0)
    with open(best_json, "w") as f:
        json.dump(legacy, f)
    runner4 = Runner(cfg, dataset=_dataset(cfg))
    assert runner4._maybe_keep_best(2.0, 0, "fid") is None  # 2.0 >= 1.0
    runner4.close()


def test_keep_best_end_to_end_and_consumable(tmp_path):
    """keep_best through a real fit with FID tracking: best/ appears and
    `sample --checkpoint-dir <ckpt>/best` restores from it."""
    from PIL import Image as PILImage

    from gan_class_transfer2_tpu import cli
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt_lib

    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(8):
        arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        PILImage.fromarray(arr).save(d / f"img_{i}.png")
    cfg = tiny_test_config(
        steps=4, steps_per_epoch=2, epochs=2,
        dataset_pattern=str(d / "*.png"),
        fid_samples=4, keep_best=True, mesh_data=1,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2,
    )
    runner = Runner(cfg)
    runner.fit()
    runner.close()
    rec = ckpt_lib.read_best(cfg.checkpoint_dir)
    assert rec is not None and rec["metric"] == "fid"
    best_dir = os.path.join(cfg.checkpoint_dir, "best")
    assert len(ckpt_lib.all_steps(best_dir)) == 1

    rc = cli.main([
        "sample", "--platform", "cpu", "--checkpoint-dir", best_dir,
        "--out", str(tmp_path / "samples"), "--num", "1",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(str(tmp_path / "samples"),
                                       "sample_0.png"))
