"""Checkpoint/resume tests (new capability vs reference — SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.train import trainer
from gan_class_transfer2_tpu.utils import checkpoint as ckpt


def test_save_restore_roundtrip(tmp_path):
    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg.replace(donate_state=False))
    batch = jnp.zeros((cfg.batch_size, cfg.size, cfg.size, 3))
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    d = str(tmp_path / "ckpt")
    ckpt.save(d, state, cfg)
    assert ckpt.latest_step(d) == 1

    template = trainer.init_state(cfg, jax.random.PRNGKey(42))
    restored = ckpt.restore(d, template)
    assert int(restored.step) == 1
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]),
    )
    # optimizer state restored too (adam mu)
    flat_a = jax.tree_util.tree_leaves(restored.opt_state)
    flat_b = jax.tree_util.tree_leaves(state.opt_state)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step_picks_max(tmp_path):
    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    d = str(tmp_path / "ckpt")
    ckpt.save(d, state, cfg, step=5)
    ckpt.save(d, state, cfg, step=12)
    assert ckpt.latest_step(d) == 12


def test_config_roundtrip(tmp_path):
    cfg = tiny_test_config(parameterization="epsilon", loss="l1")
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    d = str(tmp_path / "ckpt")
    ckpt.save(d, state, cfg)
    cfg2 = ckpt.load_config(d)
    assert cfg2 == cfg


def test_latest_step_empty(tmp_path):
    assert ckpt.latest_step(str(tmp_path / "nope")) is None


def test_save_same_step_twice_is_idempotent(tmp_path):
    """Interrupt right after a periodic save must not crash (review
    finding: orbax refuses existing destinations)."""
    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    d = str(tmp_path / "ckpt")
    p1 = ckpt.save(d, state, cfg, step=7)
    p2 = ckpt.save(d, state, cfg, step=7)
    assert p1 == p2
    assert ckpt.latest_step(d) == 7


def test_sharded_state_checkpoint_roundtrip(tmp_path):
    """Save a mesh-sharded TrainState and restore it onto a fresh sharded
    template (multi-chip checkpoint/resume path)."""
    from gan_class_transfer2_tpu.parallel import mesh as mesh_lib

    cfg = tiny_test_config(batch_size=4, donate_state=False)
    m = mesh_lib.make_mesh(data=4, model=2)
    state = mesh_lib.init_sharded_state(cfg, m, jax.random.PRNGKey(0))
    d = str(tmp_path / "ckpt")
    ckpt.save(d, state, cfg)

    template = mesh_lib.init_sharded_state(cfg, m, jax.random.PRNGKey(9))
    restored = ckpt.restore(d, template)
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]),
    )
    # restored state still trains over the mesh
    pstep = mesh_lib.make_parallel_train_step(cfg, m)
    batch = jax.device_put(
        jnp.zeros((cfg.batch_size, cfg.size, cfg.size, 3)),
        mesh_lib.batch_sharding(m),
    )
    _, loss = pstep(restored, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_elastic_restore_across_mesh_shapes(tmp_path):
    """Checkpoints are mesh-agnostic (pod resize / elasticity): a state
    saved from a ZeRO-1 data=4 run restores bit-identically into a data=2
    ZeRO-1 template AND a single-device template, and both continue
    training. Disk layout is always host-complete full arrays
    (utils/checkpoint.host_complete); restore re-places onto whatever
    sharding the template carries."""
    from gan_class_transfer2_tpu.parallel import mesh as mesh_lib

    kw = dict(batch_size=4, donate_state=False, zero1=True,
              pixel_size=8, max_size=16)
    cfg4 = tiny_test_config(mesh_data=4, mesh_model=1, **kw)
    m4 = mesh_lib.make_mesh(data=4, model=1)
    state = mesh_lib.init_sharded_state(cfg4, m4, jax.random.PRNGKey(0))
    batch4 = jax.device_put(
        jnp.linspace(-1.0, 1.0, 4 * cfg4.size * cfg4.size * 3)
        .reshape(4, cfg4.size, cfg4.size, 3)
        .astype(jnp.float32),
        mesh_lib.batch_sharding(m4),
    )
    state, _ = mesh_lib.make_parallel_train_step(cfg4, m4)(
        state, batch4, jax.random.PRNGKey(1)
    )
    d = str(tmp_path / "ckpt")
    ckpt.save(d, ckpt.host_complete(state), cfg4)
    want = jax.tree_util.tree_leaves(ckpt.host_complete(state))

    def assert_same(restored):
        got = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, restored)
        )
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, np.asarray(w))

    # shrink the mesh: data=2 ZeRO-1 template
    cfg2 = cfg4.replace(mesh_data=2)
    m2 = mesh_lib.make_mesh(data=2, model=1)
    restored2 = ckpt.restore(d, mesh_lib.init_sharded_state(
        cfg2, m2, jax.random.PRNGKey(9)))
    assert_same(restored2)
    batch2 = jax.device_put(np.asarray(batch4), mesh_lib.batch_sharding(m2))
    _, loss2 = mesh_lib.make_parallel_train_step(cfg2, m2)(
        restored2, batch2, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss2))

    # collapse to a single device
    cfg1 = cfg4.replace(mesh_data=1, zero1=False)
    restored1 = ckpt.restore(
        d, trainer.init_state(cfg1, jax.random.PRNGKey(8)))
    assert_same(restored1)
    _, loss1 = trainer.make_train_step(cfg1)(
        restored1, np.asarray(batch4), jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss1))


def test_partial_save_is_repaired(tmp_path):
    """A crash mid-save must not leave a step dir that latest_step selects
    (ADVICE r1): saves go to step_<N>.tmp and rename into place, and a stale
    .tmp from a crashed save is swept on the next attempt."""
    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    d = tmp_path / "ckpt"
    d.mkdir()
    # simulate a crashed save: partial tmp dir with junk inside
    stale = d / "step_000000000.tmp"
    stale.mkdir()
    (stale / "garbage").write_text("partial")
    assert ckpt.latest_step(str(d)) is None  # .tmp never matches
    ckpt.save(str(d), state, cfg)
    assert ckpt.latest_step(str(d)) == 0
    assert not stale.exists()
    restored = ckpt.restore(str(d), trainer.init_state(cfg, jax.random.PRNGKey(1)))
    assert int(restored.step) == 0


def test_checkpoint_retention(tmp_path):
    """checkpoint_keep prunes all but the newest N step dirs (+sidecars)."""
    import jax

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train import trainer
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt

    cfg = tiny_test_config(
        checkpoint_dir=str(tmp_path), checkpoint_keep=2, donate_state=False
    )
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    for s in (1, 2, 3, 4):
        ckpt.save(str(tmp_path), state, cfg, step=s, extra={"n": s})
    assert ckpt.all_steps(str(tmp_path)) == [3, 4]
    assert ckpt.load_extra(str(tmp_path), 4) == {"n": 4}
    assert ckpt.load_extra(str(tmp_path), 2) is None  # pruned with its dir
    # keep=0 (default) keeps everything
    cfg0 = cfg.replace(checkpoint_keep=0)
    ckpt.save(str(tmp_path), state, cfg0, step=5)
    assert ckpt.all_steps(str(tmp_path)) == [3, 4, 5]


def test_prune_protects_current_step(tmp_path):
    """save() on an ALREADY-persisted old step must not prune that step
    away (the caller is told it is persisted — review r5 finding)."""
    import jax

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train import trainer
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt

    cfg = tiny_test_config(
        checkpoint_dir=str(tmp_path), checkpoint_keep=1, donate_state=False
    )
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    cfg0 = cfg.replace(checkpoint_keep=0)
    for s in (1, 2, 3):
        ckpt.save(str(tmp_path), state, cfg0, step=s)  # no pruning yet
    # re-save of the OLD step 1 with keep=1: step 1 must survive
    path = ckpt.save(str(tmp_path), state, cfg, step=1)
    import os
    assert os.path.isdir(path)
    steps = ckpt.all_steps(str(tmp_path))
    assert 1 in steps and 3 in steps  # protected + newest


def test_prune_retention_counts_protected_step(tmp_path):
    """A protected step that is already among the newest ``keep`` dirs must
    COUNT toward retention — keep=2 retains 2 dirs, not 3 (ADVICE r2)."""
    import jax

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train import trainer
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt

    cfg0 = tiny_test_config(checkpoint_dir=str(tmp_path), donate_state=False)
    state = trainer.init_state(cfg0, jax.random.PRNGKey(0))
    for s in (1, 2, 3):
        ckpt.save(str(tmp_path), state, cfg0, step=s)  # keep=0: no pruning
    # re-save newest step with keep=2: protected (=3) is within the newest 2,
    # so retention must still leave exactly 2 dirs
    cfg = cfg0.replace(checkpoint_keep=2)
    ckpt.save(str(tmp_path), state, cfg, step=3)
    assert ckpt.all_steps(str(tmp_path)) == [2, 3]


def test_save_protects_just_written_older_step(tmp_path):
    """A fresh save at a step OLDER than the newest ``keep`` dirs (resume
    from an explicit earlier step, then train) must survive its own
    retention pass — pruning it would delete the checkpoint save() just
    reported as persisted (review r3e)."""
    import os

    import jax

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train import trainer
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt

    cfg0 = tiny_test_config(checkpoint_dir=str(tmp_path), donate_state=False)
    state = trainer.init_state(cfg0, jax.random.PRNGKey(0))
    for s in (3000, 4000, 5000):
        ckpt.save(str(tmp_path), state, cfg0, step=s)
    cfg = cfg0.replace(checkpoint_keep=2)
    path = ckpt.save(str(tmp_path), state, cfg, step=1500)
    assert os.path.isdir(path)  # the step just written survives retention
    # documented prune contract: keep+1 dirs exactly when the protected
    # step ranks below the newest `keep` (it still counts toward the total)
    assert ckpt.all_steps(str(tmp_path)) == [1500, 4000, 5000]


def test_host_extra_sidecar_roundtrip_and_prune(tmp_path):
    """Per-host data-position sidecars (pod runs): save_host_extra writes
    this process's own file, load_extra(host=k) prefers it and falls back
    to the coordinator sidecar for hosts without one, and prune removes
    every sidecar flavour alongside the step dir."""
    import os

    import jax

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train import trainer
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt

    cfg = tiny_test_config(checkpoint_dir=str(tmp_path), donate_state=False)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    ckpt.save(str(tmp_path), state, cfg, step=5,
              extra={"data": {"class_0": {"batches_served": 7}}})
    # this process is index 0 here; its host sidecar carries its own view
    path = ckpt.save_host_extra(
        str(tmp_path), 5, {"data": {"class_0": {"batches_served": 9}}}
    )
    assert os.path.basename(path) == "step_000000005.extra.host0.json"

    got0 = ckpt.load_extra(str(tmp_path), host=0)
    assert got0["data"]["class_0"]["batches_served"] == 9
    # a host with no sidecar of its own falls back to the coordinator's
    got1 = ckpt.load_extra(str(tmp_path), host=1)
    assert got1["data"]["class_0"]["batches_served"] == 7
    # host=None keeps the original behavior
    assert ckpt.load_extra(str(tmp_path))["data"]["class_0"][
        "batches_served"] == 7

    ckpt.save(str(tmp_path), state, cfg, step=6)
    ckpt.prune(str(tmp_path), keep=1)
    assert ckpt.all_steps(str(tmp_path)) == [6]
    leftovers = [e for e in os.listdir(tmp_path) if ".extra" in e]
    assert leftovers == []


def test_prune_sweeps_orphan_host_sidecars(tmp_path):
    """Host sidecars are written before the coordinator's save commits, so
    a crashed save leaves an orphan step_<N>.extra.host<k>.json. prune
    sweeps orphans older than the newest committed dir but leaves newer
    ones (a save may be in flight)."""
    import os

    import jax

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train import trainer
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt

    cfg = tiny_test_config(checkpoint_dir=str(tmp_path), donate_state=False)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    for s in (5, 8):
        ckpt.save(str(tmp_path), state, cfg, step=s)
    ckpt.save_host_extra(str(tmp_path), 3, {"data": {}})   # orphan, old
    ckpt.save_host_extra(str(tmp_path), 8, {"data": {}})   # committed step
    ckpt.save_host_extra(str(tmp_path), 11, {"data": {}})  # in-flight save

    ckpt.prune(str(tmp_path), keep=2)
    names = set(os.listdir(tmp_path))
    assert "step_000000003.extra.host0.json" not in names
    assert "step_000000008.extra.host0.json" in names
    assert "step_000000011.extra.host0.json" in names


# ------------------------------------------------------------- async saver


def test_async_saver_matches_sync_save(tmp_path):
    """AsyncSaver commits the identical checkpoint a blocking save would."""
    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    host_state = ckpt.host_complete(state)

    sync_dir, async_dir = str(tmp_path / "sync"), str(tmp_path / "async")
    ckpt.save(sync_dir, host_state, cfg, step=7)
    saver = ckpt.AsyncSaver()
    path = saver.submit(async_dir, host_state, cfg, step=7)
    saver.wait()
    assert path.endswith("step_000000007")
    assert ckpt.latest_step(async_dir) == 7

    template = trainer.init_state(cfg, jax.random.PRNGKey(9))
    a = ckpt.restore(sync_dir, template)
    b = ckpt.restore(async_dir, template)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    saver.close()


def test_async_saver_orders_saves_and_prunes(tmp_path):
    """Back-to-back submissions commit in order on one worker; retention
    applies after the last."""
    cfg = tiny_test_config().replace(checkpoint_keep=2)
    state = ckpt.host_complete(trainer.init_state(cfg, jax.random.PRNGKey(0)))
    d = str(tmp_path / "ckpt")
    saver = ckpt.AsyncSaver()
    for s in (1, 2, 3, 4):
        saver.submit(d, state, cfg, step=s)
    saver.wait()
    assert ckpt.all_steps(d) == [3, 4]
    saver.close()


def test_async_saver_backpressure_bounds_queue(tmp_path, monkeypatch):
    """submit() blocks once max_pending saves are queued — a slow disk must
    degrade to synchronous saves, not accumulate host-state copies."""
    import threading

    cfg = tiny_test_config()
    state = ckpt.host_complete(trainer.init_state(cfg, jax.random.PRNGKey(0)))
    d = str(tmp_path / "ckpt")

    gate = threading.Event()
    real_save = ckpt.save

    def slow_save(*args, **kwargs):
        gate.wait(timeout=30)
        return real_save(*args, **kwargs)

    monkeypatch.setattr(ckpt, "save", slow_save)
    saver = ckpt.AsyncSaver(max_pending=2)
    saver.submit(d, state, cfg, step=1)  # worker blocks on the gate
    saver.submit(d, state, cfg, step=2)  # queued

    third_done = threading.Event()
    t = threading.Thread(
        target=lambda: (saver.submit(d, state, cfg, step=3), third_done.set())
    )
    t.start()
    # the third submit must be blocked while two saves are pending
    assert not third_done.wait(timeout=0.5)
    gate.set()
    t.join(timeout=30)
    assert third_done.is_set()
    saver.wait()
    assert ckpt.all_steps(d) == [1, 2, 3]
    saver.close()


def test_async_saver_surfaces_background_failure(tmp_path):
    """A failed background write must raise on wait(), not vanish —
    resilience trusts that a submitted checkpoint exists."""
    import pytest

    cfg = tiny_test_config()
    state = ckpt.host_complete(trainer.init_state(cfg, jax.random.PRNGKey(0)))
    target = tmp_path / "ckpt"
    target.write_text("not a directory")  # makedirs will fail on a file
    saver = ckpt.AsyncSaver()
    saver.submit(str(target), state, cfg, step=1)
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        saver.wait()


def test_runner_trains_with_async_checkpointing(tmp_path):
    """End-to-end: Runner with checkpoint_async=True saves on the cadence,
    flushes at the end of fit, and the checkpoints restore."""
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset
    from gan_class_transfer2_tpu.train.loop import Runner

    cfg = tiny_test_config().replace(
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2,
        checkpoint_async=True,
        log_dir=str(tmp_path / "logs"),
        mesh_data=1,
    )
    images = np.random.default_rng(0).integers(
        0, 256, size=(8, cfg.size, cfg.size, 3), dtype=np.uint8
    )
    runner = Runner(cfg, dataset=ArrayDataset(images, cfg.batch_size, seed=0))
    runner.fit(epochs=1, steps_per_epoch=4, log_samples=False)
    assert ckpt.all_steps(cfg.checkpoint_dir) == [2, 4]
    template = trainer.init_state(cfg, jax.random.PRNGKey(3))
    restored = ckpt.restore(cfg.checkpoint_dir, template)
    assert int(restored.step) == 4
    runner.close()


def test_config_json_written_atomically(tmp_path):
    """config.json goes through tmp+rename like every other artifact —
    resume reads it (cli.load_config), so a crash mid-dump must not leave
    a truncated file (review r4)."""
    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train import trainer
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt

    cfg = tiny_test_config(checkpoint_dir=str(tmp_path))
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    ckpt.save(str(tmp_path), state, cfg)
    assert (tmp_path / "config.json").exists()
    assert not (tmp_path / "config.json.tmp").exists()
    ckpt.load_config(str(tmp_path))  # round-trips


def test_prune_sweeps_crashed_sidecar_tmp_files(tmp_path):
    """A crash between a sidecar's tmp write and its rename leaks
    step_<N>.extra*.json.tmp; prune sweeps them for steps older than the
    newest committed dir — orphaned or next to a committed dir alike
    (review r4)."""
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt

    for s in (3, 6, 9):
        (tmp_path / f"step_{s:09d}").mkdir()
    # crashed sidecar writes: orphaned (step 4) and next to a committed
    # dir (step 3); a .tmp at the newest step may be a save in flight
    leak_orphan = tmp_path / "step_000000004.extra.json.tmp"
    leak_committed = tmp_path / "step_000000003.extra.host1.json.tmp"
    in_flight = tmp_path / "step_000000009.extra.json.tmp"
    for p in (leak_orphan, leak_committed, in_flight):
        p.write_text("{}")
    ckpt.prune(str(tmp_path), keep=3)
    assert not leak_orphan.exists()
    assert not leak_committed.exists()
    assert in_flight.exists()  # newest step: may belong to a live save


def test_fit_resilient_no_checkpoint_donated_state_reraises(tmp_path):
    """With donate_state and NO checkpoint yet, a retry would only crash on
    the deleted donated buffers and mask the original error — fit_resilient
    re-raises immediately (review r4). Without donation the in-memory
    retry path stays intact."""
    import pytest as _pytest

    from gan_class_transfer2_tpu.train.resilience import ResilientRunnerMixin

    class Boom(ResilientRunnerMixin):
        def __init__(self, cfg):
            self.cfg = cfg
            self.calls = 0

        def fit(self, **kw):
            self.calls += 1
            raise RuntimeError("boom")

    r = Boom(tiny_test_config(
        checkpoint_dir=str(tmp_path / "d"), donate_state=True
    ))
    with _pytest.raises(RuntimeError, match="boom"):
        r.fit_resilient(max_restarts=3)
    assert r.calls == 1

    r2 = Boom(tiny_test_config(
        checkpoint_dir=str(tmp_path / "e"), donate_state=False
    ))
    with _pytest.raises(RuntimeError, match="boom"):
        r2.fit_resilient(max_restarts=2)
    assert r2.calls == 3


def test_fit_resilient_replaces_restored_pipeline_state(tmp_path):
    """After a mid-fit restore, pipeline runners must re-place the restored
    (default-device) leaves onto their stage meshes, exactly as
    Runner.__init__ does after its restore (review r4)."""
    from gan_class_transfer2_tpu.train.resilience import ResilientRunnerMixin

    cfg = tiny_test_config(checkpoint_dir=str(tmp_path), donate_state=False)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    ckpt.save(str(tmp_path), state, cfg)

    class FakePipeline:
        placed = 0

        def place_state(self, s):
            self.placed += 1
            return s

    class R(ResilientRunnerMixin):
        def __init__(self):
            self.cfg = cfg
            self.state = state
            self._pipeline = FakePipeline()
            self.calls = 0

        def fit(self, **kw):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("transient")
            return self.state

    r = R()
    r.fit_resilient(max_restarts=2)
    assert r.calls == 2
    assert r._pipeline.placed == 1
