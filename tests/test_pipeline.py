"""Pipeline parallelism (parallel/pipeline.py).

The PP path must be value-identical to the single-device train step at the
same global batch: same (t, ε) draws, microbatch-mean loss == full-batch
loss, accumulated grads == full-batch grads, one optimizer application.
Runs on the virtual 8-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.parallel import pipeline
from gan_class_transfer2_tpu.train import trainer as trainer_lib


def _cfg(**kw):
    kw.setdefault("batch_size", 4)
    kw.setdefault("octaves", 3)
    kw.setdefault("size", 16)
    kw.setdefault("pipeline_stages", 2)
    kw.setdefault("donate_state", False)
    return tiny_test_config(**kw)


def _batch(cfg, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(
        r.uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)).astype(
            np.float32
        )
    )


def _tree_allclose(a, b, atol=1e-5):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32), atol=atol,
            rtol=1e-5,
        )


# ------------------------------------------------------------------ planning


def test_plan_contiguous_and_complete():
    cfg = _cfg(octaves=6, size=64)
    for s in (2, 3, 4):
        plan = pipeline.plan_stages(cfg, s)
        assert len(plan) == s
        assert plan[0][0] == 0 and plan[-1][1] == cfg.octaves
        for (a, b), (c, d) in zip(plan, plan[1:]):
            assert b == c and a < b and c < d


def test_plan_balances_flops():
    cfg = _cfg(octaves=6, size=64)
    outer, per, mid = pipeline.octave_costs(cfg)
    plan = pipeline.plan_stages(cfg, 2)
    # total attributed cost must equal the analytic model flops
    from gan_class_transfer2_tpu.utils import benchmark

    assert 2 * (outer + sum(per) + mid) == benchmark.model_flops_per_image(cfg)
    # the chosen split must not be worse than the trivial midpoint split
    def cost(p):
        out = 0
        for s, (lo, hi) in enumerate(p):
            c = sum(per[lo:hi])
            if s == 0:
                c += outer
            if s == len(p) - 1:
                c += mid
            out = max(out, c)
        return out

    assert cost(plan) <= cost(((0, 3), (3, 6)))


def test_plan_rejects_more_stages_than_octaves():
    cfg = _cfg(octaves=3)
    with pytest.raises(ValueError):
        pipeline.plan_stages(cfg, 4)


def test_plan_explicit_cuts_override():
    # calibrated override (tools/pp_analysis.py --calibrate): the MAC plan
    # is wall-clock misbalanced on the MXU, so explicit cuts are a product
    # knob (BASELINE_MEASURED.md r4: cut=1 beats the MAC plan by 17%)
    cfg = _cfg(octaves=6, size=64).replace(pipeline_cuts="1")
    assert pipeline.plan_stages(cfg, 2) == ((0, 1), (1, 6))
    cfg3 = _cfg(octaves=6, size=64).replace(pipeline_cuts="2,4")
    assert pipeline.plan_stages(cfg3, 3) == ((0, 2), (2, 4), (4, 6))
    with pytest.raises(ValueError, match="cuts"):
        pipeline.plan_stages(cfg3, 2)  # wrong cut count for 2 stages


def test_config_validates_pipeline_cuts():
    with pytest.raises(ValueError, match="increasing"):
        _cfg(octaves=4).replace(pipeline_cuts="3,1").validate()
    with pytest.raises(ValueError, match="increasing"):
        _cfg(octaves=4).replace(pipeline_cuts="0").validate()
    with pytest.raises(ValueError, match="comma-separated"):
        _cfg(octaves=4).replace(pipeline_cuts="a,b").validate()
    with pytest.raises(ValueError, match="pipeline_cuts"):
        _cfg(octaves=4).replace(
            pipeline_stages=3, pipeline_cuts="1"
        ).validate()


# ------------------------------------------------------------- stage views


def test_stage_view_merge_roundtrip():
    cfg = _cfg(octaves=4)
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    plan = pipeline.plan_stages(cfg, 3)
    views = [pipeline.tree_stage_view(plan, state.params, s) for s in range(3)]
    # every leaf appears in exactly one view
    n_view = sum(len(jax.tree_util.tree_leaves(v)) for v in views)
    assert n_view == len(jax.tree_util.tree_leaves(state.params))
    rebuilt = state.params
    for s, v in enumerate(views):
        rebuilt = pipeline.tree_stage_merge(plan, rebuilt, s, v)
    _tree_allclose(rebuilt, state.params)


# ----------------------------------------------------------------- parity


@pytest.mark.parametrize(
    "stages,micro,cuts", [(2, 2, ""), (3, 4, ""), (2, 2, "1")]
)
def test_pipeline_matches_single_device_step(stages, micro, cuts):
    cfg = _cfg(
        octaves=3, batch_size=4, pipeline_stages=stages,
        pipeline_microbatches=micro, pipeline_cuts=cuts,
    )
    rng = jax.random.PRNGKey(7)
    state0 = trainer_lib.init_state(cfg, jax.random.PRNGKey(1))
    batch = _batch(cfg)

    ref_step = trainer_lib.make_train_step(cfg.replace(pipeline_stages=1))
    ref_state, ref_loss = ref_step(state0, batch, rng)

    tr = pipeline.PipelineTrainer(cfg)
    st = tr.place_state(state0)
    st, loss = tr.step(st, batch, rng)

    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)
    _tree_allclose(jax.device_get(st.params), jax.device_get(ref_state.params))
    assert int(st.step) == 1
    # optimizer state matches too (Adam moments follow the grads)
    _tree_allclose(
        jax.device_get(st.opt_state), jax.device_get(ref_state.opt_state),
        atol=1e-5,
    )


def test_pipeline_dp_matches_single_device_step():
    """PP x DP (2 stages x 2-way data parallel on 4 devices) is value-
    identical to the single-device step at the same global batch."""
    cfg = _cfg(
        octaves=3, batch_size=8, pipeline_stages=2,
        pipeline_microbatches=2, mesh_data=2,
    )
    rng = jax.random.PRNGKey(13)
    state0 = trainer_lib.init_state(cfg, jax.random.PRNGKey(6))
    batch = _batch(cfg)

    ref_step = trainer_lib.make_train_step(
        cfg.replace(pipeline_stages=1, mesh_data=1)
    )
    ref_state, ref_loss = ref_step(state0, batch, rng)

    tr = pipeline.PipelineTrainer(cfg)
    assert tr.dp == 2
    st = tr.place_state(state0)
    # params replicate over each stage's 2-device data mesh
    assert len(st.params["head"]["kernel"].sharding.device_set) == 2
    st, loss = tr.step(st, batch, rng)

    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)
    _tree_allclose(jax.device_get(st.params), jax.device_get(ref_state.params))
    _tree_allclose(
        jax.device_get(st.opt_state), jax.device_get(ref_state.opt_state),
        atol=1e-5,
    )


def test_pipeline_dp_threads_mesh_into_draw_and_diffuse(monkeypatch):
    """The prep program must pass stage 0's mesh + batch_spec to
    draw_and_diffuse when dp > 1 — the Mosaic fused-diffusion kernel cannot
    be GSPMD-partitioned, so on TPU the sharded-island route (or fallback)
    must engage exactly as in mesh.make_parallel_train_step. CPU tests
    can't compile the kernel, so pin the PLUMBING with a spy (same approach
    as tests/test_kernels_sharded.py)."""
    seen = {}
    real = trainer_lib.draw_and_diffuse

    def spy(cfg, batch, rng, **kw):
        seen.update(kw)
        return real(cfg, batch, rng, **kw)

    monkeypatch.setattr(pipeline.trainer_lib, "draw_and_diffuse", spy)
    cfg = _cfg(
        octaves=3, batch_size=8, pipeline_stages=2,
        pipeline_microbatches=2, mesh_data=2,
    )
    tr = pipeline.PipelineTrainer(cfg)
    st = tr.place_state(trainer_lib.init_state(cfg, jax.random.PRNGKey(0)))
    tr.step(st, _batch(cfg), jax.random.PRNGKey(1))
    assert seen.get("mesh") is tr.stage_meshes[0]
    assert seen.get("batch_spec") == jax.sharding.PartitionSpec("data")
    # pure PP (dp == 1): single-device stage programs need no mesh
    seen.clear()
    cfg1 = _cfg(octaves=3, batch_size=4, pipeline_stages=2,
                pipeline_microbatches=2, mesh_data=1)
    tr1 = pipeline.PipelineTrainer(cfg1)
    st1 = tr1.place_state(trainer_lib.init_state(cfg1, jax.random.PRNGKey(0)))
    tr1.step(st1, _batch(cfg1), jax.random.PRNGKey(1))
    assert seen.get("mesh") is None


def test_pipeline_step_with_donation_matches_reference():
    """donate_state=True (the production default) frees each stage's old
    params/moments/EMA/grad buffers. CPU ignores donation, so this pins the
    jit signatures and that no donated argument is reused by the schedule
    (JAX raises on reuse-after-donate where donation IS honoured)."""
    cfg = _cfg(octaves=3, batch_size=4, pipeline_microbatches=2,
               donate_state=True, ema_decay=0.99, grad_clip_norm=1.0)
    rng = jax.random.PRNGKey(3)
    state0 = trainer_lib.init_state(cfg, jax.random.PRNGKey(4))
    batch = _batch(cfg)
    ref_step = trainer_lib.make_train_step(
        cfg.replace(pipeline_stages=1, donate_state=False)
    )
    ref_state, ref_loss = ref_step(state0, batch, rng)

    tr = pipeline.PipelineTrainer(cfg)
    st = tr.place_state(trainer_lib.init_state(cfg, jax.random.PRNGKey(4)))
    st, loss = tr.step(st, batch, rng)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)
    _tree_allclose(jax.device_get(st.params), jax.device_get(ref_state.params))
    _tree_allclose(
        jax.device_get(st.ema_params), jax.device_get(ref_state.ema_params)
    )
    # a second step from the returned state must also run (the schedule
    # never hands a donated buffer back into a later program)
    st, loss2 = tr.step(st, _batch(cfg, seed=1), jax.random.PRNGKey(5))
    assert np.isfinite(float(loss2))


def test_pipeline_dp_rejects_indivisible_microbatch():
    with pytest.raises(ValueError, match="PP x DP"):
        pipeline.PipelineTrainer(
            _cfg(batch_size=4, pipeline_microbatches=2, mesh_data=4)
        )


def test_runner_trains_with_pipeline_dp(tmp_path):
    """End-to-end Runner on a 2-stage x 2-data pipeline: train, the eval
    program over the stage-0 data row, checkpoint."""
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset
    from gan_class_transfer2_tpu.train.loop import Runner

    cfg = _cfg(
        octaves=3,
        batch_size=4,
        pipeline_stages=2,
        mesh_data=2,
        steps=4,
        steps_per_epoch=2,
        epochs=1,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2,
    )
    images = np.random.default_rng(0).integers(
        0, 256, size=(8, cfg.size, cfg.size, 3), dtype=np.uint8
    )
    runner = Runner(cfg, dataset=ArrayDataset(images, cfg.batch_size, seed=0))
    assert dict(runner.mesh.shape) == {"data": 2, "model": 1}
    runner.fit(epochs=1, steps_per_epoch=2)
    runner.close()
    assert int(runner.state.step) == 2


def test_pipeline_two_steps_progress():
    cfg = _cfg(octaves=3, batch_size=4)
    tr = pipeline.PipelineTrainer(cfg)
    st = tr.init_state(jax.random.PRNGKey(0))
    losses = []
    for i in range(2):
        st, loss = tr.step(st, _batch(cfg, i), jax.random.PRNGKey(3))
        losses.append(float(loss))
    assert int(st.step) == 2
    assert all(np.isfinite(l) for l in losses)


def test_pipeline_ema_matches_single_device():
    cfg = _cfg(octaves=3, batch_size=4, ema_decay=0.9)
    rng = jax.random.PRNGKey(5)
    state0 = trainer_lib.init_state(cfg, jax.random.PRNGKey(2))
    batch = _batch(cfg)
    ref_state, _ = trainer_lib.make_train_step(
        cfg.replace(pipeline_stages=1)
    )(state0, batch, rng)
    tr = pipeline.PipelineTrainer(cfg)
    st, _ = tr.step(tr.place_state(state0), batch, rng)
    _tree_allclose(
        jax.device_get(st.ema_params), jax.device_get(ref_state.ema_params)
    )


def test_pipeline_epsilon_parameterization_parity():
    cfg = _cfg(octaves=3, batch_size=4, parameterization="scaled_epsilon")
    rng = jax.random.PRNGKey(9)
    state0 = trainer_lib.init_state(cfg, jax.random.PRNGKey(3))
    batch = _batch(cfg)
    _, ref_loss = trainer_lib.make_train_step(
        cfg.replace(pipeline_stages=1)
    )(state0, batch, rng)
    tr = pipeline.PipelineTrainer(cfg)
    _, loss = tr.step(tr.place_state(state0), batch, rng)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)


# ------------------------------------------------------------ device layout


def test_state_leaves_live_on_stage_devices():
    cfg = _cfg(octaves=4, pipeline_stages=3, pipeline_microbatches=2)
    tr = pipeline.PipelineTrainer(cfg)
    st = tr.init_state(jax.random.PRNGKey(0))
    plan = tr.plan

    def dev(x):
        (d,) = x.devices()
        return d

    assert dev(st.params["head"]["kernel"]) == tr.devices[0]
    assert dev(st.params["octaves"][plan[-1][0]]["down"]["kernel"]) == tr.devices[-1]
    # Adam moments follow their parameters' stage
    mu = st.opt_state[0].mu if hasattr(st.opt_state[0], "mu") else None
    if mu is not None:
        assert dev(mu["head"]["kernel"]) == tr.devices[0]
        assert dev(mu["octaves"][plan[-1][0]]["down"]["kernel"]) == tr.devices[-1]


def test_checkpoint_state_is_plain_trainstate(tmp_path):
    """The pipeline state round-trips through the standard checkpoint
    machinery and re-places cleanly — checkpoint interchange with the
    single-device path."""
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt_lib

    cfg = _cfg(octaves=3, checkpoint_dir=str(tmp_path / "ckpt"))
    tr = pipeline.PipelineTrainer(cfg)
    st = tr.init_state(jax.random.PRNGKey(0))
    st, _ = tr.step(st, _batch(cfg), jax.random.PRNGKey(1))
    ckpt_lib.save(cfg.checkpoint_dir, st, cfg)
    template = trainer_lib.init_state(cfg, jax.random.PRNGKey(4))
    restored = ckpt_lib.restore(cfg.checkpoint_dir, template)
    _tree_allclose(jax.device_get(restored.params), jax.device_get(st.params))
    # and back onto the pipeline devices
    replaced = tr.place_state(restored)
    st2, loss = tr.step(replaced, _batch(cfg, 1), jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert int(st2.step) == 2


# ------------------------------------------------------------------ runner


def test_runner_trains_with_pipeline(tmp_path):
    """End-to-end: the real Runner on a 2-stage pipeline — train, eval
    program, checkpoint, resume across a fresh Runner."""
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset
    from gan_class_transfer2_tpu.train.loop import Runner

    cfg = _cfg(
        octaves=3,
        batch_size=2,
        pipeline_stages=2,
        steps=4,
        steps_per_epoch=3,
        epochs=2,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=3,
    )
    images = np.random.default_rng(0).integers(
        0, 256, size=(8, cfg.size, cfg.size, 3), dtype=np.uint8
    )
    runner = Runner(cfg, dataset=ArrayDataset(images, cfg.batch_size, seed=0))
    runner.fit(epochs=1, steps_per_epoch=3)
    runner.close()
    assert int(runner.state.step) == 3

    # resume: a fresh pipeline Runner restores and re-places the state
    runner2 = Runner(cfg, dataset=ArrayDataset(images, cfg.batch_size, seed=0))
    assert int(runner2.state.step) == 3
    runner2.fit(epochs=1, steps_per_epoch=3)
    runner2.close()
    assert int(runner2.state.step) == 6


# -------------------------------------------------------------- validation


def test_pipeline_rejects_incompatible_configs():
    with pytest.raises(ValueError):
        pipeline.PipelineTrainer(_cfg(zero1=True))
    with pytest.raises(ValueError):
        pipeline.PipelineTrainer(_cfg(grad_accum=2))
    with pytest.raises(ValueError):
        pipeline.PipelineTrainer(_cfg(batch_size=3, pipeline_microbatches=2))
    with pytest.raises(ValueError):
        pipeline.PipelineTrainer(_cfg(mesh_model=2))
    with pytest.raises(ValueError):
        _cfg(octaves=2, pipeline_stages=3).validate()


def test_pipeline_grad_clip_uses_global_norm():
    """clip_by_global_norm must see the GLOBAL gradient norm: per-stage
    clipping against each stage's own sub-tree norm diverges from the
    single-device step whenever the norm exceeds the threshold."""
    # a tiny clip threshold guarantees the clip actually triggers
    cfg = _cfg(octaves=3, batch_size=4, grad_clip_norm=1e-3)
    rng = jax.random.PRNGKey(11)
    state0 = trainer_lib.init_state(cfg, jax.random.PRNGKey(4))
    batch = _batch(cfg)
    ref_state, ref_loss = trainer_lib.make_train_step(
        cfg.replace(pipeline_stages=1)
    )(state0, batch, rng)
    tr = pipeline.PipelineTrainer(cfg)
    st, loss = tr.step(tr.place_state(state0), batch, rng)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)
    _tree_allclose(jax.device_get(st.params), jax.device_get(ref_state.params))


def test_pipeline_step_rejects_indivisible_runtime_batch():
    """step() is public API: a batch not divisible by the microbatch count
    must raise, not silently drop the tail from loss/grads (review r4)."""
    import pytest as _pytest

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train import trainer

    cfg = tiny_test_config(
        batch_size=4, pipeline_stages=2, pipeline_microbatches=2,
        mesh_data=1, donate_state=False,
    )
    pp = pipeline.PipelineTrainer(cfg)
    state = pp.place_state(trainer.init_state(cfg, jax.random.PRNGKey(0)))
    r = np.random.default_rng(0)
    bad = jnp.asarray(
        r.uniform(-1, 1, (3, cfg.size, cfg.size, 3)), jnp.float32
    )
    with _pytest.raises(ValueError, match="divisible"):
        pp.step(state, bad, jax.random.PRNGKey(1))
