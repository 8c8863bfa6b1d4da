"""Progressive sampler distillation (train/distill.py).

The load-bearing test is the oracle check: a student whose prediction IS the
closed-form distillation target must, sampled at stride 2s, reproduce the
stride-s teacher sampler's output exactly — this pins the target algebra to
the real sampler recurrence (sample/sampler.py, reference train.py:439-496)
rather than to the derivation in the module docstring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.core import diffusion
from gan_class_transfer2_tpu.data.pipeline import ArrayDataset, device_iterator
from gan_class_transfer2_tpu.models import unet
from gan_class_transfer2_tpu.sample import sampler
from gan_class_transfer2_tpu.train import distill


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()  # steps=10, x-parameterization default
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    r = np.random.default_rng(0)
    init = jnp.asarray(r.normal(size=(2, cfg.size, cfg.size, 3)), jnp.float32)
    return cfg, params, init


def _oracle_student_sample(cfg, teacher_params, init, stride, class_idx=None):
    """Run the student sampler grid with the CLOSED-FORM target (mapped to
    the model's prediction space) as the student's prediction — a
    perfectly-distilled student."""
    x_theta = epsilon_theta = init
    b = init.shape[0]
    for t in distill.student_grid(cfg, stride):
        t_b = jnp.full((b, 1, 1, 1), float(t), jnp.float32)
        fake = diffusion.renoise(cfg, x_theta, epsilon_theta, float(t))
        x_target = distill.distill_target(
            cfg, teacher_params, fake, t_b, stride, class_idx
        )
        pred = distill.x_to_prediction(cfg, x_target, fake, t_b)
        x_theta, epsilon_theta = diffusion.step_update(
            cfg, pred, fake, epsilon_theta, float(t)
        )
    return x_theta


@pytest.mark.parametrize("teacher_stride", [1, 2])
def test_oracle_student_matches_teacher_sampler(setup, teacher_stride):
    """Perfect student at stride 2s == teacher sampler at stride s, exactly
    (both trajectories are the same deterministic DDIM recurrence)."""
    cfg, params, init = setup
    teacher_cfg = cfg.replace(sample_stride=teacher_stride)
    teacher_out = jax.jit(
        lambda p, b: sampler.sample(teacher_cfg, p, b).images
    )(params, init)
    student_out = _oracle_student_sample(
        teacher_cfg, params, init, 2 * teacher_stride
    )
    np.testing.assert_allclose(
        np.asarray(student_out), np.asarray(teacher_out), atol=1e-4
    )


@pytest.mark.parametrize("parameterization", ["epsilon", "scaled_epsilon"])
def test_oracle_matches_for_epsilon_parameterizations(setup, parameterization):
    """The x-space closed form is parameterization-independent; mapped into
    ε/scaled-ε prediction space it must still reproduce the teacher
    trajectory exactly."""
    cfg, params, init = setup
    p_cfg = cfg.replace(parameterization=parameterization, sample_stride=1)
    teacher_out = jax.jit(
        lambda p, b: sampler.sample(p_cfg, p, b).images
    )(params, init)
    student_out = _oracle_student_sample(p_cfg, params, init, 2)
    np.testing.assert_allclose(
        np.asarray(student_out), np.asarray(teacher_out), atol=1e-3
    )


def test_oracle_matches_for_conditional_checkpoint(setup):
    """Class labels thread through teacher and student alike: the oracle
    student must reproduce the conditional teacher's per-class trajectory."""
    cfg, _, init = setup
    c_cfg = cfg.replace(num_classes=2, sample_stride=1)
    from gan_class_transfer2_tpu.models import api as model_api

    c_params = model_api.init_denoiser(jax.random.PRNGKey(5), c_cfg)
    cls = jnp.asarray([0, 1], jnp.int32)
    teacher_out = jax.jit(
        lambda p, b: sampler.sample(c_cfg, p, b, class_idx=cls).images
    )(c_params, init)
    student_out = _oracle_student_sample(c_cfg, c_params, init, 2, cls)
    np.testing.assert_allclose(
        np.asarray(student_out), np.asarray(teacher_out), atol=1e-4
    )
    # and the two classes genuinely produce different trajectories
    assert not np.allclose(
        np.asarray(teacher_out[0]), np.asarray(teacher_out[1]), atol=1e-3
    )


def test_distill_round_trains(setup):
    """A few optimizer steps on the real loss: finite, and the student moves
    toward the two-step teacher target (loss drops from the self-init)."""
    cfg, params, _ = setup
    images = np.random.default_rng(1).integers(
        0, 256, size=(8, cfg.size, cfg.size, 3), dtype=np.uint8
    )
    data_iter = device_iterator(ArrayDataset(images, cfg.batch_size, seed=0))

    # initial loss of the untouched student (== teacher)
    rng = jax.random.PRNGKey(3)
    batch0 = next(data_iter).astype(jnp.float32) / 128.0 - 1.0
    loss0 = float(distill.distill_loss(cfg, params, params, batch0, rng, 2))
    assert np.isfinite(loss0) and loss0 > 0

    student, loss = distill.distill_round(
        cfg, params, data_iter, stride=2, steps=8, rng=rng, log=lambda *_: None
    )
    assert np.isfinite(loss)
    assert jax.tree_util.tree_structure(student) == jax.tree_util.tree_structure(
        params
    )
    # the student must actually have moved
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc + float(jnp.abs(pair).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, student, params),
        0.0,
    )
    assert moved > 0


def test_distill_round_mesh_matches_single_device(setup):
    """distill_round over a 4-device data mesh is value-identical to the
    single-device round on the same batch stream (the GSPMD-inserted
    gradient all-reduce only changes placement, not math)."""
    from gan_class_transfer2_tpu.parallel import mesh as mesh_lib

    cfg, params, _ = setup
    cfg = cfg.replace(batch_size=4, donate_state=False)
    images = np.random.default_rng(5).integers(
        0, 256, size=(8, cfg.size, cfg.size, 3), dtype=np.uint8
    )

    def run(mesh):
        it = device_iterator(
            ArrayDataset(images, cfg.batch_size, seed=0),
            mesh_lib.batch_sharding(mesh) if mesh is not None else None,
        )
        return distill.distill_round(
            cfg, params, it, stride=2, steps=3,
            rng=jax.random.PRNGKey(11), log=lambda *_: None, mesh=mesh,
        )

    ref_student, ref_loss = run(None)
    mesh = mesh_lib.make_mesh(data=4, model=1)
    student, loss = run(mesh)
    # the student trained data-parallel: params replicated over the mesh
    leaf = jax.tree_util.tree_leaves(student)[0]
    assert len(leaf.sharding.device_set) == 4
    np.testing.assert_allclose(loss, ref_loss, atol=1e-5, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(student)),
        jax.tree_util.tree_leaves(jax.device_get(ref_student)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_distill_round_conditional_labeled_batches(setup):
    """Conditional checkpoints train on labeled dict batches (the
    LabeledDataset format, {"image", "label"})."""
    cfg, _, _ = setup
    c_cfg = cfg.replace(num_classes=2)
    from gan_class_transfer2_tpu.models import api as model_api

    params = model_api.init_denoiser(jax.random.PRNGKey(7), c_cfg)
    r = np.random.default_rng(3)

    def labeled_iter():
        while True:
            yield {
                "image": jnp.asarray(
                    r.normal(size=(c_cfg.batch_size, c_cfg.size, c_cfg.size, 3)),
                    jnp.float32,
                ),
                "label": jnp.asarray(
                    r.integers(0, 2, size=(c_cfg.batch_size,)), jnp.int32
                ),
            }

    student, loss = distill.distill_round(
        c_cfg, params, labeled_iter(), stride=2, steps=3,
        rng=jax.random.PRNGKey(8), log=lambda *_: None,
    )
    assert np.isfinite(loss)
    assert jax.tree_util.tree_structure(student) == jax.tree_util.tree_structure(
        params
    )


def test_progressive_distill_reaches_target_stride(setup):
    cfg, params, _ = setup
    images = np.random.default_rng(2).integers(
        0, 256, size=(8, cfg.size, cfg.size, 3), dtype=np.uint8
    )
    data_iter = device_iterator(ArrayDataset(images, cfg.batch_size, seed=0))
    student, stride = distill.progressive_distill(
        cfg, params, data_iter, target_stride=4, steps_per_round=2,
        log=lambda *_: None,
    )
    assert stride == 4
    assert jax.tree_util.tree_structure(student) == jax.tree_util.tree_structure(
        params
    )


def test_distill_opt_config_round_sized_schedule(setup):
    """A fresh warmup/cosine restart sized for the original run must not eat
    the distillation round: warmup is capped at steps/10 and the schedule is
    ramp-then-constant."""
    cfg, _, _ = setup
    big = cfg.replace(warm_up=2000, lr_schedule="cosine")
    opt_cfg = distill.distill_opt_config(big, steps=300)
    assert opt_cfg.warm_up == 30
    assert opt_cfg.lr_schedule == "warmup"
    # an already-short warmup is preserved
    assert distill.distill_opt_config(cfg.replace(warm_up=3), 300).warm_up == 3


def test_ema_not_decayed_on_accumulation_micro_steps(setup):
    """Under grad_accum, EMA blends only when MultiSteps applies an update
    (the same mini_step==0 gate as trainer.train_step)."""
    cfg, params, _ = setup
    a_cfg = cfg.replace(grad_accum=2, ema_decay=0.9, donate_state=False)
    state = trainer_state_for(a_cfg, params)
    step_fn = distill.make_distill_step(a_cfg, 2)
    batch = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, cfg.size, cfg.size, 3)),
        jnp.float32,
    )
    state1, _ = step_fn(state, params, batch, jax.random.PRNGKey(0))
    # micro-step 1 of 2: no applied update -> EMA must be bit-identical
    for e0, e1 in zip(
        jax.tree_util.tree_leaves(state.ema_params),
        jax.tree_util.tree_leaves(state1.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
    state2, _ = step_fn(state1, params, batch, jax.random.PRNGKey(0))
    # window closed: EMA moved
    moved = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(state1.ema_params),
            jax.tree_util.tree_leaves(state2.ema_params),
        )
    )
    assert moved > 0


def trainer_state_for(cfg, params):
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    return trainer_lib.TrainState(
        jnp.zeros((), jnp.int32),
        jax.tree_util.tree_map(jnp.copy, params),
        trainer_lib.make_optimizer(cfg).init(params),
        jax.tree_util.tree_map(jnp.copy, params),
        None,
    )


def test_validation_errors(setup):
    cfg, params, _ = setup
    with pytest.raises(ValueError, match="ODE"):
        distill.make_distill_step(cfg.replace(parameterization="ode"), 2)
    with pytest.raises(ValueError, match="even"):
        distill.make_distill_step(cfg, 3)
    with pytest.raises(ValueError, match="exceeds steps"):
        distill.make_distill_step(cfg, 2 * cfg.steps)
    # the distill step has no loss-scale machinery: fp16 scaling configs
    # must be rejected loudly, not silently trained unscaled (review r3e)
    with pytest.raises(ValueError, match="loss scaling"):
        distill.make_distill_step(cfg.replace(dynamic_loss_scale=True), 2)
    with pytest.raises(ValueError, match="loss scaling"):
        distill.make_distill_step(cfg.replace(loss_scale=128.0), 2)
    with pytest.raises(ValueError, match="not reachable"):
        distill.progressive_distill(cfg, params, iter([]), target_stride=6,
                                    steps_per_round=1)
    with pytest.raises(ValueError, match="not reachable"):
        distill.progressive_distill(
            cfg.replace(sample_stride=4), params, iter([]), target_stride=2,
            steps_per_round=1,
        )


def test_cli_distill_roundtrip(tmp_path):
    """train -> distill -> sample: the student checkpoint is a drop-in whose
    config.json carries the doubled sample_stride."""
    import json
    import os

    from PIL import Image

    from gan_class_transfer2_tpu import cli

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    r = np.random.default_rng(0)
    for i in range(6):
        Image.fromarray(
            r.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        ).save(str(data_dir / f"img_{i}.png"))

    common = [
        "--platform", "cpu", "--dataset-pattern", str(data_dir / "*.png"),
        "--size", "16", "--pixel-size", "4", "--max-size", "8",
        "--octaves", "2", "--steps", "4", "--batch-size", "2",
        "--fused-diffusion", "false", "--mesh-data", "1",
    ]
    ckpt = str(tmp_path / "teacher")
    rc = cli.main([
        "train", *common, "--steps-per-epoch", "2", "--epochs", "1",
        "--warm-up", "2", "--test-step", "2", "--checkpoint-every", "2",
        "--log-dir", str(tmp_path / "logs"), "--checkpoint-dir", ckpt,
    ])
    assert rc == 0

    student = str(tmp_path / "student")
    rc = cli.main([
        "distill", "--platform", "cpu", "--checkpoint-dir", ckpt,
        "--out", student, "--target-stride", "2", "--distill-steps", "2",
    ])
    assert rc == 0
    saved = json.loads((tmp_path / "student" / "config.json").read_text())
    assert saved["sample_stride"] == 2
    assert saved["checkpoint_dir"] == student

    # TensorBoard artifacts: per-stride loss curve + teacher/student grids
    import glob

    from gan_class_transfer2_tpu.utils import tensorboard as tb

    event_files = glob.glob(str(tmp_path / "logs" / "*" / "*" / "events.*"))
    tags = set()
    for f in event_files:
        tags |= {e[1] for e in tb.read_events(f)}
    assert "distill_loss/stride_2" in tags
    # image summaries are written per-sample under <tag>/image/<n>
    assert "distill/teacher_samples/image/0" in tags
    assert "distill/student_samples/image/0" in tags

    out = str(tmp_path / "samples")
    rc = cli.main([
        "sample", "--platform", "cpu", "--checkpoint-dir", student,
        "--out", out, "--num", "2",
    ])
    assert rc == 0
    assert sorted(os.listdir(out)) == ["sample_0.png", "sample_1.png"]


def test_distill_opt_config_counts_applied_updates_and_caps_ema(setup):
    """warm_up is interpreted in APPLIED optimizer updates; under
    grad_accum=16 a 2000-micro-step round applies only 125, so the cap must
    shrink accordingly or the whole round rides the ramp (review r4). The
    EMA horizon is likewise round-sized: a 0.9999 training decay would
    leave ~82% of the round's output on the un-distilled teacher."""
    cfg, _, _ = setup
    big = cfg.replace(warm_up=2000, grad_accum=16, ema_decay=0.9999)
    opt_cfg = distill.distill_opt_config(big, steps=2000)
    assert opt_cfg.warm_up == 12  # (2000 // 16) // 10
    assert 0.5 <= opt_cfg.ema_decay < 0.9999  # round-sized horizon
    # 1/(1-d) ≈ 10% of the 125 applied updates
    assert 1.0 / (1.0 - opt_cfg.ema_decay) <= 0.2 * (2000 // 16)
    # a short training decay is preserved; disabled stays disabled (the
    # TrainState ema structure must not change)
    assert distill.distill_opt_config(
        cfg.replace(ema_decay=0.6), 2000
    ).ema_decay == 0.6
    assert distill.distill_opt_config(
        cfg.replace(ema_decay=0.0), 2000
    ).ema_decay == 0.0


def test_student_grid_delegates_to_sampler_schedule(setup):
    from gan_class_transfer2_tpu.sample import sampler

    cfg, _, _ = setup
    for stride in (1, 2, 4):
        np.testing.assert_array_equal(
            distill.student_grid(cfg, stride),
            sampler.sample_timesteps(cfg.replace(sample_stride=stride)),
        )
