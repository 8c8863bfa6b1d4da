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


def test_zero1_shards_opt_state_and_matches_unsharded():
    """ZeRO-1 (VERDICT r1 next #10): Adam moments sharded over 'data'
    (1/data per rank), params still replicated, and one step is numerically
    identical to the unsharded step."""
    cfg = tiny_test_config(batch_size=8, donate_state=False, zero1=True,
                           pixel_size=8, max_size=16)
    m = mesh_lib.make_mesh(data=4, model=2)
    state = mesh_lib.init_sharded_state(cfg, m, jax.random.PRNGKey(0))

    # Adam moments: conv-kernel leaves sharded over 'data' on out-channels;
    # params themselves stay on the TP-only rule (no 'data')
    opt_specs = [
        str(x.sharding.spec)
        for x in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(x, "ndim") and x.ndim == 4
    ]
    assert opt_specs and any("data" in s for s in opt_specs), opt_specs
    param_specs = [
        str(x.sharding.spec)
        for x in jax.tree_util.tree_leaves(state.params)
    ]
    assert all("data" not in s for s in param_specs), param_specs

    step = mesh_lib.make_parallel_train_step(cfg, m)
    batch = jax.device_put(_batch(cfg), mesh_lib.batch_sharding(m))
    new_state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # parity vs non-zero1
    cfg0 = cfg.replace(zero1=False)
    state0 = mesh_lib.init_sharded_state(cfg0, m, jax.random.PRNGKey(0))
    step0 = mesh_lib.make_parallel_train_step(cfg0, m)
    new_state0, loss0 = step0(state0, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss), float(loss0), rtol=1e-5)
    a = np.asarray(jax.device_get(new_state.params["head"]["kernel"]))
    b = np.asarray(jax.device_get(new_state0.params["head"]["kernel"]))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_zero1_with_bf16_moments():
    """ZeRO-1 composes with bf16 moment storage (adam_tf + moment_dtype):
    moments are both sharded over 'data' AND stored bf16 — the two memory
    levers stack (BASELINE_MEASURED 'memory frontier')."""
    import jax.numpy as jnp

    cfg = tiny_test_config(batch_size=8, donate_state=False, zero1=True,
                           pixel_size=8, max_size=16,
                           optimizer="adam_tf", moment_dtype="bfloat16")
    m = mesh_lib.make_mesh(data=4, model=2)
    state = mesh_lib.init_sharded_state(cfg, m, jax.random.PRNGKey(0))
    moment_leaves = [
        x for x in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(x, "ndim") and x.ndim == 4
    ]
    assert moment_leaves
    assert all(x.dtype == jnp.bfloat16 for x in moment_leaves)
    assert any("data" in str(x.sharding.spec) for x in moment_leaves)
    step = mesh_lib.make_parallel_train_step(cfg, m)
    batch = jax.device_put(_batch(cfg), mesh_lib.batch_sharding(m))
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    state, loss2 = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss2))


def test_zero1_large_config_compiles_sharded():
    """The >=512^2 regime the knob exists for: compile (no execute) the
    512^2 b64 step over the 8-device mesh and assert the compiled opt-state
    output shardings stay ZeRO-sharded."""
    from gan_class_transfer2_tpu.config import Config

    cfg = Config(size=512, batch_size=64, zero1=True, donate_state=False,
                 mesh_data=8, mesh_model=1, compute_dtype="bfloat16",
                 remat=True)
    m = mesh_lib.make_mesh(cfg)
    abstract = jax.eval_shape(
        lambda r: trainer.init_state(cfg, r), jax.random.PRNGKey(0)
    )
    sh = mesh_lib.state_shardings(abstract, m, zero1=True)
    # moments sharded over data; kernels up to (4,4,512,512) -> 1/8 per rank
    flat_sh = jax.tree_util.tree_leaves(
        sh.opt_state, is_leaf=lambda x: hasattr(x, "spec")
    )
    assert any("data" in str(s.spec) for s in flat_sh)

    optimizer = trainer.make_optimizer(cfg)

    def step(state, batch, rng):
        return trainer.train_step(cfg, optimizer, state, batch, rng)

    lowered = jax.jit(
        step,
        in_shardings=(sh, mesh_lib.batch_sharding(m),
                      jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec())),
        out_shardings=(sh, jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec())),
    ).lower(
        abstract,
        jax.ShapeDtypeStruct((64, 512, 512, 3), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    # lowering succeeded with the ZeRO shardings; full compile of the 512^2
    # graph is minutes on this 1-core host, so stop at StableHLO here
    assert lowered is not None


def test_multi_slice_mesh_step_matches_flat_dp():
    """3-D (slice, data, model) mesh: batch shards over ('slice','data'),
    params never shard over 'slice', and one step is numerically identical
    to the flat 8-way DP step (the DCN axis is semantics-preserving)."""
    cfg = tiny_test_config(batch_size=8, donate_state=False, mesh_slice=2,
                           mesh_data=2, mesh_model=2)
    m = mesh_lib.make_mesh(cfg)
    assert m.shape == {"slice": 2, "data": 2, "model": 2}
    assert "slice" in str(mesh_lib.batch_sharding(m).spec)

    state = mesh_lib.init_sharded_state(cfg, m, jax.random.PRNGKey(0))
    for x in jax.tree_util.tree_leaves(state.params):
        assert "slice" not in str(x.sharding.spec)
    step = mesh_lib.make_parallel_train_step(cfg, m)
    batch = jax.device_put(_batch(cfg), mesh_lib.batch_sharding(m))
    new_state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    cfg0 = tiny_test_config(batch_size=8, donate_state=False, mesh_data=8)
    m0 = mesh_lib.make_mesh(cfg0)
    state0 = mesh_lib.init_sharded_state(cfg0, m0, jax.random.PRNGKey(0))
    step0 = mesh_lib.make_parallel_train_step(cfg0, m0)
    batch0 = jax.device_put(_batch(cfg0), mesh_lib.batch_sharding(m0))
    new_state0, loss0 = step0(state0, batch0, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss), float(loss0), rtol=2e-5)
    a = np.asarray(jax.device_get(new_state.params["head"]["kernel"]))
    b = np.asarray(jax.device_get(new_state0.params["head"]["kernel"]))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_zero1_opt_state_detection_is_exact_field_match():
    """ZeRO-1 classifies optimizer state by exact top-level field membership
    (OPT_STATE_FIELDS), not by an 'opt' substring anywhere in the path —
    a future field merely containing 'opt' must stay on the TP rule
    (VERDICT r2 weak #5)."""
    from typing import Any, NamedTuple

    import jax
    from jax.sharding import PartitionSpec as P

    class FakeState(NamedTuple):
        step: Any
        params: Any
        opt_state: Any          # registered: ZeRO-1 shards this
        adopted_params: Any     # contains 'opt' substring: must NOT shard
        g_opt: Any              # registered (GAN states)

    leaf = np.zeros((3, 3, 3, 8), np.float32)
    state = FakeState(np.zeros(()), {"k": leaf}, {"mu": leaf},
                      {"k": leaf}, {"nu": leaf})
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:4], data=4, model=1)
    sh = mesh_lib.state_shardings(state, mesh, zero1=True)

    def spec_of(tree):
        return jax.tree_util.tree_leaves(
            tree, is_leaf=lambda x: hasattr(x, "spec")
        )[0].spec

    assert spec_of(sh.opt_state) == P(None, None, None, "data")
    assert spec_of(sh.g_opt) == P(None, None, None, "data")
    assert spec_of(sh.adopted_params) == P()  # substring no longer matches
    assert spec_of(sh.params) == P()


def test_eval_fn_shards_sampler_over_data_and_matches_single_device():
    """The (2+4·B)-image sampler stage of the eval program runs data-parallel
    over the mesh (VERDICT r2 next #3); outputs must be value-identical to
    the 1-device program (zero-padding + slice-back is transparent)."""
    cfg = tiny_test_config(mesh_data=1)
    rng = jax.random.PRNGKey(0)
    params = trainer.init_state(cfg, rng).params
    r = np.random.default_rng(0)
    image = jnp.asarray(r.uniform(-1, 1, (1, cfg.size, cfg.size, 3)), jnp.float32)
    noise = jnp.asarray(r.normal(size=(2, cfg.size, cfg.size, 3)), jnp.float32)
    dictionary = jnp.asarray(
        r.normal(size=(cfg.size, cfg.size, 2**cfg.bits_per_pixel, 3)), jnp.float32
    )

    m1 = mesh_lib.make_mesh(devices=jax.devices()[:1], data=1, model=1)
    m4 = mesh_lib.make_mesh(devices=jax.devices()[:4], data=4, model=1)
    out1 = mesh_lib.make_parallel_eval_fn(cfg, m1)(params, image, noise, dictionary)
    out4 = mesh_lib.make_parallel_eval_fn(cfg, m4)(params, image, noise, dictionary)
    for k in out1:
        a, b = np.asarray(out1[k]), np.asarray(out4[k])
        assert a.shape == b.shape, k  # padding sliced back (6 = 2 + 4·1)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=k)
    # the fake batch kept its reference size (2 + 4·B), not the padded 8
    assert out4["fake"].shape[0] == 6


def test_make_data_parallel_apply_parity():
    """make_data_parallel_apply matches the plain fn on a non-divisible
    batch, pads/shards leading-dim-matching extras (class vectors), and
    leaves scalar extras alone."""
    m = mesh_lib.make_mesh(devices=jax.devices()[:8], data=8, model=1)

    def fn(p, x, t, scale):
        return x * p + t[:, None] * scale

    params = jnp.float32(2.0)
    x = jnp.arange(12.0).reshape(3, 4)  # 3 not divisible by 8
    t = jnp.asarray([1.0, 2.0, 3.0])
    par = mesh_lib.make_data_parallel_apply(m, fn)
    out = par(params, x, t, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(params, x, t, 0.5)))
    # trivial mesh: plain jit, same values
    m1 = mesh_lib.make_mesh(devices=jax.devices()[:1], data=1, model=1)
    out1 = mesh_lib.make_data_parallel_apply(m1, fn)(params, x, t, 0.5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out))


def test_shard_sample_batch_pads_to_data_extent():
    m = mesh_lib.make_mesh(devices=jax.devices()[:4], data=4, model=1)
    x = jnp.ones((6, 4, 4, 3))
    sharded, n = mesh_lib.shard_sample_batch(x, m)
    assert n == 6 and sharded.shape[0] == 8
    # 1-device mesh: no-op
    m1 = mesh_lib.make_mesh(devices=jax.devices()[:1], data=1, model=1)
    same, n1 = mesh_lib.shard_sample_batch(x, m1)
    assert n1 == 6 and same.shape[0] == 6


def test_warn_misaligned_batch(capsys):
    # measured (BASELINE_MEASURED.md "Planner calibration grid"): non-
    # multiple-of-8 per-chip batches pad to the next sublane multiple on
    # TPU; the step builders warn so the waste is visible at startup
    m = mesh_lib.make_mesh(data=4, model=1)
    cfg = tiny_test_config(batch_size=48)  # 12/chip -> pads to 16
    mesh_lib.warn_misaligned_batch(cfg, m, backend="tpu")
    err = capsys.readouterr().err
    assert "pads it to 16" in err and "global batch of 64" in err
    # aligned batch: silent
    mesh_lib.warn_misaligned_batch(
        tiny_test_config(batch_size=32), m, backend="tpu"
    )
    # non-TPU backends: silent (CPU does not tile the batch dim this way)
    mesh_lib.warn_misaligned_batch(cfg, m, backend="cpu")
    # indivisible batches are someone else's error, not a warning
    mesh_lib.warn_misaligned_batch(
        tiny_test_config(batch_size=50), m, backend="tpu"
    )
    assert capsys.readouterr().err == ""


def test_zero1_gan_state_sharded_and_matches_unsharded():
    """cfg.zero1 now reaches the GAN builders (review r4): g_opt/d_opt
    moments shard over 'data' (OPT_STATE_FIELDS registers them) and one
    step matches the unsharded step numerically."""
    cfg = tiny_test_config(batch_size=8, donate_state=False, zero1=True,
                           pixel_size=8, max_size=16, learning_rate=1e-4)
    m = mesh_lib.make_mesh(data=4, model=2)
    state = mesh_lib.init_sharded_gan_state(cfg, m, jax.random.PRNGKey(0))
    opt_specs = [
        str(x.sharding.spec)
        for opt in (state.g_opt, state.d_opt)
        for x in jax.tree_util.tree_leaves(opt)
        if hasattr(x, "ndim") and x.ndim == 4
    ]
    assert opt_specs and any("data" in s for s in opt_specs), opt_specs
    for tree in (state.g_ab, state.d_a):
        assert all(
            "data" not in str(x.sharding.spec)
            for x in jax.tree_util.tree_leaves(tree)
        )
    step = mesh_lib.make_parallel_gan_train_step(cfg, m)
    a = jax.device_put(_batch(cfg, 0), mesh_lib.batch_sharding(m))
    b = jax.device_put(_batch(cfg, 1), mesh_lib.batch_sharding(m))
    new_state, metrics = step(state, a, b, jax.random.PRNGKey(1))

    cfg0 = cfg.replace(zero1=False)
    state0 = mesh_lib.init_sharded_gan_state(cfg0, m, jax.random.PRNGKey(0))
    step0 = mesh_lib.make_parallel_gan_train_step(cfg0, m)
    new_state0, metrics0 = step0(state0, a, b, jax.random.PRNGKey(1))
    for k in metrics:
        np.testing.assert_allclose(
            float(metrics[k]), float(metrics0[k]), rtol=1e-5, err_msg=k
        )
    ka = np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(new_state.g_ab)[0]))
    kb = np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(new_state0.g_ab)[0]))
    np.testing.assert_allclose(ka, kb, atol=1e-5)


def test_zero1_conditional_gan_state_sharded_and_step_runs():
    cfg = tiny_test_config(batch_size=8, donate_state=False, zero1=True,
                           pixel_size=8, max_size=16, num_classes=3,
                           learning_rate=1e-4)
    m = mesh_lib.make_mesh(data=4, model=2)
    state = mesh_lib.init_sharded_conditional_gan_state(
        cfg, m, jax.random.PRNGKey(0)
    )
    opt_specs = [
        str(x.sharding.spec)
        for opt in (state.g_opt, state.d_opt)
        for x in jax.tree_util.tree_leaves(opt)
        if hasattr(x, "ndim") and x.ndim == 4
    ]
    assert opt_specs and any("data" in s for s in opt_specs), opt_specs
    step = mesh_lib.make_parallel_conditional_gan_train_step(cfg, m)
    batch = {
        "image": jax.device_put(_batch(cfg, 0), mesh_lib.batch_sharding(m)),
        "label": jax.device_put(
            jnp.zeros((cfg.batch_size,), jnp.int32),
            mesh_lib.batch_sharding(m),
        ),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
