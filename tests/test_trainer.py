"""Training-step tests: loss decreases on a fixed batch, optimizer variants
run, warmup LR engages, EMA tracks, loss variants compute
(reference Trainer train.py:217-280; optimizer train.py:67-83)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.train import trainer


def _batch(cfg, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(
        r.uniform(-1, 1, size=(cfg.batch_size, cfg.size, cfg.size, 3)), jnp.float32
    )


def test_loss_decreases_overfit():
    cfg = tiny_test_config(learning_rate=3e-3, warm_up=0)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(80):
        state, loss = step(state, batch, rng)
        losses.append(float(loss))
    # per-step loss is stochastic (fresh t, ε each step) — compare windows
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.8, losses


def test_state_step_increments():
    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    state, _ = step(state, _batch(cfg), jax.random.PRNGKey(1))
    assert int(state.step) == 1


@pytest.mark.parametrize("opt", ["sgd", "momentum", "sign_sgd", "rmsprop"])
def test_optimizer_variants(opt):
    cfg = tiny_test_config(optimizer=opt, learning_rate=1e-4)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    state, loss = step(state, _batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("loss_name", ["l1", "dct", "mse_multiscale"])
def test_loss_variants(loss_name):
    cfg = tiny_test_config(loss=loss_name)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    _, loss = step(state, _batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("param", ["epsilon", "scaled_epsilon", "ode"])
def test_parameterization_variants(param):
    cfg = tiny_test_config(parameterization=param)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    _, loss = step(state, _batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_ema_tracks_params():
    cfg = tiny_test_config(ema_decay=0.5, learning_rate=1e-3, warm_up=0)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    assert state.ema_params is not None
    for i in range(3):
        state, _ = step(state, _batch(cfg, i), jax.random.PRNGKey(1))
    head_p = np.asarray(state.params["head"]["kernel"])
    head_e = np.asarray(state.ema_params["head"]["kernel"])
    assert not np.allclose(head_p, head_e)  # EMA lags
    assert np.abs(head_e - head_p).max() < 1e-2  # but tracks


def test_weight_decay_runs():
    cfg = tiny_test_config(weight_decay=1e-6)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    _, loss = step(state, _batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_loss_scale_matches_unscaled():
    cfg = tiny_test_config()
    cfg_scaled = tiny_test_config(loss_scale=128.0)
    s0 = trainer.init_state(cfg, jax.random.PRNGKey(0))
    s1 = trainer.init_state(cfg_scaled, jax.random.PRNGKey(0))
    step0 = trainer.make_train_step(cfg)
    step1 = trainer.make_train_step(cfg_scaled)
    b = _batch(cfg)
    s0, l0 = step0(s0, b, jax.random.PRNGKey(1))
    s1, l1 = step1(s1, b, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s0.params["head"]["kernel"]),
        np.asarray(s1.params["head"]["kernel"]),
        atol=1e-5,
    )


def test_bfloat16_training_runs():
    cfg = tiny_test_config(compute_dtype="bfloat16")
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    state, loss = step(state, _batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert state.params["head"]["kernel"].dtype == jnp.float32


def test_identity_loss_shim():
    """Keras-compat identity loss (reference train.py:171-173)."""
    y_pred = jnp.asarray([1.0, 2.0, 3.0])
    assert float(trainer.identity(None, y_pred)) == pytest.approx(2.0)


def test_dynamic_loss_scale_skips_and_halves_on_overflow():
    """TF LossScaleOptimizer semantics (reference train.py:82-83): a
    non-finite gradient skips the whole update and halves the scale
    (VERDICT r1 next #8)."""
    import jax
    import jax.numpy as jnp

    cfg = tiny_test_config(
        dynamic_loss_scale=True, loss_scale=64.0, donate_state=False
    )
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    assert float(state.scale_state.scale) == 64.0
    step = trainer.make_train_step(cfg)

    good = jnp.zeros((cfg.batch_size, cfg.size, cfg.size, 3), jnp.float32)
    bad = jnp.full_like(good, jnp.inf)  # drives loss/grads non-finite

    s1, _ = step(state, good, jax.random.PRNGKey(1))
    assert float(s1.scale_state.scale) == 64.0
    assert int(s1.scale_state.good_steps) == 1
    p_before = np.asarray(s1.params["head"]["kernel"])

    s2, _ = step(s1, bad, jax.random.PRNGKey(2))
    assert float(s2.scale_state.scale) == 32.0  # halved
    assert int(s2.scale_state.good_steps) == 0
    np.testing.assert_array_equal(
        np.asarray(s2.params["head"]["kernel"]), p_before  # update skipped
    )
    # optimizer state skipped too (adam count unchanged vs s1)
    c1 = [x for x in jax.tree_util.tree_leaves(s1.opt_state) if x.ndim == 0]
    c2 = [x for x in jax.tree_util.tree_leaves(s2.opt_state) if x.ndim == 0]
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dynamic_loss_scale_grows_after_interval():
    import jax
    import jax.numpy as jnp

    cfg = tiny_test_config(
        dynamic_loss_scale=True,
        loss_scale=8.0,
        loss_scale_growth_interval=2,
        donate_state=False,
    )
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    batch = jnp.zeros((cfg.batch_size, cfg.size, cfg.size, 3), jnp.float32)
    for i in range(2):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))
    assert float(state.scale_state.scale) == 16.0  # doubled after 2 clean steps
    assert int(state.scale_state.good_steps) == 0


def test_grad_accum_matches_big_batch():
    """grad_accum=N micro-steps of batch b must equal ONE step of batch N·b
    (optax.MultiSteps with grad means + identical injected randomness)."""
    import jax
    import jax.numpy as jnp

    common = dict(
        optimizer="adam_tf", learning_rate=1e-3, donate_state=False,
        size=16, pixel_size=8, max_size=16, octaves=2, steps=50,
    )
    cfg_a = tiny_test_config(batch_size=2, grad_accum=2, **common)
    cfg_b = tiny_test_config(batch_size=4, grad_accum=1, **common)

    r = np.random.default_rng(0)
    x = r.uniform(-1, 1, (4, cfg_b.size, cfg_b.size, 3)).astype(np.float32)
    t = r.integers(1, cfg_b.steps + 1, (4,)).astype(np.int32)
    eps = r.standard_normal((4, cfg_b.size, cfg_b.size, 3)).astype(np.float32)

    sa = trainer.init_state(cfg_a, jax.random.PRNGKey(0))
    sb = trainer.init_state(cfg_b, jax.random.PRNGKey(0))
    step_a = trainer.make_injected_train_step(cfg_a)
    step_b = trainer.make_injected_train_step(cfg_b)

    sa, _ = step_a(sa, jnp.asarray(x[:2]), t[:2], eps[:2])
    # params unchanged until the accumulation window closes
    np.testing.assert_array_equal(
        np.asarray(sa.params["head"]["kernel"]),
        np.asarray(sb.params["head"]["kernel"]),
    )
    sa, _ = step_a(sa, jnp.asarray(x[2:]), t[2:], eps[2:])
    sb, _ = step_b(sb, jnp.asarray(x), t, eps)

    for leaf_a, leaf_b in zip(
        jax.tree_util.tree_leaves(sa.params),
        jax.tree_util.tree_leaves(sb.params),
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_a), np.asarray(leaf_b), rtol=1e-5, atol=1e-7
        )


def test_grad_accum_invalid_combinations():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="grad_accum"):
        tiny_test_config(grad_accum=0)
    with _pytest.raises(ValueError, match="zero1"):
        tiny_test_config(grad_accum=2, zero1=True)
    with _pytest.raises(ValueError, match="dynamic_loss_scale"):
        tiny_test_config(grad_accum=2, dynamic_loss_scale=True)


def test_grad_accum_ema_blends_once_per_update():
    """With grad_accum=N the EMA must blend exactly once per APPLIED
    update, not once per micro-step (which would silently raise the
    effective per-update decay to d**N)."""
    import jax
    import jax.numpy as jnp

    cfg = tiny_test_config(
        optimizer="adam_tf", learning_rate=1e-3, grad_accum=2,
        ema_decay=0.5, donate_state=False,
        size=16, pixel_size=8, max_size=16, octaves=2, steps=50,
    )
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    ema0 = jax.tree_util.tree_map(np.asarray, state.ema_params)
    step = trainer.make_train_step(cfg)
    batch = jnp.asarray(
        np.random.default_rng(0).uniform(
            -1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)
        ),
        jnp.float32,
    )
    # micro-step 1: accumulation only — params AND ema unchanged
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(state.ema_params["head"]["kernel"]),
        ema0["head"]["kernel"],
    )
    # micro-step 2: update applies — ema = d*ema0 + (1-d)*new_params
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    want = 0.5 * ema0["head"]["kernel"] + 0.5 * np.asarray(
        state.params["head"]["kernel"]
    )
    np.testing.assert_allclose(
        np.asarray(state.ema_params["head"]["kernel"]), want, rtol=1e-6
    )


def test_ema_frozen_on_overflow_skipped_step():
    """Under dynamic loss scaling an overflow step skips params/opt updates —
    the EMA blend must be skipped too, or EMA decays toward the unchanged
    params on every skipped step (VERDICT r2 weak #3)."""
    import jax
    import jax.numpy as jnp

    cfg = tiny_test_config(
        dynamic_loss_scale=True, loss_scale=64.0, ema_decay=0.5,
        donate_state=False,
    )
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    good = jnp.zeros((cfg.batch_size, cfg.size, cfg.size, 3), jnp.float32)
    bad = jnp.full_like(good, jnp.inf)

    s1, _ = step(state, good, jax.random.PRNGKey(1))
    ema_before = np.asarray(s1.ema_params["head"]["kernel"])
    p_before = np.asarray(s1.params["head"]["kernel"])
    assert not np.array_equal(ema_before, p_before)  # mid-blend, not converged

    s2, _ = step(s1, bad, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(
        np.asarray(s2.params["head"]["kernel"]), p_before  # update skipped
    )
    np.testing.assert_array_equal(
        np.asarray(s2.ema_params["head"]["kernel"]), ema_before  # EMA too
    )


def test_weight_decay_is_clipped_with_the_gradient():
    """The reference wires l2 through kernel_regularizer, so its 2λw term
    is part of the clipped gradient total — decay must precede
    clip_by_global_norm (review r4: it was added after, escaping the
    bound). With zero gradients and large params under SGD, the update
    norm equals lr · clip_norm exactly; the old order gave lr · ||2λw||."""
    cfg = tiny_test_config(
        optimizer="sgd", learning_rate=1.0, warm_up=0,
        weight_decay=0.5, grad_clip_norm=1.0,
    )
    params = {"w": jnp.full((100,), 10.0, jnp.float32)}
    tx = trainer.make_optimizer(cfg)
    opt_state = tx.init(params)
    zero_grads = {"w": jnp.zeros((100,), jnp.float32)}
    updates, _ = tx.update(zero_grads, opt_state, params)
    norm = float(jnp.linalg.norm(updates["w"]))
    assert norm == pytest.approx(1.0, rel=1e-5)  # lr · clip_norm
