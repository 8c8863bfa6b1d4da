"""Loss-weight annealing (cycle/identity ramps) — the r5 mechanism knob
for the cycle game's identity-map attractor (BASELINE_MEASURED "Config 5
at 60 epochs"). No reference counterpart: the reference has fixed loss
weights only, so these tests pin our beyond-reference semantics:

  * annealed_weight: exact linear ramp, hold after the ramp, static
    passthrough when the feature is off (program unchanged),
  * term gating: a term annealing 0 -> w must be IN the program, a term
    with base 0 and no anneal must stay elided,
  * step integration: g_loss decomposes as adv + w(step)*cycle +
    w(step)*ident with the CURRENT weights, for both the pair GAN and the
    conditional GAN,
  * config validation of the new fields.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.train import conditional_gan, gan


def _cfg(**kw):
    base = dict(learning_rate=1e-4, ema_decay=0.0, donate_state=False)
    base.update(kw)
    return tiny_test_config(**base)


def _batches(cfg, seed=0):
    r = np.random.default_rng(seed)
    shape = (cfg.batch_size, cfg.size, cfg.size, 3)
    a = jnp.asarray(r.uniform(-1, 1, shape), jnp.float32)
    b = jnp.asarray(r.uniform(-1, 1, shape), jnp.float32)
    return a, b


# ------------------------------------------------------------ pure ramp ---


def test_annealed_weight_linear_ramp_and_hold():
    cfg = _cfg(loss_anneal_steps=100)
    w = lambda s: float(gan.annealed_weight(cfg, 5.0, 1.0, jnp.asarray(s)))
    assert w(0) == pytest.approx(5.0)
    assert w(50) == pytest.approx(3.0)
    assert w(100) == pytest.approx(1.0)
    assert w(10_000) == pytest.approx(1.0)  # holds after the ramp


def test_annealed_weight_off_is_static_float():
    # final<0 or no ramp length -> the static python float passes through,
    # so the compiled program is unchanged unless the feature is used
    cfg_off = _cfg()
    out = gan.annealed_weight(cfg_off, 5.0, -1.0, jnp.asarray(7))
    assert isinstance(out, float) and out == 5.0
    cfg_ramp = _cfg(loss_anneal_steps=10)
    out = gan.annealed_weight(cfg_ramp, 5.0, -1.0, jnp.asarray(7))
    assert isinstance(out, float) and out == 5.0


def test_annealed_weight_can_ramp_up_from_zero():
    cfg = _cfg(loss_anneal_steps=10)
    w = lambda s: float(gan.annealed_weight(cfg, 0.0, 2.0, jnp.asarray(s)))
    assert w(0) == pytest.approx(0.0)
    assert w(5) == pytest.approx(1.0)
    assert w(20) == pytest.approx(2.0)


# ------------------------------------------------------------ validation ---


def test_validation_rejects_final_without_ramp():
    with pytest.raises(ValueError, match="loss_anneal_steps"):
        _cfg(identity_weight_final=0.0)


def test_validation_rejects_bad_final_and_negative_steps():
    with pytest.raises(ValueError, match="cycle_weight_final"):
        _cfg(cycle_weight_final=-0.5, loss_anneal_steps=10)
    with pytest.raises(ValueError, match="loss_anneal_steps"):
        _cfg(loss_anneal_steps=-1)


def test_term_active_properties():
    assert _cfg(cycle_weight=5.0).cycle_term_active
    assert not _cfg(cycle_weight=0.0).cycle_term_active
    # base 0 annealing UP -> active; base>0 annealing to 0 -> active
    assert _cfg(
        cycle_weight=0.0, cycle_weight_final=2.0, loss_anneal_steps=10
    ).cycle_term_active
    assert _cfg(
        identity_weight=0.5, identity_weight_final=0.0, loss_anneal_steps=10
    ).identity_term_active
    # a final with no ramp length is rejected by validate, and base 0 with
    # no anneal stays elided
    assert not _cfg(identity_weight=0.0).identity_term_active


# ----------------------------------------------------- step integration ---


def _force_step(state, n):
    return state._replace(step=jnp.asarray(n, jnp.int32))


def test_gan_step_applies_current_weights():
    cfg = _cfg(
        cycle_weight=5.0,
        cycle_weight_final=1.0,
        identity_weight=0.5,
        identity_weight_final=0.0,
        loss_anneal_steps=100,
    )
    step = gan.make_gan_train_step(cfg)
    a, b = _batches(cfg)
    for n, wc, wi in ((0, 5.0, 0.5), (50, 3.0, 0.25), (200, 1.0, 0.0)):
        state = _force_step(gan.init_gan_state(cfg, jax.random.PRNGKey(0)), n)
        _, m = step(state, a, b, jax.random.PRNGKey(1))
        assert float(m["cycle_weight"]) == pytest.approx(wc)
        assert float(m["identity_weight"]) == pytest.approx(wi)
        expect = (
            cfg.adversarial_weight * float(m["adversarial"])
            + wc * float(m["cycle"])
            + wi * float(m["identity"])
        )
        assert float(m["g_loss"]) == pytest.approx(expect, rel=1e-5)


def test_gan_step_term_annealing_up_from_zero_is_computed():
    # base 0 + positive final: the term must be in the program (nonzero raw
    # metric) even though its weight at step 0 is 0
    cfg = _cfg(cycle_weight=0.0, cycle_weight_final=2.0, loss_anneal_steps=10)
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    step = gan.make_gan_train_step(cfg)
    a, b = _batches(cfg)
    _, m = step(state, a, b, jax.random.PRNGKey(1))
    assert float(m["cycle"]) > 0.0
    assert float(m["cycle_weight"]) == pytest.approx(0.0)


def test_no_anneal_keeps_metrics_surface_unchanged():
    cfg = _cfg()
    state = gan.init_gan_state(cfg, jax.random.PRNGKey(0))
    step = gan.make_gan_train_step(cfg)
    a, b = _batches(cfg)
    _, m = step(state, a, b, jax.random.PRNGKey(1))
    assert "cycle_weight" not in m and "identity_weight" not in m


def test_conditional_gan_step_applies_current_weights():
    cfg = _cfg(
        num_classes=3,
        cycle_weight=5.0,
        identity_weight=0.5,
        identity_weight_final=0.0,
        loss_anneal_steps=100,
    )
    step = conditional_gan.make_conditional_gan_train_step(cfg)
    r = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            r.uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)),
            jnp.float32,
        ),
        "label": jnp.asarray(
            r.integers(0, 3, (cfg.batch_size,)), jnp.int32
        ),
    }
    for n, wi in ((0, 0.5), (50, 0.25), (200, 0.0)):
        state = _force_step(
            conditional_gan.init_conditional_gan_state(
                cfg, jax.random.PRNGKey(0)
            ),
            n,
        )
        _, m = step(state, batch, jax.random.PRNGKey(1))
        assert float(m["identity_weight"]) == pytest.approx(wi)
        assert float(m["cycle_weight"]) == pytest.approx(5.0)  # no anneal
        expect = (
            cfg.adversarial_weight * float(m["adversarial"])
            + 5.0 * float(m["cycle"])
            + wi * float(m["identity"])
        )
        assert float(m["g_loss"]) == pytest.approx(expect, rel=1e-5)
