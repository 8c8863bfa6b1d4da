"""Unit tests for noise and LR schedules against hand-computed reference values
(formulas at reference train.py:50-65, 85-93; derived values in SURVEY.md §2.1)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.core.schedule import (
    alpha_dash,
    inverse_time_decay_schedule,
    make_lr_schedule,
    warmup_schedule,
)
from gan_class_transfer2_tpu.config import Config


STEPS = 200


def ref_quadratic(t, steps=STEPS):
    return (1 - t / (steps + 1)) ** 2 * 0.25


def test_quadratic_known_values():
    # SURVEY §2.1 row 6: max ᾱ ≈ 0.2475 at t=1; ᾱ(200) ≈ 6e-6.
    np.testing.assert_allclose(
        alpha_dash(1.0, STEPS, "quadratic"), ref_quadratic(1.0), rtol=1e-6
    )
    assert abs(float(alpha_dash(1.0, STEPS, "quadratic")) - 0.24751) < 1e-4
    assert abs(float(alpha_dash(200.0, STEPS, "quadratic")) - 6.15e-6) < 1e-7
    # continuous in t (fractional arguments used by ODE branches)
    v = float(alpha_dash(99.5, STEPS, "quadratic"))
    np.testing.assert_allclose(v, ref_quadratic(99.5), rtol=1e-6)


def test_quadratic_vectorized():
    t = jnp.arange(1, STEPS + 1, dtype=jnp.float32)
    got = np.asarray(alpha_dash(t, STEPS, "quadratic"))
    want = ref_quadratic(np.arange(1, STEPS + 1, dtype=np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize(
    "name,fn",
    [
        ("exponential", lambda s: 1 - 2 ** (s - 1)),
        # reference train.py:89 — right-associative 2**8**t == 2**(8**t)
        (
            "rational_exponential",
            lambda s: (2**8 - 2 ** 8**s)
            / (256 * 2 ** 8**s - 2 ** 8**s + 2**8),
        ),
        ("geometric", lambda s: (256 * 256) ** (-s)),
        ("cosine2", lambda s: math.cos(math.pi / 2 * s) ** 2),
        ("quartic", lambda s: (1 - s) ** 4),
    ],
)
def test_alternative_schedules(name, fn):
    for t in (1.0, 50.0, 199.0):
        s = t / (STEPS + 1)
        np.testing.assert_allclose(
            float(alpha_dash(t, STEPS, name)), fn(s), rtol=1e-5
        )


def test_warmup_exact_reference_math():
    # base * (step+1)/(warm+1) below warm, else base (reference train.py:57-65)
    sched = warmup_schedule(2e-5, 2000)
    np.testing.assert_allclose(float(sched(0)), 2e-5 * 1 / 2001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1999)), 2e-5 * 2000 / 2001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(2000)), 2e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10**6)), 2e-5, rtol=1e-6)


def test_inverse_time_decay():
    sched = inverse_time_decay_schedule(2.0, 10_000, 1)
    np.testing.assert_allclose(float(sched(0)), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10_000)), 1.0, rtol=1e-6)


def test_make_lr_schedule_dispatch():
    cfg = Config(lr_schedule="warmup")
    assert float(make_lr_schedule(cfg)(cfg.warm_up)) == pytest.approx(
        cfg.learning_rate
    )
    cfg = Config(lr_schedule="constant")
    assert float(make_lr_schedule(cfg)(0)) == pytest.approx(cfg.learning_rate)


def test_warmup_cosine_schedule():
    """Cosine: exact warmup ramp, base at the warmup boundary region, half
    the base mid-decay, ~0 at total_steps."""
    import numpy as np

    from gan_class_transfer2_tpu.core.schedule import warmup_cosine_schedule

    base, warm, total = 1e-3, 100, 1100
    s = warmup_cosine_schedule(base, warm, total)
    np.testing.assert_allclose(float(s(0)), base * 1 / 101, rtol=1e-6)
    np.testing.assert_allclose(float(s(99)), base * 100 / 101, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), base, rtol=1e-6)  # cos(0)=1
    np.testing.assert_allclose(float(s(600)), base / 2, rtol=1e-5)  # midpoint
    assert float(s(1100)) < 1e-9
    assert float(s(5000)) < 1e-9  # clipped past the end


def test_cosine_selectable_from_config():
    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.core.schedule import make_lr_schedule

    cfg = tiny_test_config(
        lr_schedule="cosine", warm_up=2, epochs=5, steps_per_epoch=10
    )
    s = make_lr_schedule(cfg)
    assert float(s(0)) > 0
    assert float(s(50)) < 1e-9


def test_cosine_horizon_counts_applied_updates_under_grad_accum():
    """optax.MultiSteps advances the schedule once per APPLIED update, so
    the cosine horizon must be total micro-steps / grad_accum or the decay
    never completes (review r4 finding, verified empirically)."""
    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.core.schedule import make_lr_schedule

    cfg = tiny_test_config(
        lr_schedule="cosine", warm_up=0, epochs=2, steps_per_epoch=16,
        grad_accum=4,
    )
    s = make_lr_schedule(cfg)
    # 32 micro-steps = 8 applied updates: LR must be ~0 at count 8
    assert float(s(8)) < 1e-9
    assert float(s(4)) > 0


def test_warmup_unit_convention_under_grad_accum():
    """Documented unit convention (ADVICE r2): warm_up counts APPLIED
    updates for every schedule (so grad_accum=N ≡ one N×-batch step holds
    exactly), while the cosine horizon converts from micro-steps
    (epochs*steps_per_epoch is the data-loop length)."""
    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.core.schedule import make_lr_schedule

    base = dict(learning_rate=1e-3, warm_up=8)
    plain = make_lr_schedule(tiny_test_config(**base))
    accum = make_lr_schedule(tiny_test_config(**base, grad_accum=4))
    # same warm_up, same applied-update count → identical LR trajectory
    for c in (0, 4, 8, 12):
        assert float(accum(c)) == float(plain(c))
    # cosine: warmup stays in applied updates, horizon converts
    cos = make_lr_schedule(tiny_test_config(
        **base, grad_accum=4, lr_schedule="cosine", epochs=2,
        steps_per_epoch=32,
    ))
    assert float(cos(4)) < 1e-3  # still ramping at applied update 4
    assert float(cos(16)) < 1e-9  # horizon = 64 micro / 4 = 16 applied
