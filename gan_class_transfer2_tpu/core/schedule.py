"""Noise and learning-rate schedules — pure numerics, no model deps.

Reference semantics:
  * ``alpha_dash`` — reference train.py:85-93. Active schedule is quadratic
    ``(1 - t/(T+1))**2 * 0.25``; all five commented alternatives
    (exponential :88, rational_exponential :89, geometric :90, cosine² :91,
    quartic :92) are selectable by name. All are continuous in ``t`` (the ODE branches evaluate them at
    fractional and ``t - 1`` arguments, reference train.py:240-241, 328).
  * ``WarmUp`` LR — reference train.py:50-65: linear ramp
    ``base * (step+1) / (warm+1)`` while ``step < warm``, else constant.
  * InverseTimeDecay — reference train.py:69 (commented SGD config).

Everything is traceable JAX (works under jit on scalars or arrays).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def alpha_dash(t, steps: int, schedule: str = "quadratic"):
    """Cumulative signal fraction ᾱ(t) for diffusion timestep ``t``.

    ``t`` may be a python scalar, traced scalar, or array (per-sample t).
    Continuous in t. At the reference defaults max ᾱ = ᾱ(1) ≈ 0.2475 and
    ᾱ(T)=ᾱ(200) ≈ 6.1e-6 (see SURVEY.md §2.1 row 6).
    """
    s = t / (steps + 1)
    if schedule == "quadratic":  # reference train.py:93 (active)
        return (1 - s) ** 2 * 0.25
    if schedule == "exponential":  # reference train.py:88
        return 1 - 2 ** (s - 1)
    if schedule == "rational_exponential":  # reference train.py:89
        # (2**8 - 2**8**t) / (256*2**8**t - 2**8**t + 2**8) with Python's
        # right-associative 2**8**t == 2**(8**t); simplifies to
        # (256 - u) / (255*u + 256) where u = 2**(8**s).
        u = 2.0 ** (8.0**s)
        return (256.0 - u) / (255.0 * u + 256.0)
    if schedule == "geometric":  # reference train.py:90
        return (256.0 * 256.0) ** (-1.0 * s)
    if schedule == "cosine2":  # reference train.py:91
        return jnp.cos(math.pi / 2 * s) ** 2
    if schedule == "quartic":  # reference train.py:92
        return (1 - s) ** 4
    raise ValueError(f"unknown schedule {schedule!r}")


def warmup_schedule(base: float, warmup_steps: int):
    """Linear-warmup LR schedule (reference train.py:50-65).

    Returns an optax-style ``schedule(count) -> lr``. Exact reference math:
    ``base * (step + 1) / (warmup_steps + 1)`` below ``warmup_steps``.
    """

    def schedule(count):
        count = jnp.asarray(count)
        ramp = base * (count.astype(jnp.float32) + 1.0) / (warmup_steps + 1.0)
        return jnp.where(count < warmup_steps, ramp, base)

    return schedule


def inverse_time_decay_schedule(base: float, decay_steps: int, decay_rate: float = 1.0):
    """InverseTimeDecay (reference train.py:68-70, commented alternative)."""

    def schedule(count):
        count = jnp.asarray(count).astype(jnp.float32)
        return base / (1.0 + decay_rate * count / decay_steps)

    return schedule


def constant_schedule(base: float):
    def schedule(count):
        return jnp.full((), base, dtype=jnp.float32)

    return schedule


def warmup_cosine_schedule(base: float, warmup_steps: int, total_steps: int):
    """Linear warmup (exact reference ramp math) then cosine decay to zero
    at ``total_steps`` — the standard production schedule (TPU addition;
    no reference counterpart)."""

    def schedule(count):
        count = jnp.asarray(count).astype(jnp.float32)
        ramp = base * (count + 1.0) / (warmup_steps + 1.0)
        span = max(total_steps - warmup_steps, 1)
        frac = jnp.clip((count - warmup_steps) / span, 0.0, 1.0)
        cos = base * 0.5 * (1.0 + jnp.cos(math.pi * frac))
        return jnp.where(count < warmup_steps, ramp, cos)

    return schedule


def make_lr_schedule(cfg):
    """Build the LR schedule named by ``cfg.lr_schedule``.

    Unit convention under ``grad_accum > 1`` (every schedule, documented in
    Config.warm_up): schedules count APPLIED optimizer updates — optax's
    MultiSteps only advances the inner count when the accumulation window
    closes. ``cfg.warm_up`` and ``cfg.inverse_time_decay_steps`` are
    therefore interpreted in applied updates for ALL schedules, which keeps
    the grad_accum=N ≡ one-N×-batch-step equivalence exact
    (tests/test_trainer.py::test_grad_accum_matches_big_batch). Only the
    cosine horizon converts: ``epochs * steps_per_epoch`` is the run length
    in data-loop MICRO-steps (reference train.py:517), so it is divided by
    ``grad_accum`` to land in applied-update units."""
    if cfg.lr_schedule == "warmup":
        return warmup_schedule(cfg.learning_rate, cfg.warm_up)
    if cfg.lr_schedule == "inverse_time_decay":
        return inverse_time_decay_schedule(
            cfg.learning_rate, cfg.inverse_time_decay_steps
        )
    if cfg.lr_schedule == "constant":
        return constant_schedule(cfg.learning_rate)
    if cfg.lr_schedule == "cosine":
        accum = max(getattr(cfg, "grad_accum", 1), 1)
        return warmup_cosine_schedule(
            cfg.learning_rate,
            cfg.warm_up,
            cfg.epochs * cfg.steps_per_epoch // accum,
        )
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
