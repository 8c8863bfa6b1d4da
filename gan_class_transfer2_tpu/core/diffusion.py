"""Diffusion algebra — forward process, training targets, inversion updates.

Pure functions over arrays; no model or optimizer dependencies. This layer
captures the entire parameterization quadruple of the reference
(``predict_x`` / ``predict_scaled_epsilon`` / ``prediction_weighting`` /
``ordinary_differential_equation``, reference train.py:29-32) and the three
places it is exercised:

  * training target selection        — reference train.py:238-252
  * single-step denoise preview      — reference train.py:325-355
  * inversion / sampling state update — reference train.py:382-413, 452-479

Faithful quirks preserved on purpose (they are behavior, not bugs to fix):
  * In ODE mode the inversion/sampling loops only ever update ``x_theta``;
    ``epsilon_theta`` is left stale (the reference's ``fake = 2*fake - pred``
    / ``fake = prediction`` assignments at train.py:392,462 are dead — the
    loop head recomputes ``fake`` from (x_theta, epsilon_theta) each step).
  * The ODE preview uses ``image_factor = ᾱ(T/2)**0.5`` (reference
    train.py:326-328) — note the extra square root relative to other modes.
  * ``prediction_weighting`` scales *both* target and prediction by
    ``sqrt(1-ᾱ)`` before the loss (reference train.py:250-252).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .schedule import alpha_dash


def _ad(cfg, t):
    return alpha_dash(t, cfg.steps, cfg.schedule)


def forward_diffuse(cfg, x, epsilon, t):
    """q(x_t | x_0): ``x·√ᾱ(t) + ε·√(1-ᾱ(t))`` (reference train.py:231-234).

    ``t`` broadcasts against ``x`` (per-sample t arrives as (B,1,1,1)).
    """
    ad = _ad(cfg, t)
    return x * ad**0.5 + epsilon * (1 - ad) ** 0.5


def training_target(cfg, x, epsilon, t) -> Tuple[jnp.ndarray, float]:
    """Regression target for the denoiser plus a prediction scale factor.

    Returns ``(target, prediction_scale)`` where the loss is computed between
    ``target`` and ``prediction * prediction_scale`` (the scale is 1 except
    under ``prediction_weighting``, reference train.py:250-252).
    """
    ad = _ad(cfg, t)
    if cfg.parameterization == "ode":
        # Target is the one-step-less-noised mixture (reference train.py:238-241).
        ad_prev = _ad(cfg, t - 1)
        return x * ad_prev**0.5 + epsilon * (1 - ad_prev) ** 0.5, 1.0
    if cfg.parameterization == "x":
        return x, 1.0  # reference train.py:243-244 (active default)
    target = epsilon
    if cfg.parameterization == "scaled_epsilon":
        target = target * (1 - ad) ** 0.5  # reference train.py:247-248
    if cfg.prediction_weighting:
        return target * (1 - ad) ** 0.5, (1 - ad) ** 0.5
    return target, 1.0


def preview_image_factor(cfg):
    """Noise factor for the single-step preview (reference train.py:325-328).

    Preserved reference quirk (ODE branch): the preview noises at the
    t = T/2 level and inverts with ᾱ(T/2)/ᾱ(T/2−1), yet the denoiser is
    conditioned on t = test_step (reference passes tf.constant([test_step])
    at train.py:336 regardless) — an internal mismatch that is harmless
    because the model ignores t entirely (train.py:206-215, vestigial)."""
    if cfg.parameterization == "ode":
        return _ad(cfg, cfg.steps / 2) ** 0.5
    return _ad(cfg, cfg.test_step)


def preview_denoise(cfg, noised, prediction):
    """Invert one prediction into a clean-image estimate for the preview
    (reference train.py:338-355)."""
    if cfg.parameterization == "ode":
        t = cfg.steps / 2
        ad, ad_prev = _ad(cfg, t), _ad(cfg, t - 1)
        return (
            prediction * (1 - ad) ** 0.5 - noised * (1 - ad_prev) ** 0.5
        ) / (ad_prev**0.5 * (1 - ad) ** 0.5 - ad**0.5 * (1 - ad_prev) ** 0.5)
    if cfg.parameterization == "x":
        return prediction
    factor = preview_image_factor(cfg)
    if cfg.parameterization == "epsilon":
        prediction = prediction * (1 - factor) ** 0.5
    return (noised - prediction) / factor**0.5


def step_update(cfg, prediction, fake, epsilon_theta, t):
    """One inversion/sampling state update: ``(x_θ, ε_θ) ← f(pred, fake, t)``.

    Shared by the t=1…T inversion loop (reference train.py:369-413) and the
    t=T…1 sampling loop (reference train.py:439-479) — the update algebra is
    identical in both.
    """
    ad = _ad(cfg, t)
    if cfg.parameterization == "ode":
        ad_prev = _ad(cfg, t - 1)
        x_theta = (
            prediction * (1 - ad) ** 0.5 - fake * (1 - ad_prev) ** 0.5
        ) / (ad_prev**0.5 * (1 - ad) ** 0.5 - ad**0.5 * (1 - ad_prev) ** 0.5)
        return x_theta, epsilon_theta  # ε_θ intentionally stale (see module doc)
    if cfg.parameterization == "x":
        x_theta = prediction
        epsilon_theta = (fake - ad**0.5 * x_theta) / (1 - ad) ** 0.5
        return x_theta, epsilon_theta
    if cfg.parameterization == "scaled_epsilon":
        epsilon_theta = prediction / (1 - ad) ** 0.5
        scaled_epsilon = prediction
    else:  # epsilon
        epsilon_theta = prediction
        scaled_epsilon = prediction * (1 - ad) ** 0.5
    x_theta = (fake - scaled_epsilon) / ad**0.5
    return x_theta, epsilon_theta


def renoise(cfg, x_theta, epsilon_theta, t):
    """Loop-head remix: ``√ᾱ·x_θ + √(1-ᾱ)·ε_θ`` (reference train.py:372-375,
    442-445). Same algebra as ``forward_diffuse`` applied to estimates."""
    return forward_diffuse(cfg, x_theta, epsilon_theta, t)
