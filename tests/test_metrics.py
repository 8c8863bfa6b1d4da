"""Metric tests: Fréchet distance closed forms, FID sanity, PSNR/RMSE."""

import numpy as np
import pytest

from gan_class_transfer2_tpu.utils import metrics


def test_frechet_identical_is_zero():
    mu = np.asarray([1.0, 2.0])
    s = np.asarray([[2.0, 0.3], [0.3, 1.0]])
    assert abs(metrics.frechet_distance(mu, s, mu, s)) < 1e-8


def test_frechet_mean_shift_closed_form():
    # same covariance, means differ by d -> distance = |d|²
    mu1 = np.zeros(3)
    mu2 = np.asarray([1.0, 2.0, 2.0])
    s = np.eye(3) * 0.5
    want = float(mu2 @ mu2)
    assert abs(metrics.frechet_distance(mu1, s, mu2, s) - want) < 1e-8


def test_frechet_variance_closed_form():
    # 1-D Gaussians: (μ1−μ2)² + (σ1−σ2)²
    got = metrics.frechet_distance(
        np.asarray([0.0]), np.asarray([[4.0]]), np.asarray([[1.0]]).ravel(), np.asarray([[1.0]])
    )
    want = 1.0 + (2.0 - 1.0) ** 2
    assert abs(got - want) < 1e-8


def test_fid_separates_distributions():
    r = np.random.default_rng(0)
    a1 = r.uniform(-1, 1, (48, 16, 16, 3)).astype(np.float32)
    a2 = r.uniform(-1, 1, (48, 16, 16, 3)).astype(np.float32)
    b = np.clip(a1 * 0.2 + 0.7, -1, 0.99).astype(np.float32)  # very different
    near = metrics.fid(a1, a2)
    far = metrics.fid(a1, b)
    assert far > near


def test_psnr_rmse():
    a = np.zeros((2, 4, 4, 3))
    b = np.ones((2, 4, 4, 3)) * 0.5
    assert abs(metrics.rmse(a, b) - 0.5) < 1e-9
    assert abs(metrics.psnr(a, b) - 20 * np.log10(2 / 0.5)) < 1e-9
    assert metrics.psnr(a, a) == float("inf")
