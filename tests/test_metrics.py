"""Metric tests: Fréchet distance closed forms, FID sanity, PSNR/RMSE."""

import jax.numpy as jnp
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


def test_get_extractor_registry():
    from gan_class_transfer2_tpu.utils import fid_extractor as fx

    assert metrics.get_extractor("random") is metrics.random_conv_features
    with pytest.raises(ValueError, match="unknown extractor"):
        metrics.get_extractor("banana")
    auto = metrics.get_extractor("auto")
    if fx.available():
        assert auto is fx.trained_features
    else:
        assert auto is metrics.random_conv_features


def test_trained_extractor_pinned_and_discriminative():
    """The committed extractor loads, is deterministic, resizes arbitrary
    inputs, and separates shape classes far better than same-class draws
    (the property FID needs from its embedding)."""
    from gan_class_transfer2_tpu.data import synthetic
    from gan_class_transfer2_tpu.utils import fid_extractor as fx

    if not fx.available():
        pytest.skip("pinned extractor weights not committed yet")
    a1 = synthetic.circles(48, 32, seed=1)
    a2 = synthetic.circles(48, 32, seed=2)
    b = synthetic.crosses(48, 32, seed=3)
    f = fx.trained_features
    near = metrics.fid(a1, a2, extractor=f)
    far = metrics.fid(a1, b, extractor=f)
    assert far > 3 * near, (near, far)
    # deterministic across calls
    x = jnp.asarray(a1[:4])
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(f(x)))
    # resolution-flexible: any H,W resizes to the trained input
    feats = f(jnp.zeros((2, 100, 100, 3)))
    assert feats.shape == (2, fx.FEATURE_DIM)


def test_shape_corpus_classes_distinct():
    """Every SHAPE_CLASSES generator yields the declared class count,
    deterministic draws, and the right shapes."""
    from gan_class_transfer2_tpu.data import synthetic

    assert len(synthetic.SHAPE_CLASSES) == 8
    names = [n for n, _ in synthetic.SHAPE_CLASSES]
    assert len(set(names)) == 8
    for name, fn in synthetic.SHAPE_CLASSES:
        x = fn(3, size=32, seed=5)
        y = fn(3, size=32, seed=5)
        assert x.shape == (3, 32, 32, 3), name
        np.testing.assert_array_equal(x, y)
        assert x.min() >= -1.0 and x.max() <= 1.0, name


def test_kid_separates_distributions():
    r = np.random.default_rng(0)
    a1 = r.uniform(-1, 1, (48, 16, 16, 3)).astype(np.float32)
    a2 = r.uniform(-1, 1, (48, 16, 16, 3)).astype(np.float32)
    b = np.clip(a1 * 0.2 + 0.7, -1, 0.99).astype(np.float32)
    assert metrics.kid(a1, b) > metrics.kid(a1, a2)


def test_kid_unbiased_where_fid_is_not():
    """The motivating property (docs/FID.md): on two disjoint draws from
    the SAME distribution, the FID estimator shows a clearly positive
    floor at small n while KID stays near zero relative to a true
    distribution shift."""
    from gan_class_transfer2_tpu.data import synthetic

    a1 = synthetic.circles(64, 32, seed=5)
    a2 = synthetic.circles(64, 32, seed=6)
    cross = synthetic.crosses(64, 32, seed=7)
    x = metrics.get_extractor("random")
    kid_same = metrics.kid(a1, a2, extractor=x)
    kid_diff = metrics.kid(a1, cross, extractor=x)
    fid_same = metrics.fid(a1, a2, extractor=x)
    fid_diff = metrics.fid(a1, cross, extractor=x)
    # same-distribution KID is tiny vs the real shift (measured 2% here);
    # the FID estimator's same-distribution floor is ~half the real shift
    assert abs(kid_same) < 0.1 * kid_diff
    assert fid_same > 0.2 * fid_diff


def test_kid_matches_manual_mmd():
    """Cross-check the unbiased estimator against a direct loop."""
    r = np.random.default_rng(1)
    # pre-round to float32: metrics.kid's feature path goes through
    # jnp.asarray (float32), the manual loop below stays float64
    x = r.normal(size=(5, 3)).astype(np.float32).astype(np.float64)
    y = r.normal(size=(4, 3)).astype(np.float32).astype(np.float64)
    ident = lambda imgs: np.asarray(imgs)  # features = inputs
    got = metrics.kid(x, y, extractor=ident)

    def k(a, b):
        return (a @ b / 3 + 1.0) ** 3

    xx = sum(k(x[i], x[j]) for i in range(5) for j in range(5) if i != j)
    yy = sum(k(y[i], y[j]) for i in range(4) for j in range(4) if i != j)
    xy = sum(k(x[i], y[j]) for i in range(5) for j in range(4))
    want = xx / (5 * 4) + yy / (4 * 3) - 2 * xy / 20
    assert abs(got - want) < 1e-9


def test_kid_rejects_tiny_sets():
    with pytest.raises(ValueError, match="need >= 2 images"):
        metrics.kid(
            np.zeros((1, 8, 8, 3), np.float32), np.zeros((4, 8, 8, 3), np.float32)
        )


def test_fid_and_kid_matches_separate_calls():
    """One extraction pass, same numbers as the separate fid/kid calls."""
    r = np.random.default_rng(7)
    a = r.uniform(-1, 1, (32, 16, 16, 3)).astype(np.float32)
    b = r.uniform(-1, 1, (32, 16, 16, 3)).astype(np.float32)
    both = metrics.fid_and_kid(a, b)
    assert both["fid"] == pytest.approx(metrics.fid(a, b), rel=1e-9)
    assert both["kid"] == pytest.approx(metrics.kid(a, b), rel=1e-9)
