"""Numerics tests for ops/image.py against scipy/numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fft

from gan_class_transfer2_tpu.ops import image as image_ops


def test_dct2d_weighted_matches_scipy():
    """Frequency-weighted 2-D DCT (reference train.py:254-260 semantics)."""
    r = np.random.default_rng(0)
    x = r.normal(size=(2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(image_ops.dct2d_weighted(jnp.asarray(x)))
    # oracle: dct along W then H (type-II ortho), each scaled by 1/(k+1)
    w = 1.0 / np.arange(1, 9)
    t = np.transpose(x, (0, 3, 1, 2))  # B C H W
    t = scipy.fft.dct(t, norm="ortho", axis=-1) * w
    t = np.transpose(t, (0, 1, 3, 2))  # B C W H
    t = scipy.fft.dct(t, norm="ortho", axis=-1) * w
    want = np.transpose(t, (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_avg_pool_same_counts_at_edges():
    """TF 'SAME' avg-pool divides by the true window size at borders."""
    x = jnp.ones((1, 5, 5, 1))
    y = np.asarray(image_ops.avg_pool(x, 4, 4))
    # all cells average ones -> exactly 1 even where the window is clipped
    np.testing.assert_allclose(y, 1.0, atol=1e-6)


def test_avg_pool_matches_manual():
    r = np.random.default_rng(1)
    x = r.normal(size=(1, 8, 8, 2)).astype(np.float32)
    y = np.asarray(image_ops.avg_pool(jnp.asarray(x), 4, 4))
    want = x.reshape(1, 2, 4, 2, 4, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(y, want, atol=1e-5)


def test_roll2d():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = np.asarray(image_ops.roll2d(x, 1, 1))
    want = np.roll(np.roll(np.asarray(x), 1, 1), 1, 2)
    np.testing.assert_array_equal(y, want)


def test_upsample_nearest():
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    y = np.asarray(image_ops.upsample_nearest(x, 2))[0, :, :, 0]
    want = np.asarray(
        [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]], np.float32
    )
    np.testing.assert_array_equal(y, want)
