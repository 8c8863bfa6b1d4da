"""Elementwise / spatial image ops used by the samplers and losses.

Covers the reference's eval-time noise-space edits (reference train.py:415-430)
and the auxiliary loss building blocks (avg-pool MSE train.py:274-280, DCT loss
train.py:254-260).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def avg_pool(x, window: int, stride: int | None = None):
    """tf.nn.avg_pool2d(..., 'SAME') equivalent, NHWC."""
    stride = stride or window
    out_h = -(-x.shape[1] // stride)
    out_w = -(-x.shape[2] // stride)
    pad_h = max((out_h - 1) * stride + window - x.shape[1], 0)
    pad_w = max((out_w - 1) * stride + window - x.shape[2], 0)
    pads = (
        (0, 0),
        (pad_h // 2, pad_h - pad_h // 2),
        (pad_w // 2, pad_w - pad_w // 2),
        (0, 0),
    )
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1), pads
    )
    # TF 'SAME' avg-pool divides by the true (unpadded) window size per cell.
    counts = lax.reduce_window(
        jnp.ones(x.shape[:3] + (1,), x.dtype),
        0.0,
        lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        pads,
    )
    return summed / counts


def upsample_nearest(x, factor: int):
    """Keras UpSampling2D(interpolation='nearest') (reference train.py:418)."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def roll2d(x, shift_h: int = 1, shift_w: int = 1):
    """tf.roll twice (reference train.py:422)."""
    return jnp.roll(jnp.roll(x, shift_h, axis=1), shift_w, axis=2)


def vq_quantise(x, dictionary):
    """Nearest-neighbour vector quantisation against a per-pixel codebook
    (reference train.py:424-430).

    x: (B, H, W, C); dictionary: (H, W, K, C). Returns the per-pixel nearest
    codeword under squared L2.
    """
    err = jnp.sum(
        (x[..., None, :] - dictionary[None]) ** 2, axis=-1
    )  # (B,H,W,K)
    idx = jnp.argmin(err, axis=-1)  # (B,H,W)
    return jnp.take_along_axis(
        jnp.broadcast_to(dictionary[None], (x.shape[0],) + dictionary.shape),
        idx[..., None, None],
        axis=3,
    )[..., 0, :]


def dct2d_weighted(x):
    """Frequency-weighted 2-D DCT-II (ortho) over spatial dims —
    the reference's alternative loss transform (reference train.py:254-260).

    Preserved reference quirk: the output's spatial axes come back
    TRANSPOSED, (B, W, H, C) — the reference's final
    ``tf.transpose(x, [0, 2, 3, 1])`` acts on a (B, C, W, H) tensor
    (train.py:260). Harmless for the loss (both sides pass through the same
    transform and only the mean survives), but do not index the result by
    H/W."""
    import jax.scipy.fft as jfft

    size_h, size_w = x.shape[1], x.shape[2]
    wh = 1.0 / jnp.arange(1, size_h + 1, dtype=x.dtype)
    ww = 1.0 / jnp.arange(1, size_w + 1, dtype=x.dtype)
    x = jnp.transpose(x, (0, 3, 1, 2))  # B C H W
    x = jfft.dct(x, norm="ortho", axis=-1) * ww
    x = jnp.transpose(x, (0, 1, 3, 2))  # B C W H
    x = jfft.dct(x, norm="ortho", axis=-1) * wh
    return jnp.transpose(x, (0, 2, 3, 1))  # B W H C (see quirk note)
