"""Sample-quality metrics: Fréchet distance (FID-style), KID (unbiased
MMD²), PSNR, RMSE.

BASELINE.json names "steps-to-fixed-FID" as a tracked metric. True FID uses
InceptionV3 pool3 activations; no pretrained Inception weights exist in this
zero-egress environment (verified: no keras/torch/HF caches), so the repo
PINS ITS OWN trained feature extractor (utils/fid_extractor.py — a committed
shape classifier at >97% held-out accuracy; docs/FID.md shows the proxy
tracks visual quality). That is the default embedding whenever its weights
are present; the fixed-seed random-conv projection remains selectable
(``extractor="random"``) and is the fallback. Any callable
``images -> (N, D)`` can also be plugged in directly (e.g. a real Inception
when weights are available).

The Fréchet distance itself is exact:
``|μ₁−μ₂|² + tr(Σ₁+Σ₂−2·(Σ₁Σ₂)^{1/2})``.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------- feature extractor ---


@functools.lru_cache(maxsize=4)
def _random_feature_params(depth: int, width: int, seed: int):
    from ..ops import init as init_ops

    key = jax.random.PRNGKey(seed)
    params = []
    c = 3
    for i in range(depth):
        key, k = jax.random.split(key)
        f = min(width * 2**i, 256)
        params.append(init_ops.conv_kernel(k, 4, 4, c, f))
        c = f
    return tuple(params)


@functools.lru_cache(maxsize=4)
def _feature_extractor(depth: int, width: int, seed: int):
    """Jitted extractor cached per (depth, width, seed) — a fresh closure per
    call would defeat the jit cache and recompile on every batch."""
    from ..ops import conv as conv_ops

    params = _random_feature_params(depth, width, seed)

    @jax.jit
    def extract(x):
        h = x
        for k in params:
            h = conv_ops.conv2d(h, k, stride=2, relu=True)
        return jnp.mean(h, axis=(1, 2))

    return extract


def random_conv_features(images, depth: int = 4, width: int = 32, seed: int = 0):
    """Fixed random strided conv net → global-avg-pooled features (N, D).

    images: (N, H, W, 3) float32 in [−1, 1)."""
    return _feature_extractor(depth, width, seed)(images)


# ---------------------------------------------------------------- Fréchet ---


def _sqrtm_psd_product(s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
    """(Σ₁Σ₂)^{1/2} via scipy with PSD cleanup.

    Tiny imaginary components are normal numerical noise on a
    near-singular product and are discarded; LARGE ones mean sqrtm did
    not converge and the score would be silently wrong — reject like the
    reference FID implementations do (review r4)."""
    import scipy.linalg

    out = scipy.linalg.sqrtm(s1 @ s2)  # scipy>=1.17 returns the matrix alone
    covmean = out[0] if isinstance(out, tuple) else out
    if np.iscomplexobj(covmean):
        scale = max(float(np.abs(covmean.real).max()), 1.0)
        imag = float(np.abs(covmean.imag).max())
        if imag > 1e-3 * scale:
            raise ValueError(
                f"matrix sqrt did not converge (max imaginary component "
                f"{imag:.3g}); the eval sets are too small or degenerate "
                "for a meaningful FID — raise fid_samples or use KID"
            )
        covmean = covmean.real
    return covmean


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    sigma1, sigma2 = np.asarray(sigma1), np.asarray(sigma2)
    diff = mu1 - mu2
    covmean = _sqrtm_psd_product(sigma1, sigma2)
    return float(diff @ diff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def _stats(feats: np.ndarray, ridge: float = 1e-6):
    mu = feats.mean(0)
    sigma = np.atleast_2d(np.cov(feats, rowvar=False))
    # few-sample covariances are rank-deficient; the standard ridge keeps
    # sqrtm well-conditioned without visibly moving the score
    sigma = sigma + ridge * np.eye(sigma.shape[0])
    return mu, sigma


def get_extractor(name: str = "auto") -> Callable:
    """Resolve a named feature extractor.

    ``trained``: the pinned committed classifier (utils/fid_extractor.py);
    ``random``: the fixed-seed random-conv projection;
    ``auto``: trained when its weights file exists, else random;
    ``inception:<path>``: true InceptionV3 pool3 (utils/inception.py) from
    a standard state-dict file (.pth/.npz) — publication-comparable FID;
    ``inception-tv:<path>``: same weights, stock-torchvision pooling."""
    from . import fid_extractor

    if name.startswith("inception:") or name.startswith("inception-tv:"):
        from . import inception

        kind, _, path = name.partition(":")
        return inception.features_from_file(
            path, variant="fid" if kind == "inception" else "torchvision"
        )
    if name == "auto":
        name = "trained" if fid_extractor.available() else "random"
    if name == "trained":
        return fid_extractor.trained_features
    if name == "random":
        return random_conv_features
    raise ValueError(
        f"unknown extractor {name!r} "
        "(trained | random | auto | inception:<path> | inception-tv:<path>)"
    )


def _features(images, extractor: Callable, batch_size: int,
              min_images: int = 1) -> np.ndarray:
    if len(images) < min_images:
        # guard BEFORE extraction: an empty set would die inside
        # np.concatenate with an opaque error, and a 1-image set would pay
        # a full extraction pass before its caller's check fired
        raise ValueError(
            f"need >= {min_images} images per set, got {len(images)}"
        )
    out = []
    for i in range(0, len(images), batch_size):
        out.append(np.asarray(extractor(jnp.asarray(images[i : i + batch_size]))))
    return np.concatenate(out, 0).astype(np.float64)


def fid(
    images_a,
    images_b,
    extractor: Optional[Callable] = None,
    batch_size: int = 64,
) -> float:
    """FID-style score between two image sets ((N,H,W,3) in [−1,1)).

    ``extractor``: a callable, or None for the default (``get_extractor
    ("auto")`` — the pinned trained embedding when committed weights are
    present)."""
    extractor = extractor or get_extractor("auto")
    if len(images_a) < 2 or len(images_b) < 2:
        # np.cov on a single row silently produces a nonsense scalar
        # "covariance" (a plausible-looking but meaningless score)
        raise ValueError(
            f"fid needs >= 2 images per set, got {len(images_a)} and "
            f"{len(images_b)}"
        )
    mu_a, s_a = _stats(_features(images_a, extractor, batch_size))
    mu_b, s_b = _stats(_features(images_b, extractor, batch_size))
    return frechet_distance(mu_a, s_a, mu_b, s_b)


# --------------------------------------------------------------------- KID ---


def _poly_kernel(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    d = x.shape[1]
    return (x @ y.T / d + 1.0) ** 3


def kid(
    images_a,
    images_b,
    extractor: Optional[Callable] = None,
    batch_size: int = 64,
) -> float:
    """Kernel Inception Distance: UNBIASED MMD² between the two feature
    sets under the polynomial kernel k(x,y) = (xᵀy/d + 1)³ (Bińkowski et
    al., "Demystifying MMD GANs", 2018 — the standard KID formulation,
    here over the same pinned embedding FID uses).

    Why it exists next to ``fid``: the FID *estimator* is biased at small
    eval-set sizes — docs/FID.md measures the same-class "floor" falling
    23→3.5 as n goes 64→512 purely from that bias, which made
    floor-multiple targets ill-posed. KID's estimator is unbiased:
    matched distributions score ≈ 0 at ANY n (slightly negative values
    are normal noise), so absolute KID values are comparable across
    eval-set sizes."""
    extractor = extractor or get_extractor("auto")
    x = _features(images_a, extractor, batch_size, min_images=2)
    y = _features(images_b, extractor, batch_size, min_images=2)
    return _kid_from_features(x, y)


def _kid_from_features(x: np.ndarray, y: np.ndarray) -> float:
    n, m = len(x), len(y)
    kxx = _poly_kernel(x, x)
    kyy = _poly_kernel(y, y)
    kxy = _poly_kernel(x, y)
    sum_off_xx = kxx.sum() - np.trace(kxx)
    sum_off_yy = kyy.sum() - np.trace(kyy)
    return float(
        sum_off_xx / (n * (n - 1))
        + sum_off_yy / (m * (m - 1))
        - 2.0 * kxy.mean()
    )


def extract_features(images, extractor: Optional[Callable] = None,
                     batch_size: int = 64) -> np.ndarray:
    """Precompute an image set's embedding — pass the result as
    ``features_b`` to :func:`fid_and_kid` when the set is FIXED across
    calls (the per-epoch loggers re-score against the same held-out sets
    every epoch; re-extracting them dominated eval cost at large
    fid_samples). Must use the same extractor as the comparison call."""
    extractor = extractor or get_extractor("auto")
    return _features(images, extractor, batch_size)


def fid_and_kid(
    images_a,
    images_b,
    extractor: Optional[Callable] = None,
    batch_size: int = 64,
    features_b: Optional[np.ndarray] = None,
) -> dict:
    """Both quality scores from ONE feature-extraction pass per image set —
    the per-epoch loggers and `gct2 eval` report fid and kid together, and
    extracting twice doubles the dominant cost (the extractor forward over
    up to fid_samples images per set).

    ``features_b``: precomputed :func:`extract_features` of ``images_b``
    (which is then ignored) — for fixed reference sets scored repeatedly."""
    extractor = extractor or get_extractor("auto")
    x = _features(images_a, extractor, batch_size, min_images=2)
    y = (
        np.asarray(features_b, np.float64)
        if features_b is not None
        else _features(images_b, extractor, batch_size, min_images=2)
    )
    if len(y) < 2:  # precomputed features_b skips the in-extractor guard
        raise ValueError(f"need >= 2 images per set, got {len(y)}")
    mu_a, s_a = _stats(x)
    mu_b, s_b = _stats(y)
    return {
        "fid": frechet_distance(mu_a, s_a, mu_b, s_b),
        "kid": _kid_from_features(x, y),
    }


# ------------------------------------------------------------ pixel metrics ---


def rmse(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def psnr(a, b, data_range: float = 2.0) -> float:
    """PSNR in dB; default data_range=2 for images in [−1, 1)."""
    e = rmse(a, b)
    if e == 0:
        return float("inf")
    return float(20.0 * np.log10(data_range / e))
