"""InceptionV3 pool3 feature network in JAX — the standard FID embedding.

Why this exists (VERDICT r4 #4): the repo's default Fréchet embedding is
the pinned trained shape classifier (utils/fid_extractor.py), which makes
scores comparable across rounds but NOT against published FID numbers.
This module makes external comparability a one-flag operation the moment
standard weights exist on a machine: ``--fid-extractor inception:<path>``
loads any InceptionV3 state dict in the standard published formats and
scores with pool3 (2048-d) activations, exactly as FID is defined
(Heusel et al. 2017; reference publishes no numbers at all —
/root/reference/README.md:1 — so this closes a comparability gap, not a
parity gap).

Accepted weight formats (auto-detected by extension):
  * ``.pth`` / ``.pt`` — a PyTorch ``state_dict`` with torchvision
    ``inception_v3`` module names (``Conv2d_1a_3x3.conv.weight``,
    ``Mixed_5b.branch1x1.bn.running_mean``, …). This covers BOTH
    torchvision's ``inception_v3_google-*.pth`` and pytorch-fid's
    ``pt_inception-2015-12-05-*.pth`` (same names; the FID variant differs
    only in pooling semantics, selected by ``variant`` below).
  * ``.npz`` — the same key names as a NumPy archive (conv kernels may be
    OIHW like torch, or HWIO; detected per-array from the shape table).

Inference-only: each conv's BatchNorm (eps=1e-3) is FOLDED into a per-
channel scale/bias at load time, so the forward is conv → scale·x+bias →
relu — one fused op chain per layer on TPU.

Variants (pooling semantics only; weights are shared):
  * ``"fid"`` (default) — pytorch-fid's network: every InceptionA/C/E
    branch-pool avg-pool uses count_include_pad=False, and Mixed_7c's
    branch pool is a MAX pool (the historic TF-graph quirks FID scores
    are defined against).
  * ``"torchvision"`` — stock torchvision semantics (count_include_pad
    =True everywhere, avg pool in both E blocks).

Zero-egress caveat: no pretrained Inception weights exist on this image
(verified rounds 3-5), so correctness here is established structurally —
the exact torchvision shape table (tests generate synthetic state dicts
from it and load them), hand-computed pooling/BN-folding numerics, and
the known per-stage channel/spatial ledger — rather than by reproducing a
published logit vector. See docs/FID.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

INPUT_SIZE = 299
POOL3_DIM = 2048
BN_EPS = 1e-3

# ---------------------------------------------------------------- spec table ---

# Each BasicConv2d: name -> (cin, cout, (kh, kw), (sh, sw), (ph, pw)).
# Built to match torchvision.models.inception_v3 module names exactly.


def _conv_specs() -> dict:
    specs = {}

    def c(name, cin, cout, k, s=(1, 1), p=(0, 0)):
        specs[name] = (cin, cout, k, s, p)

    # stem
    c("Conv2d_1a_3x3", 3, 32, (3, 3), (2, 2))
    c("Conv2d_2a_3x3", 32, 32, (3, 3))
    c("Conv2d_2b_3x3", 32, 64, (3, 3), p=(1, 1))
    c("Conv2d_3b_1x1", 64, 80, (1, 1))
    c("Conv2d_4a_3x3", 80, 192, (3, 3))

    def inception_a(prefix, cin, pool_features):
        c(f"{prefix}.branch1x1", cin, 64, (1, 1))
        c(f"{prefix}.branch5x5_1", cin, 48, (1, 1))
        c(f"{prefix}.branch5x5_2", 48, 64, (5, 5), p=(2, 2))
        c(f"{prefix}.branch3x3dbl_1", cin, 64, (1, 1))
        c(f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), p=(1, 1))
        c(f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), p=(1, 1))
        c(f"{prefix}.branch_pool", cin, pool_features, (1, 1))
        return 64 + 64 + 96 + pool_features

    def inception_b(prefix, cin):
        c(f"{prefix}.branch3x3", cin, 384, (3, 3), (2, 2))
        c(f"{prefix}.branch3x3dbl_1", cin, 64, (1, 1))
        c(f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), p=(1, 1))
        c(f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), (2, 2))
        return 384 + 96 + cin

    def inception_c(prefix, cin, c7):
        c(f"{prefix}.branch1x1", cin, 192, (1, 1))
        c(f"{prefix}.branch7x7_1", cin, c7, (1, 1))
        c(f"{prefix}.branch7x7_2", c7, c7, (1, 7), p=(0, 3))
        c(f"{prefix}.branch7x7_3", c7, 192, (7, 1), p=(3, 0))
        c(f"{prefix}.branch7x7dbl_1", cin, c7, (1, 1))
        c(f"{prefix}.branch7x7dbl_2", c7, c7, (7, 1), p=(3, 0))
        c(f"{prefix}.branch7x7dbl_3", c7, c7, (1, 7), p=(0, 3))
        c(f"{prefix}.branch7x7dbl_4", c7, c7, (7, 1), p=(3, 0))
        c(f"{prefix}.branch7x7dbl_5", c7, 192, (1, 7), p=(0, 3))
        c(f"{prefix}.branch_pool", cin, 192, (1, 1))
        return 768

    def inception_d(prefix, cin):
        c(f"{prefix}.branch3x3_1", cin, 192, (1, 1))
        c(f"{prefix}.branch3x3_2", 192, 320, (3, 3), (2, 2))
        c(f"{prefix}.branch7x7x3_1", cin, 192, (1, 1))
        c(f"{prefix}.branch7x7x3_2", 192, 192, (1, 7), p=(0, 3))
        c(f"{prefix}.branch7x7x3_3", 192, 192, (7, 1), p=(3, 0))
        c(f"{prefix}.branch7x7x3_4", 192, 192, (3, 3), (2, 2))
        return 320 + 192 + cin

    def inception_e(prefix, cin):
        c(f"{prefix}.branch1x1", cin, 320, (1, 1))
        c(f"{prefix}.branch3x3_1", cin, 384, (1, 1))
        c(f"{prefix}.branch3x3_2a", 384, 384, (1, 3), p=(0, 1))
        c(f"{prefix}.branch3x3_2b", 384, 384, (3, 1), p=(1, 0))
        c(f"{prefix}.branch3x3dbl_1", cin, 448, (1, 1))
        c(f"{prefix}.branch3x3dbl_2", 448, 384, (3, 3), p=(1, 1))
        c(f"{prefix}.branch3x3dbl_3a", 384, 384, (1, 3), p=(0, 1))
        c(f"{prefix}.branch3x3dbl_3b", 384, 384, (3, 1), p=(1, 0))
        c(f"{prefix}.branch_pool", cin, 192, (1, 1))
        return 320 + 384 * 2 + 384 * 2 + 192

    n = inception_a("Mixed_5b", 192, 32)   # 256
    n = inception_a("Mixed_5c", n, 64)     # 288
    n = inception_a("Mixed_5d", n, 64)     # 288
    n = inception_b("Mixed_6a", n)         # 768
    n = inception_c("Mixed_6b", n, 128)
    n = inception_c("Mixed_6c", n, 160)
    n = inception_c("Mixed_6d", n, 160)
    n = inception_c("Mixed_6e", n, 192)
    n = inception_d("Mixed_7a", n)         # 1280
    n = inception_e("Mixed_7b", n)         # 2048
    n = inception_e("Mixed_7c", n)         # 2048
    assert n == POOL3_DIM
    return specs


CONV_SPECS = _conv_specs()


def synthetic_state_dict(seed: int = 0, numpy_only: bool = True) -> dict:
    """A random state dict with the EXACT torchvision key set and shapes —
    for loader/forward tests in this zero-egress environment (and a shape
    oracle for anyone preparing real weights)."""
    r = np.random.default_rng(seed)
    sd = {}
    for name, (cin, cout, (kh, kw), _, _) in CONV_SPECS.items():
        sd[f"{name}.conv.weight"] = r.normal(
            0, 0.05, (cout, cin, kh, kw)
        ).astype(np.float32)  # torch OIHW
        sd[f"{name}.bn.weight"] = r.uniform(0.5, 1.5, cout).astype(np.float32)
        sd[f"{name}.bn.bias"] = r.normal(0, 0.1, cout).astype(np.float32)
        sd[f"{name}.bn.running_mean"] = r.normal(0, 0.1, cout).astype(np.float32)
        sd[f"{name}.bn.running_var"] = r.uniform(0.5, 1.5, cout).astype(np.float32)
    return sd


# ------------------------------------------------------------------- loader ---


def _fold_bn(kernel_oihw, gamma, beta, mean, var):
    """Fold inference BatchNorm into (HWIO kernel-scaled, bias).

    y = γ·(conv(x) − μ)/√(σ²+ε) + β  ≡  conv(x)·s + (β − μ·s),
    s = γ/√(σ²+ε), applied per output channel."""
    scale = gamma / np.sqrt(var + BN_EPS)
    k = np.transpose(kernel_oihw, (2, 3, 1, 0)) * scale  # HWIO; O is last
    bias = beta - mean * scale
    return k.astype(np.float32), bias.astype(np.float32)


def load_params(path: str) -> dict:
    """Load + BN-fold an InceptionV3 state dict (.pth/.pt torch, or .npz).

    Unknown keys (``fc.*``, ``AuxLogits.*``) are ignored; a missing or
    wrongly-shaped conv/bn tensor is a hard error naming the key."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".pth", ".pt"):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):  # a full module was saved
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items()}
    elif ext == ".npz":
        sd = dict(np.load(path))
    else:
        raise ValueError(
            f"unsupported weight format {ext!r} (want .pth/.pt/.npz): {path}"
        )
    return fold_state_dict(sd)


def fold_state_dict(sd: dict) -> dict:
    params = {}
    for name, (cin, cout, (kh, kw), _, _) in CONV_SPECS.items():
        try:
            kernel = np.asarray(sd[f"{name}.conv.weight"], np.float32)
            gamma = np.asarray(sd[f"{name}.bn.weight"], np.float32)
            beta = np.asarray(sd[f"{name}.bn.bias"], np.float32)
            mean = np.asarray(sd[f"{name}.bn.running_mean"], np.float32)
            var = np.asarray(sd[f"{name}.bn.running_var"], np.float32)
        except KeyError as e:
            raise ValueError(f"state dict is missing {e.args[0]!r}") from None
        if kernel.shape == (kh, kw, cin, cout) and kernel.shape != (
            cout, cin, kh, kw,
        ):
            kernel = np.transpose(kernel, (3, 2, 0, 1))  # HWIO npz -> OIHW
        if kernel.shape != (cout, cin, kh, kw):
            raise ValueError(
                f"{name}.conv.weight: expected OIHW {(cout, cin, kh, kw)} "
                f"(or HWIO), got {kernel.shape}"
            )
        for arr, label in ((gamma, "weight"), (beta, "bias"),
                           (mean, "running_mean"), (var, "running_var")):
            if arr.shape != (cout,):
                raise ValueError(
                    f"{name}.bn.{label}: expected {(cout,)}, got {arr.shape}"
                )
        k, b = _fold_bn(kernel, gamma, beta, mean, var)
        params[name] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    return params


# ------------------------------------------------------------------ forward ---


def _conv(params, name, x):
    _, _, _, (sh, sw), (ph, pw) = CONV_SPECS[name]
    p = params[name]
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + p["bias"])


def _max_pool(x, k=3, s=2, p=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (p, p), (p, p), (0, 0)),
    )


def _avg_pool_3x3_s1_p1(x, count_include_pad: bool):
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    if count_include_pad:
        return summed / 9.0
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return summed / counts


def _branch_avg_pool(x, fid_variant: bool):
    # pytorch-fid patches every branch-pool avg pool to
    # count_include_pad=False (FIDInceptionA/C/E_1)
    return _avg_pool_3x3_s1_p1(x, count_include_pad=not fid_variant)


def _mixed_a(params, prefix, x, fid_variant):
    b1 = _conv(params, f"{prefix}.branch1x1", x)
    b5 = _conv(params, f"{prefix}.branch5x5_2",
               _conv(params, f"{prefix}.branch5x5_1", x))
    b3 = _conv(params, f"{prefix}.branch3x3dbl_1", x)
    b3 = _conv(params, f"{prefix}.branch3x3dbl_2", b3)
    b3 = _conv(params, f"{prefix}.branch3x3dbl_3", b3)
    bp = _conv(params, f"{prefix}.branch_pool",
               _branch_avg_pool(x, fid_variant))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _mixed_b(params, prefix, x):
    b3 = _conv(params, f"{prefix}.branch3x3", x)
    bd = _conv(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _conv(params, f"{prefix}.branch3x3dbl_2", bd)
    bd = _conv(params, f"{prefix}.branch3x3dbl_3", bd)
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _mixed_c(params, prefix, x, fid_variant):
    b1 = _conv(params, f"{prefix}.branch1x1", x)
    b7 = _conv(params, f"{prefix}.branch7x7_1", x)
    b7 = _conv(params, f"{prefix}.branch7x7_2", b7)
    b7 = _conv(params, f"{prefix}.branch7x7_3", b7)
    bd = _conv(params, f"{prefix}.branch7x7dbl_1", x)
    for i in (2, 3, 4, 5):
        bd = _conv(params, f"{prefix}.branch7x7dbl_{i}", bd)
    bp = _conv(params, f"{prefix}.branch_pool",
               _branch_avg_pool(x, fid_variant))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _mixed_d(params, prefix, x):
    b3 = _conv(params, f"{prefix}.branch3x3_2",
               _conv(params, f"{prefix}.branch3x3_1", x))
    b7 = _conv(params, f"{prefix}.branch7x7x3_1", x)
    for i in (2, 3, 4):
        b7 = _conv(params, f"{prefix}.branch7x7x3_{i}", b7)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _mixed_e(params, prefix, x, pool: str, fid_variant: bool):
    b1 = _conv(params, f"{prefix}.branch1x1", x)
    b3 = _conv(params, f"{prefix}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [_conv(params, f"{prefix}.branch3x3_2a", b3),
         _conv(params, f"{prefix}.branch3x3_2b", b3)], axis=-1)
    bd = _conv(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _conv(params, f"{prefix}.branch3x3dbl_2", bd)
    bd = jnp.concatenate(
        [_conv(params, f"{prefix}.branch3x3dbl_3a", bd),
         _conv(params, f"{prefix}.branch3x3dbl_3b", bd)], axis=-1)
    if pool == "max":  # FIDInceptionE_2 (Mixed_7c under variant="fid")
        pooled = _max_pool(x, k=3, s=1, p=1)
    else:
        pooled = _branch_avg_pool(x, fid_variant)
    bp = _conv(params, f"{prefix}.branch_pool", pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def pool3_features(params, x, variant: str = "fid"):
    """(N, H, W, 3) images in [−1, 1) → (N, 2048) pool3 activations.

    Any H, W — bilinearly resized to 299² first (pytorch-fid's
    resize_input=True). The [−1,1) range matches this framework's image
    convention AND pytorch-fid's normalize_input (which maps [0,1]→[−1,1])."""
    if variant not in ("fid", "torchvision"):
        raise ValueError(f"unknown variant {variant!r} (fid | torchvision)")
    fid_variant = variant == "fid"
    x = x.astype(jnp.float32)
    if x.shape[1] != INPUT_SIZE or x.shape[2] != INPUT_SIZE:
        x = jax.image.resize(
            x, (x.shape[0], INPUT_SIZE, INPUT_SIZE, 3), "bilinear"
        )
    h = _conv(params, "Conv2d_1a_3x3", x)        # 149², 32
    h = _conv(params, "Conv2d_2a_3x3", h)        # 147², 32
    h = _conv(params, "Conv2d_2b_3x3", h)        # 147², 64
    h = _max_pool(h)                             # 73², 64
    h = _conv(params, "Conv2d_3b_1x1", h)        # 73², 80
    h = _conv(params, "Conv2d_4a_3x3", h)        # 71², 192
    h = _max_pool(h)                             # 35², 192
    h = _mixed_a(params, "Mixed_5b", h, fid_variant)   # 35², 256
    h = _mixed_a(params, "Mixed_5c", h, fid_variant)   # 35², 288
    h = _mixed_a(params, "Mixed_5d", h, fid_variant)   # 35², 288
    h = _mixed_b(params, "Mixed_6a", h)                # 17², 768
    h = _mixed_c(params, "Mixed_6b", h, fid_variant)
    h = _mixed_c(params, "Mixed_6c", h, fid_variant)
    h = _mixed_c(params, "Mixed_6d", h, fid_variant)
    h = _mixed_c(params, "Mixed_6e", h, fid_variant)   # 17², 768
    h = _mixed_d(params, "Mixed_7a", h)                # 8², 1280
    h = _mixed_e(params, "Mixed_7b", h, "avg", fid_variant)  # 8², 2048
    h = _mixed_e(params, "Mixed_7c", h,
                 "max" if fid_variant else "avg", fid_variant)
    return jnp.mean(h, axis=(1, 2))              # adaptive avg pool → 2048


# ---------------------------------------------------------------- extractor ---


@functools.lru_cache(maxsize=2)
def _cached_params(path: str) -> dict:
    return load_params(path)


# Params are a jit ARGUMENT, not a closure capture: the ~21.8 M fp32
# parameters (~87 MB) baked into the HLO as constants would be re-serialized
# per batch shape and — on the axon-tunneled TPU this repo measures on —
# rejected at compile time (remote compile caps requests at ~100 MB; see
# data/device_augment.py's identical HBM-pool finding and
# tests/test_hbm_dataset_pool_is_jit_argument_not_constant).
_pool3_jit = jax.jit(pool3_features, static_argnums=2)


def features_from_file(path: str, variant: str = "fid"):
    """``images -> (N, 2048)`` extractor callable for utils/metrics.fid,
    resolved by metrics.get_extractor("inception:<path>")."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Inception weights not found: {path} — download e.g. "
            "pytorch-fid's pt_inception-2015-12-05-6726825d.pth or "
            "torchvision's inception_v3_google weights and point "
            "--fid-extractor inception:<path> at the file"
        )
    params = _cached_params(os.path.abspath(path))

    def extract(images):
        return _pool3_jit(params, jnp.asarray(images), variant)

    return extract
