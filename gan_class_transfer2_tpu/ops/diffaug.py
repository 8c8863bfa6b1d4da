"""Differentiable augmentation for discriminator inputs (DiffAugment).

The reference has no GAN at all (SURVEY §0) — this is a framework-side
quality lever for the GAN-mode configs (BASELINE.json class transfer):
with small per-class datasets the discriminator memorises the real set and
the generator's FID plateaus; augmenting EVERY discriminator input (real
and fake, in both the D and G adversarial terms) regularises D without
ever leaking augmentation into the generator's outputs.

Policies (``Config.diffaug``, comma list):
  * ``color``       — per-sample brightness / saturation / contrast jitter
  * ``translation`` — per-sample integer shift up to ⌈size/8⌉, zero pad
  * ``cutout``      — per-sample zeroed square of side size/2

All transforms are pure jnp (differentiable where meaningful, jittable,
static shapes) and draw per-sample parameters from the step ``rng``, so a
fresh draw happens at every discriminator call — the standard DiffAugment
formulation. Inputs are NHWC in [-1, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _color(rng, x):
    kb, ks, kc = jax.random.split(rng, 3)
    n = x.shape[0]
    shape = (n, 1, 1, 1)
    # brightness: x + U(-0.5, 0.5)
    x = x + jax.random.uniform(kb, shape, x.dtype, -0.5, 0.5)
    # saturation: scale distance from the per-pixel channel mean by U(0, 2)
    mean_c = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - mean_c) * jax.random.uniform(ks, shape, x.dtype, 0.0, 2.0) + mean_c
    # contrast: scale distance from the per-sample mean by U(0.5, 1.5)
    mean_s = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean_s) * jax.random.uniform(kc, shape, x.dtype, 0.5, 1.5) + mean_s
    return x


def _translation(rng, x):
    n, h, w, c = x.shape
    # per-axis bound ceil(size/8) (the DiffAugment policy's ratio) — one
    # height-derived bound would silently shrink horizontal shifts on
    # non-square inputs
    sy = max(-(-h // 8), 1)
    sx = max(-(-w // 8), 1)
    kx, ky = jax.random.split(rng)
    ty = jax.random.randint(ky, (n,), -sy, sy + 1)
    tx = jax.random.randint(kx, (n,), -sx, sx + 1)
    pad = jnp.pad(x, ((0, 0), (sy, sy), (sx, sx), (0, 0)))

    def shift_one(img, dy, dx):
        return jax.lax.dynamic_slice(img, (sy + dy, sx + dx, 0), (h, w, c))

    return jax.vmap(shift_one)(pad, ty, tx)


def _cutout(rng, x):
    n, h, w, _ = x.shape
    ch, cw = max(h // 2, 1), max(w // 2, 1)
    ky, kx = jax.random.split(rng)
    # top-left corner such that the square can hang off the edges (standard
    # DiffAugment centring: offset in [-c/2, dim - c/2])
    oy = jax.random.randint(ky, (n, 1, 1), -(ch // 2), h - ch // 2 + 1)
    ox = jax.random.randint(kx, (n, 1, 1), -(cw // 2), w - cw // 2 + 1)
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    inside = (
        (ys >= oy) & (ys < oy + ch) & (xs >= ox) & (xs < ox + cw)
    )  # (n, h, w)
    return x * (1.0 - inside[..., None].astype(x.dtype))


_POLICIES = {"color": _color, "translation": _translation, "cutout": _cutout}


def augment(cfg, rng, x):
    """Apply ``cfg.diffaug``'s policies in order with per-call draws.

    No-op (returns ``x`` unchanged, no rng consumed) when the policy string
    is empty — the parity-default path stays bit-identical.
    """
    names = [p for p in cfg.diffaug.split(",") if p]
    if not names:
        return x
    keys = jax.random.split(rng, len(names))
    for name, key in zip(names, keys):
        x = _POLICIES[name](key, x)
    return x
