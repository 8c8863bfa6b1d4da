"""Discriminator for GAN-mode class transfer.

The reference code has no discriminator (SURVEY §0 — despite the repo name,
train.py is a pure diffusion trainer); BASELINE.json's north star requires
G/D conv stacks with adversarial + reconstruction losses. This module is the
framework's native D: a strided-conv encoder built from the same 4×4/s2
DownShuffle op family as the U-Net (ops/conv.py fast paths apply), leaky-ReLU
activations, and either PatchGAN per-patch logits (1×1 dense on the final
feature map) or a single pooled logit per image.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops import conv as conv_ops
from ..ops import init as init_ops
from ..ops import norm as norm_ops

Params = Dict[str, Any]


def _d_octaves(cfg) -> int:
    return cfg.d_octaves or cfg.octaves


def _d_filters(cfg, i: int) -> int:
    base = cfg.d_pixel_size or cfg.pixel_size
    return min(base * 2**i, cfg.max_size)


def init_discriminator(key, cfg, in_channels: int = 3, num_classes: int = 0) -> Params:
    params: Params = {"convs": []}
    c = in_channels
    for i in range(_d_octaves(cfg)):
        f = _d_filters(cfg, i)
        key, k1 = jax.random.split(key)
        layer = {
            "kernel": init_ops.conv_kernel(k1, 4, 4, c, f),
            "bias": init_ops.zeros((f,)),
        }
        # CycleGAN convention: normalize every D layer except the first
        if cfg.d_norm != "none" and i > 0:
            layer["norm"] = norm_ops.init_norm(f)
        params["convs"].append(layer)
        c = f
    key, kh = jax.random.split(key)
    params["head"] = {
        "kernel": init_ops.dense_kernel(kh, c, 1),
        "bias": init_ops.zeros((1,)),
    }
    if num_classes > 0:
        # projection-discriminator class conditioning: logit += <embed_y, feat>
        key, ke = jax.random.split(key)
        params["class_embed"] = init_ops.glorot_uniform(
            ke, (num_classes, c), num_classes, c
        )
    return params


def discriminator_apply(cfg, params: Params, x, class_idx=None):
    """x: (B,H,W,C) → logits (B, h', w', 1) if patch_discriminator else (B, 1)."""
    h = x.astype(jnp.dtype(cfg.compute_dtype))
    for layer in params["convs"]:
        h = conv_ops.down_conv(
            h, layer["kernel"], layer["bias"], cfg.conv_impl, relu=False
        )
        if "norm" in layer:
            h = norm_ops.apply_norm(cfg.d_norm, h, layer["norm"])
        h = jax.nn.leaky_relu(h, 0.2)
    logits = conv_ops.dense(h, params["head"]["kernel"], params["head"]["bias"])
    if not cfg.patch_discriminator:
        logits = jnp.mean(logits, axis=(1, 2))  # (B, 1)
        feat = jnp.mean(h, axis=(1, 2))
    else:
        feat = h
    if class_idx is not None and "class_embed" in params:
        embed = params["class_embed"][class_idx].astype(feat.dtype)  # (B, C)
        if cfg.patch_discriminator:
            proj = jnp.einsum("bhwc,bc->bhw", feat, embed)[..., None]
        else:
            proj = jnp.sum(feat * embed, axis=-1, keepdims=True)
        logits = logits + proj
    return logits.astype(jnp.float32)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
