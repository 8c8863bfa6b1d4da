"""Uniform denoiser-apply entry point: dispatches between the unconditional
U-Net (reference behavior) and the class-conditional variant (BASELINE
config 5) based on the parameter tree structure."""

from __future__ import annotations

import jax.numpy as jnp

from . import conditional, unet


def init_denoiser(key, cfg, in_channels: int = 3, out_channels=None):
    if cfg.num_classes > 0:
        return conditional.init_conditional_unet(
            key,
            cfg,
            num_classes=cfg.num_classes,
            embed_dim=cfg.class_embed_dim,
            in_channels=in_channels,
            out_channels=out_channels,
        )
    return unet.init_unet(key, cfg, in_channels, out_channels)


def apply_denoiser(cfg, params, x, t=None, class_idx=None):
    if isinstance(params, dict) and "embed" in params:
        if class_idx is None:
            class_idx = jnp.zeros((x.shape[0],), jnp.int32)
        return conditional.conditional_unet_apply(cfg, params, x, class_idx, t)
    return unet.unet_apply(cfg, params, x, t)
