"""Per-class conditioning for generators/denoisers.

The reference keeps a ``classes`` list as scaffolding (one dataset glob per
class, reference train.py:299-321) but trains unconditionally; BASELINE.json
config 5 ("multi-class conditional transfer") and the north star's
"per-class conditioning path" require a real conditioning mechanism. Design:
a learned class embedding is broadcast spatially and concatenated to the
input as extra channels — the first conv then mixes it everywhere; cheap,
shape-static, and TPU-friendly (no dynamic gather in the hot path beyond one
(B, E) embedding lookup).

The discriminator side uses projection conditioning
(models/discriminator.py::class_embed).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops import init as init_ops
from . import unet

Params = Dict[str, Any]


def init_conditional_unet(
    key, cfg, num_classes: int, embed_dim: int = 8, in_channels: int = 3,
    out_channels: int | None = None,
) -> Params:
    k_embed, k_unet = jax.random.split(key)
    return {
        "embed": init_ops.glorot_uniform(
            k_embed, (num_classes, embed_dim), num_classes, embed_dim
        ),
        "unet": unet.init_unet(
            k_unet, cfg, in_channels=in_channels + embed_dim,
            out_channels=out_channels,
        ),
    }


def conditional_unet_apply(cfg, params: Params, x, class_idx, t=None):
    """x: (B,H,W,C); class_idx: (B,) int32 — returns the conditioned output."""
    b, h, w, _ = x.shape
    embed = params["embed"][class_idx]  # (B, E)
    embed = jnp.broadcast_to(
        embed[:, None, None, :], (b, h, w, embed.shape[-1])
    ).astype(x.dtype)
    return unet.unet_apply(cfg, params["unet"], jnp.concatenate([x, embed], -1), t)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
