"""The Denoiser U-Net — functional pytree params + pure apply.

Reproduces the reference topology exactly (reference train.py:175-215):
a recursively nested stack of ``octaves`` levels, each
``DownShuffle(f_i) → Block(f_i) → inner → Block(f_i) → UpShuffle(u_i)``
wrapped in a skip connection, with ``f_i = min(pixel_size·2^i, max_size)``,
``u_i = min(pixel_size·2^i // 2, max_size)``; outer
``Block(pixel_size) → nest → Block(pixel_size) → Dense(out)``.

Skip modes (reference train.py:97-121):
  * ``concat``   (active default) — channel-concat of branch output with the
                 level input, branch cast to the input dtype (train.py:113-119)
  * ``residual`` — ``input + Dense_nobias(branch(input))`` (train.py:110-112)
  * ``none``     — passthrough.

The timestep input is accepted and **ignored** — the reference model is
unconditional on t (vestige of a per-step-output head, train.py:206-215).
The vestigial design itself is available via ``per_step_output=True``
(Dense(3·steps) head + per-sample gather on t−1, train.py:199, 211-214).

TPU-first details: NHWC layout throughout, params stored fp32 and cast to
``cfg.compute_dtype`` at apply time (Keras mixed-precision semantics,
train.py:43-45), optional per-octave rematerialisation (``cfg.remat``), and
the k4/s2 convs lower through ops/conv.py's pixel-shuffle fast path on TPU.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops import conv as conv_ops
from ..ops import init as init_ops
from ..ops import norm as norm_ops

Params = Dict[str, Any]


def _init_block(key, in_ch: int, filters: int, depth: int):
    """Block(filters): ``depth`` × 3×3/s1 SAME ReLU convs (train.py:123-143).
    depth=0 → identity (empty list)."""
    layers = []
    c = in_ch
    for _ in range(depth):
        key, k1 = jax.random.split(key)
        layers.append(
            {
                "kernel": init_ops.conv_kernel(k1, 3, 3, c, filters),
                "bias": init_ops.zeros((filters,)),
            }
        )
        c = filters
    return layers, c


def _apply_block(layers, x):
    for layer in layers:
        x = conv_ops.conv2d(x, layer["kernel"], layer["bias"], stride=1, relu=True)
    return x


def init_unet(key, cfg, in_channels: int = 3, out_channels: int | None = None) -> Params:
    """Build the parameter pytree. Returns fp32 params."""
    out_channels = cfg.out_channels() if out_channels is None else out_channels
    params: Params = {}
    c = in_channels

    key, sub = jax.random.split(key)
    params["pre_block"], c = _init_block(sub, c, cfg.pixel_size, cfg.block_depth)

    octaves = []
    skip_channels = []
    for i in range(cfg.octaves):
        f = cfg.octave_filters(i)
        skip_channels.append(c)
        key, kd = jax.random.split(key)
        level = {
            "down": {
                "kernel": init_ops.conv_kernel(kd, 4, 4, c, f),
                "bias": init_ops.zeros((f,)),
            }
        }
        if cfg.g_norm != "none":  # GAN-mode knob; reference model has none
            level["down_norm"] = norm_ops.init_norm(f)
        key, sub = jax.random.split(key)
        level["block_in"], c = _init_block(sub, f, f, cfg.block_depth)
        octaves.append(level)

    key, sub = jax.random.split(key)
    params["middle"], c = _init_block(sub, c, cfg.middle_filters(), cfg.block_depth)

    for i in reversed(range(cfg.octaves)):
        f = cfg.octave_filters(i)
        u = cfg.octave_up_filters(i)
        level = octaves[i]
        key, sub = jax.random.split(key)
        level["block_out"], c = _init_block(sub, c, f, cfg.block_depth)
        key, ku = jax.random.split(key)
        level["up"] = {
            "kernel": init_ops.conv_kernel(ku, 4, 4, c, u, transpose=True),
            "bias": init_ops.zeros((u,)),
        }
        if cfg.g_norm != "none":
            level["up_norm"] = norm_ops.init_norm(u)
        c = u
        if cfg.skip_mode == "concat":
            c = c + skip_channels[i]
        elif cfg.skip_mode == "residual":
            key, kr = jax.random.split(key)
            # Dense(input_channels, use_bias=False) on the branch output
            # (reference train.py:104-112).
            level["skip_dense"] = init_ops.dense_kernel(kr, c, skip_channels[i])
            c = skip_channels[i]
    params["octaves"] = octaves

    key, sub = jax.random.split(key)
    params["post_block"], c = _init_block(sub, c, cfg.pixel_size, cfg.block_depth)

    key, kh = jax.random.split(key)
    params["head"] = {
        "kernel": init_ops.dense_kernel(kh, c, out_channels),
        "bias": init_ops.zeros((out_channels,)),
    }
    return params


def _pair_block_conv(h, kernel, bias, impl):
    """Conv over a logical concat represented as an unmaterialised pair.

    conv(concat(a, b), K) = conv(a, K[:, :, :ca]) + conv(b, K[:, :, ca:]) —
    the concat buffer (up to ~GBs/step at batch 128, see BASELINE_MEASURED)
    is never written to HBM; bias and ReLU apply once after the sum."""
    if not isinstance(h, tuple):
        return conv_ops.conv2d(h, kernel, bias, stride=1, relu=True)
    a, b = h
    ca = a.shape[-1]
    ya = conv_ops.conv2d(a, kernel[:, :, :ca], None, stride=1, relu=False)
    yb = conv_ops.conv2d(b, kernel[:, :, ca:], bias, stride=1, relu=False)
    return jax.nn.relu(ya + yb)


def _pair_up_conv(h, kernel, bias, impl, relu: bool = True):
    if not isinstance(h, tuple):
        return conv_ops.up_conv(h, kernel, bias, impl, relu=relu)
    a, b = h
    ca = a.shape[-1]
    ya = conv_ops.up_conv(a, kernel[:, :, :ca], None, impl, relu=False)
    yb = conv_ops.up_conv(b, kernel[:, :, ca:], bias, impl, relu=False)
    s = ya + yb
    return jax.nn.relu(s) if relu else s


def _pair_dense(h, kernel, bias):
    if not isinstance(h, tuple):
        return conv_ops.dense(h, kernel, bias)
    a, b = h
    ca = a.shape[-1]
    return conv_ops.dense(a, kernel[:ca], None) + conv_ops.dense(b, kernel[ca:], bias)


def octave_down(cfg, level, h, impl=None):
    """One octave's descent: down conv (+ optional norm) + block_in convs.
    Returns ``(h, skip)`` where ``skip`` is the level input the matching
    :func:`octave_up` merges back in. Shared by :func:`unet_apply` and the
    pipeline-parallel stage functions (parallel/pipeline.py) so the two paths
    are op-for-op identical."""
    impl = cfg.conv_impl if impl is None else impl
    inp = h  # always a plain array (pre_block / block_in output)
    if cfg.g_norm != "none":
        h = conv_ops.down_conv(
            h, level["down"]["kernel"], level["down"]["bias"], impl, relu=False
        )
        h = norm_ops.apply_norm(cfg.g_norm, h, level["down_norm"])
        h = jax.nn.relu(h)
    else:
        h = conv_ops.down_conv(
            h, level["down"]["kernel"], level["down"]["bias"], impl
        )
    for layer in level["block_in"]:
        h = conv_ops.conv2d(h, layer["kernel"], layer["bias"], stride=1, relu=True)
    return h, inp


def octave_up(cfg, level, h, inp, elide=None, impl=None):
    """One octave's ascent: block_out convs + up conv + skip merge with the
    ``inp`` saved by :func:`octave_down`. ``h`` may be a (branch, skip) pair
    from the inner level (concat elision); the return is likewise a pair when
    eliding. Shared with parallel/pipeline.py."""
    impl = cfg.conv_impl if impl is None else impl
    if elide is None:
        elide = cfg.skip_mode == "concat" and getattr(cfg, "concat_elision", True)
    first = True
    for layer in level["block_out"]:
        h = _pair_block_conv(h, layer["kernel"], layer["bias"], impl) if first else conv_ops.conv2d(h, layer["kernel"], layer["bias"], stride=1, relu=True)
        first = False
    if cfg.g_norm != "none":
        h = _pair_up_conv(
            h, level["up"]["kernel"], level["up"]["bias"], impl, relu=False
        )
        h = norm_ops.apply_norm(cfg.g_norm, h, level["up_norm"])
        h = jax.nn.relu(h)
    else:
        h = _pair_up_conv(h, level["up"]["kernel"], level["up"]["bias"], impl)
    if cfg.skip_mode == "concat":
        h = h.astype(inp.dtype)  # branch cast (reference train.py:113-119)
        if elide:
            return (h, inp)
        return jnp.concatenate([h, inp], axis=-1)
    if cfg.skip_mode == "residual":
        return inp + conv_ops.dense(h, level["skip_dense"]).astype(inp.dtype)
    return h


def unet_head(cfg, params: Params, h, t=None):
    """post_block + Dense head (+ the vestigial per-step gather). ``h`` may be
    a (branch, skip) pair. Shared with parallel/pipeline.py."""
    impl = cfg.conv_impl
    first = True
    for layer in params["post_block"]:
        h = _pair_block_conv(h, layer["kernel"], layer["bias"], impl) if first else conv_ops.conv2d(h, layer["kernel"], layer["bias"], stride=1, relu=True)
        first = False
    pred = _pair_dense(h, params["head"]["kernel"], params["head"]["bias"])

    if cfg.per_step_output:
        # Vestigial per-timestep head (reference train.py:199, 211-214):
        # reshape (B,H,W,steps,3) and gather t−1 per sample.
        b, hh, ww, _ = pred.shape
        pred = pred.reshape(b, hh, ww, cfg.steps, 3)
        t_idx = jnp.reshape(t, (b, 1, 1, 1, 1)).astype(jnp.int32) - 1
        pred = jnp.take_along_axis(pred, jnp.broadcast_to(t_idx, (b, hh, ww, 1, 3)), axis=3)
        pred = pred[..., 0, :]
    return pred


def unet_apply(cfg, params: Params, x, t=None):
    """Forward pass. ``x``: (B, H, W, C) in [-1, 1). ``t``: (B,) int timesteps,
    accepted for interface parity and ignored unless ``per_step_output``.

    Concat skips are value-identical to the reference but never materialised:
    each level returns a (branch, skip) pair and every consumer splits its
    kernel along input channels (``cfg.concat_elision``)."""
    impl = cfg.conv_impl
    dtype = jnp.dtype(cfg.compute_dtype)
    x = x.astype(dtype)
    elide = cfg.skip_mode == "concat" and getattr(cfg, "concat_elision", True)

    h = _apply_block(params["pre_block"], x)

    def rec(i, h):
        level = params["octaves"][i]
        h, inp = octave_down(cfg, level, h, impl)
        if i + 1 < cfg.octaves:
            inner = lambda y: rec(i + 1, y)
            if cfg.remat:
                inner = jax.checkpoint(inner)
            h = inner(h)
        else:
            h = _apply_block(params["middle"], h)
        return octave_up(cfg, level, h, inp, elide, impl)

    if cfg.octaves > 0:
        h = rec(0, h)
    else:
        h = _apply_block(params["middle"], h)

    return unet_head(cfg, params, h, t)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
