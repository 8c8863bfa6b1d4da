"""Normalization ops: instance norm (Pallas-fused) and batch norm.

The reference model has NO normalization anywhere (train.py:97-215 — convs
and ReLU only), so the parity U-Net keeps none by default. The GAN-mode
models (BASELINE.json north star: "instance/batch-norm ... move from
framework ops to hand-fused kernels") get:

  * ``instance_norm`` — per-(sample, channel) stats over (H, W), γ/β affine.
    On TPU, a fused Pallas kernel computes stats + normalize + affine in one
    VMEM pass per sample (one HBM read + one write; the unfused lowering
    reads the activation twice more for the two reduction passes). Falls
    back to the plain jnp path off-TPU or when the per-sample block exceeds
    the VMEM budget. Custom VJP (standard normalization adjoint) keeps it
    differentiable either way.
  * ``batch_norm`` — training-mode stats over (B, H, W); plain XLA (stats
    cross samples, so per-sample blocking does not apply).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_VMEM_BLOCK_LIMIT = 6 * 1024 * 1024  # bytes per (1,H,W,C) block, pre-buffering


def _stats(x):
    """(mean, rstd) over (H, W) per (B, C), fp32."""
    m = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    v = jnp.mean(
        jnp.square(x.astype(jnp.float32) - m), axis=(1, 2), keepdims=True
    )
    return m, jax.lax.rsqrt(v + _EPS)


def _instance_norm_ref(x, gamma, beta):
    m, r = _stats(x)
    xhat = (x.astype(jnp.float32) - m) * r
    y = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def _in_kernel(x_ref, g_ref, b_ref, o_ref):
    x = x_ref[0]  # (H, W, C)
    n = x.shape[0] * x.shape[1]
    s = jnp.sum(x, axis=(0, 1), dtype=jnp.float32)
    s2 = jnp.sum(x.astype(jnp.float32) * x, axis=(0, 1), dtype=jnp.float32)
    m = s / n
    v = jnp.maximum(s2 / n - m * m, 0.0)
    r = jax.lax.rsqrt(v + _EPS)
    scale = (g_ref[0].astype(jnp.float32) * r)[None, None, :]
    shift = (b_ref[0].astype(jnp.float32) - m * g_ref[0] * r)[None, None, :]
    o_ref[0] = (x.astype(jnp.float32) * scale + shift).astype(o_ref.dtype)


def _instance_norm_pallas(x, gamma, beta, interpret: bool = False):
    b, h, w, c = x.shape
    out = pl.pallas_call(
        _in_kernel,
        interpret=interpret,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, gamma.reshape(1, c).astype(x.dtype), beta.reshape(1, c).astype(x.dtype))
    return out


def _use_pallas(x_shape, dtype) -> bool:
    b, h, w, c = x_shape
    return (
        jax.default_backend() == "tpu"
        and c % 128 == 0
        and h * w * c * jnp.dtype(dtype).itemsize <= _VMEM_BLOCK_LIMIT
    )


def _dispatch(x, gamma, beta):
    if _use_pallas(x.shape, x.dtype):
        return _instance_norm_pallas(x, gamma, beta)
    return _instance_norm_ref(x, gamma, beta)


@jax.custom_vjp
def instance_norm(x, gamma, beta):
    """Per-(sample, channel) normalization over (H, W) with affine γ/β.

    x: (B, H, W, C); gamma/beta: (C,)."""
    return _dispatch(x, gamma, beta)


def _in_fwd(x, gamma, beta):
    y = _dispatch(x, gamma, beta)
    m, r = _stats(x)
    return y, (x, gamma, m, r)


def _in_bwd(res, dy):
    x, gamma, m, r = res
    dy = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - m) * r
    dgamma = jnp.sum(dy * xhat, axis=(0, 1, 2)).astype(gamma.dtype)
    dbeta = jnp.sum(dy, axis=(0, 1, 2)).astype(gamma.dtype)
    g = dy * gamma.astype(jnp.float32)
    mean_g = jnp.mean(g, axis=(1, 2), keepdims=True)
    mean_gx = jnp.mean(g * xhat, axis=(1, 2), keepdims=True)
    dx = r * (g - mean_g - xhat * mean_gx)
    return dx.astype(x.dtype), dgamma, dbeta


instance_norm.defvjp(_in_fwd, _in_bwd)


def batch_norm(x, gamma, beta, eps: float = _EPS):
    """Training-mode batch norm: stats over (B, H, W) per channel."""
    m = jnp.mean(x, axis=(0, 1, 2), keepdims=True, dtype=jnp.float32)
    v = jnp.mean(
        jnp.square(x.astype(jnp.float32) - m), axis=(0, 1, 2), keepdims=True
    )
    xhat = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)
    y = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def apply_norm(kind: str, x, params):
    """Dispatch helper for model code. kind: none|instance|batch."""
    if kind == "none" or kind is None:
        return x
    if kind == "instance":
        return instance_norm(x, params["gamma"], params["beta"])
    if kind == "batch":
        return batch_norm(x, params["gamma"], params["beta"])
    raise ValueError(f"unknown norm {kind!r}")


def init_norm(c: int):
    return {
        "gamma": jnp.ones((c,), jnp.float32),
        "beta": jnp.zeros((c,), jnp.float32),
    }
