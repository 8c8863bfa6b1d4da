"""Pallas TPU kernels for the hot elementwise paths.

The diffusion algebra (reference train.py:231-234) is pure elementwise work
bracketing the U-Net: ``noised = x·√ᾱ + ε·√(1−ᾱ)`` with ``ε ~ N(0,1)``.
Done naively, XLA materialises ε in HBM (generate → write → read). Under the
default ``predict_x`` parameterization ε is never needed again
(target = x, train.py:243-244), so the fused kernel below generates ε
*inside* the kernel with the on-core PRNG (Box–Muller over
``pltpu.prng_random_bits``) and writes only ``noised`` — one HBM read (x) and
one write (noised) instead of read+2·write+read.

Backward is trivial (d noised / dx = √ᾱ) via custom VJP — no recompute, no
stored residuals beyond the per-sample scale.

Used when ``cfg.fused_diffusion`` and parameterization == 'x' on TPU;
`interpret=True` path keeps it testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _normal_from_bits(bits_a, bits_b, dtype):
    """Box–Muller: two uint32 arrays -> one standard-normal array."""
    # uniform in (0, 1): top 24 bits scaled, offset to avoid log(0).
    # Mosaic can't cast uint32->f32 directly; >>8 clears the sign bit so a
    # bitcast to int32 is value-preserving and int32->f32 is supported.
    a24 = pltpu.bitcast(bits_a >> 8, jnp.int32)
    b24 = pltpu.bitcast(bits_b >> 8, jnp.int32)
    u1 = a24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
    u2 = b24.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return (r * jnp.cos(_TWO_PI * u2)).astype(dtype)


def _diffuse_kernel(seed_ref, ss_ref, sn_ref, x_ref, out_ref):
    b = pl.program_id(0)
    n = pl.program_id(1)
    # decorrelate the PRNG stream per (sample, block); Mosaic caps prng_seed
    # at 2 components, so fold (b, n) into one
    pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + n)
    bits_a = pltpu.prng_random_bits(x_ref.shape)
    bits_b = pltpu.prng_random_bits(x_ref.shape)
    eps = _normal_from_bits(
        pltpu.bitcast(bits_a, jnp.uint32),
        pltpu.bitcast(bits_b, jnp.uint32),
        x_ref.dtype,
    )
    ss = ss_ref[b, 0]  # √ᾱ(t_b)
    sn = sn_ref[b, 0]  # √(1−ᾱ(t_b))
    out_ref[:] = x_ref[:] * ss.astype(x_ref.dtype) + eps * sn.astype(x_ref.dtype)


def _pick_rows(rows: int) -> int:
    """Largest row-block ≤512 that divides rows and is a multiple of 8 (the
    fp32 sublane tile); falls back to the whole array (always legal)."""
    for blk in (512, 256, 128, 64, 32, 16, 8):
        if rows % blk == 0:
            return blk
    return rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_forward_diffuse(x, scale_signal, scale_noise, interpret=False, seed=0):
    """``x·scale_signal[b] + ε·scale_noise[b]`` with in-kernel ε ~ N(0,1).

    x: (B, N) — flattened per-sample pixels, N a multiple of 128.
    scale_signal/scale_noise: (B,) fp32. seed: python/int32 scalar.
    """
    return _fused_fwd_impl(x, scale_signal, scale_noise, interpret, seed)


def _fused_fwd_impl(x, scale_signal, scale_noise, interpret, seed):
    b, n = x.shape
    assert n % 128 == 0, f"flattened sample size {n} must be a multiple of 128"
    rows = n // 128
    rblk = _pick_rows(rows)
    grid = (b, rows // rblk)
    seed_arr = jnp.asarray([seed], jnp.int32)
    ss2 = scale_signal.reshape(b, 1)
    sn2 = scale_noise.reshape(b, 1)
    x3 = x.reshape(b, rows, 128)
    out = pl.pallas_call(
        _diffuse_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # full (B,1) scale tables resident in SMEM, indexed by sample
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, rblk, 128), lambda i, j, *_: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, rblk, 128), lambda i, j, *_: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
        interpret=interpret,
    )(seed_arr, ss2, sn2, x3)
    return out.reshape(b, n)


def _fused_fwd(x, scale_signal, scale_noise, interpret, seed=0):
    out = _fused_fwd_impl(x, scale_signal, scale_noise, interpret, seed)
    return out, (scale_signal, x.shape)


def _fused_bwd(interpret, residuals, g):
    scale_signal, _ = residuals
    dx = g * scale_signal[:, None].astype(g.dtype)
    return dx, None, None, None


fused_forward_diffuse.defvjp(_fused_fwd, _fused_bwd)


def forward_diffuse_fused(cfg, x, t, rng, interpret: bool | None = None):
    """Drop-in fused version of core.diffusion.forward_diffuse for the
    predict_x path. x: (B,H,W,C); t: (B,1,1,1) float. Returns noised."""
    from ..core.schedule import alpha_dash

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = x.shape[0]
    n = x.shape[1] * x.shape[2] * x.shape[3]
    ad = alpha_dash(t[:, 0, 0, 0], cfg.steps, cfg.schedule).astype(jnp.float32)
    ss = jnp.sqrt(ad)
    sn = jnp.sqrt(1.0 - ad)
    seed = jax.random.randint(rng, (), 0, 2**31 - 1, jnp.int32)
    flat = x.reshape(b, n)
    out = fused_forward_diffuse(flat, ss, sn, interpret, seed=seed)
    return out.reshape(x.shape)
