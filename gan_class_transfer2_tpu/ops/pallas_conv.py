"""Pallas TPU kernel for the k4/s2 TF-SAME strided conv (DownShuffle).

Why: the trace/microbench data (tools/trace_step.py, tools/bench_down_impl.py)
shows XLA's strided-conv emitters reaching only ~35-40% of MXU peak on the
down path of the 256² U-Net, while the lhs-dilated up-convs run near peak.
This kernel reformulates the strided conv as an in-VMEM im2col matmul:

  for each batch element: the padded input image lives in VMEM once; each
  program builds a (R·W/2, 16·C) patch matrix for R output rows with static
  slices/reshapes (phase decomposition of the stride-2 window) and runs one
  MXU matmul against the (16·C, O) repacked kernel, applying bias+ReLU in
  the epilogue before the single HBM write.

HBM traffic is the theoretical minimum (read x once, write y once, kernel
once per N-tile) and the matmul shapes are MXU-friendly (M=R·W/2≈256,
K=16·C, N≤256). Backward is a custom VJP on clean XLA convs: dx is the
lhs-dilated transposed conv (the emitter XLA is good at), dK the standard
strided weight-grad; the ReLU mask comes from the saved output.

Applies when C % 128 == 0 and spatial/padding constraints hold (the 3-channel
stem and the 4²/8² bottleneck layers stay on lax — measured faster there).
Reference op: DownShuffle, train.py:158-169.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _down_kernel(xs_ref, k_ref, b_ref, o_ref, *, R, W2, C, relu):
    """One program: R output rows for one batch element, one N-tile.

    xs_ref: (1, 2, 2, H2+1, W2+1, C) phase-split padded input (whole image,
            constant per batch element) — phase (a, b) plane holds the
            padded input's pixels at (2i+a, 2j+b), so every k4/s2 window tap
            is a CONTIGUOUS 2-D slice of one plane: no im2col copy at all,
            just 16 accumulating MXU matmuls over direct VMEM views.
    k_ref: (16, C, Ntile) repacked kernel (di-major, dj)
    b_ref: (1, Ntile) bias tile
    o_ref: (1, R, W2, Ntile) output block
    """
    i = pl.program_id(2)
    r0 = R * i
    acc = jnp.zeros((R, W2, o_ref.shape[3]), jnp.float32)
    for di in range(4):
        a, ti = di % 2, di // 2
        for dj in range(4):
            bph, tj = dj % 2, dj // 2
            tap = xs_ref[0, a, bph, pl.ds(r0 + ti, R), tj : tj + W2, :]
            # 3-D dot_general keeps the tap a direct VMEM view (no im2col
            # copy): contract C only, (R, W2, C) x (C, N) -> (R, W2, N)
            acc += lax.dot_general(
                tap,
                k_ref[di * 4 + dj],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[0][None, None, :].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[:] = acc[None].astype(o_ref.dtype)


def _pick_rows(h2: int, w2: int) -> int:
    """R output rows per program: aim for M = R*W2 near 256."""
    r = max(1, 256 // max(w2, 1))
    while h2 % r != 0:
        r -= 1
    return r


def _down_conv_pallas_raw(x, kernel, bias, relu: bool, interpret: bool):
    b, h, w, c = x.shape
    o = kernel.shape[3]
    h2, w2 = h // 2, w // 2
    # VMEM budget: wide layers (16C >= 4096) take the k-tile down to one MXU
    # width so the double-buffered kernel tile + whole-image block fit 16 MB
    ntile = min(o, 128 if c >= 256 else 256)
    R = _pick_rows(h2, w2)
    # phase-split padded input: plane (a, b) holds padded pixels (2i+a, 2j+b)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = xp.reshape(b, h2 + 1, 2, w2 + 1, 2, c).transpose(0, 2, 4, 1, 3, 5)
    k2 = kernel.reshape(16, c, o).astype(x.dtype)  # (di,dj)-major taps
    b2 = (bias if bias is not None else jnp.zeros((o,), x.dtype)).reshape(1, o)
    grid = (b, o // ntile, h2 // R)
    out = pl.pallas_call(
        functools.partial(_down_kernel, R=R, W2=w2, C=c, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 2, 2, h2 + 1, w2 + 1, c),
                lambda bb, n, i: (bb, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (16, c, ntile), lambda bb, n, i: (0, 0, n),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ntile), lambda bb, n, i: (0, n), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, R, w2, ntile), lambda bb, n, i: (bb, i, 0, n),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, o), x.dtype),
        interpret=interpret,
    )(xs, k2, b2.astype(x.dtype))
    return out


def supported(x_shape, kernel_shape) -> bool:
    """Shapes this kernel handles AND profits on (see module doc)."""
    b, h, w, c = x_shape
    kh, kw, ci, o = kernel_shape
    # the gate must mirror _down_conv_pallas_raw's ACTUAL tile choice:
    # a divisibility test against a different tile size admits shapes
    # whose grid under-covers the output channels, returning uninitialized
    # memory for the uncovered ones (review r4: c=256, o=192 passed the
    # old `o % min(o, 256)` gate but the kernel tiled ntile=128)
    ntile = min(o, 128 if c >= 256 else 256)
    return (
        kh == 4 and kw == 4 and ci == c
        and c % 128 == 0
        and h % 2 == 0 and w % 2 == 0
        and (h // 2) >= 8 and (w // 2) >= 8  # bottleneck layers stay on lax
        and o % ntile == 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def down_conv_fused(x, kernel, bias, relu: bool = True, interpret: bool = False):
    """k4/s2 TF-SAME conv + bias + ReLU, single fused Pallas kernel."""
    return _down_conv_pallas_raw(x, kernel, bias, relu, interpret)


def _fwd(x, kernel, bias, relu, interpret):
    y = _down_conv_pallas_raw(x, kernel, bias, relu, interpret)
    return y, (x, kernel, bias, y)


def _bwd(relu, interpret, residuals, g):
    from . import conv as conv_ops

    x, kernel, bias, y = residuals
    if relu:
        g = jnp.where(y > 0, g, jnp.zeros_like(g))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(bias.dtype)
    # dx: adjoint of the strided conv = the lhs-dilated transposed conv with
    # io-swapped kernel (the emitter XLA runs near peak)
    dx = conv_ops._convt_raw(g, jnp.transpose(kernel, (0, 1, 3, 2)), 2)

    # dK: standard strided-conv weight grad via grad-of-dot on the lax path
    def dot(k):
        return jnp.vdot(conv_ops._conv_strided_raw(x, k, 2), g)

    dk = jax.grad(dot)(jnp.zeros_like(kernel))
    return dx.astype(x.dtype), dk.astype(kernel.dtype), db.astype(bias.dtype)


down_conv_fused.defvjp(_fwd, _bwd)
