"""Convolution primitives, NHWC, TF-'SAME' semantics, TPU-first.

Two interchangeable implementations of each strided op (selected by
``Config.conv_impl``):

  * ``lax``     — direct ``lax.conv_general_dilated`` lowering. The 4×4/s2
                  transposed conv (reference train.py:145-156) is expressed as
                  the exact gradient-of-conv (TF Conv2DTranspose semantics)
                  via ``lhs_dilation``.
  * ``shuffle`` — pixel-shuffle reformulation: the k4/s2 transposed conv is
                  rewritten as a dense 3×3/s1 conv producing 4·out channels
                  followed by depth-to-space, and the k4/s2 strided conv as
                  space-to-depth followed by a 2×2/s1 conv. Both shapes map
                  straight onto the MXU with no strided/dilated windows —
                  this is the "conv-transpose as custom kernel" target named
                  in SURVEY.md §7.

Both produce identical values (see tests/test_conv.py) — the weights are the
same canonical HWIO tensors, repacked on the fly (XLA constant-folds the
repacking under jit since weights are loop-invariant... they are traced
arguments, so the repack runs per step; it is O(k²·C²) — negligible next to
the conv itself).

All kernels are stored HWIO = (kh, kw, in, out) in *dataflow* orientation
(for transposed convs too). ``dimension_numbers = ('NHWC', 'HWIO', 'NHWC')``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def _precision(x):
    """fp32 inputs get true-fp32 accumulation: XLA's default lowers fp32
    convs through reduced-precision passes (measured ~3e-2 abs error vs
    1e-6 at HIGHEST). bf16 compute keeps the fast default MXU path."""
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def _same_pads(in_size: int, k: int, s: int):
    """TF 'SAME' padding (lo, hi) for a strided conv."""
    out = -(-in_size // s)
    total = max((out - 1) * s + k - in_size, 0)
    lo = total // 2
    return lo, total - lo


def conv2d(x, kernel, bias=None, stride: int = 1, relu: bool = False):
    """TF-SAME conv. kernel HWIO."""
    y = _conv_strided_raw(x, kernel, stride)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    return y


def _convt_raw(x, kernel, stride: int):
    """The lhs-dilated lowering of the transposed conv (forward only)."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    out_h, out_w = x.shape[1] * stride, x.shape[2] * stride
    # Forward conv (whose gradient this is): out_h -> x.shape[1] with SAME pads.
    ph = _same_pads(out_h, kh, stride)
    pw = _same_pads(out_w, kw, stride)
    return lax.conv_general_dilated(
        x,
        jnp.flip(kernel, (0, 1)).astype(x.dtype),
        window_strides=(1, 1),
        padding=(
            (kh - 1 - ph[0], kh - 1 - ph[1]),
            (kw - 1 - pw[0], kw - 1 - pw[1]),
        ),
        lhs_dilation=(stride, stride),
        dimension_numbers=DN,
        precision=_precision(x),
    )


def _conv_strided_raw(x, kernel, stride: int):
    """Plain TF-SAME strided conv (no bias/act) — shared by conv2d and the
    transposed conv's hand-written adjoint."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    pads = (
        _same_pads(x.shape[1], kh, stride),
        _same_pads(x.shape[2], kw, stride),
    )
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pads,
        dimension_numbers=DN,
        precision=_precision(x),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _convt_core(x, kernel, stride: int):
    """Transposed conv with a hand-written adjoint.

    XLA's autodiff transpose of the lhs-dilated lowering spatially REVERSES
    the upstream gradient (a full activation-sized HBM round trip per
    up-conv — profiled at ~6 ms/step total on the 256² b128 workload,
    tools/trace_step.py). The adjoint pair is instead expressed directly as
    clean strided convs, which XLA emits with its efficient strided-conv
    weight-grad emitters and zero reverses (verified exact vs autodiff):
      dx = conv2d(g, swap_io(K), stride, SAME)
      dK = swap_io(weight-grad of conv2d(g, ·, stride) at cotangent x)
    """
    return _convt_raw(x, kernel, stride)


def _convt_fwd(x, kernel, stride):
    return _convt_raw(x, kernel, stride), (x, kernel)


def _convt_bwd(stride, residuals, g):
    x, kernel = residuals
    k_swap = jnp.transpose(kernel, (0, 1, 3, 2))
    dx = _conv_strided_raw(g, k_swap, stride)

    def dot(ks):
        return jnp.vdot(_conv_strided_raw(g, ks, stride), x)

    dk_swap = jax.grad(dot)(jnp.zeros_like(k_swap))
    return dx.astype(x.dtype), jnp.transpose(dk_swap, (0, 1, 3, 2)).astype(kernel.dtype)


_convt_core.defvjp(_convt_fwd, _convt_bwd)


def conv2d_transpose(x, kernel, bias=None, stride: int = 2, relu: bool = False):
    """TF Conv2DTranspose 'SAME' semantics (exact gradient-of-conv).

    kernel HWIO with I = input channels of this op, O = output channels.
    Output spatial = input · stride. Backward runs through the hand-written
    adjoint (_convt_core) — value- and gradient-identical to autodiff, minus
    the activation reverses.
    """
    y = _convt_core(x, kernel, stride)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    return y


# --------------------------------------------------------------------------
# Pixel-shuffle reformulations (k=4, s=2 fast paths)
# --------------------------------------------------------------------------


def space_to_depth(x, block: int = 2):
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // block, w // block, block * block * c
    )


def depth_to_space(x, block: int = 2):
    b, h, w, c = x.shape
    o = c // (block * block)
    x = x.reshape(b, h, w, block, block, o)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * block, w * block, o)


def _transpose_shuffle_kernel(kernel):
    """Repack a k4/s2 transposed-conv kernel (4,4,I,O) into a 3×3 conv kernel
    (3,3,I,4·O) such that  conv3x3(pad1(x)) → depth_to_space  equals
    conv2d_transpose(x).

    Derivation: with SAME pads (1,1) the transposed conv is a lhs-dilated
    conv with pads (2,2) and flipped kernel K'. Output phase a∈{0,1} along an
    axis only sees flipped-kernel taps K'[a::2]; on the once-padded input the
    two phases are the same valid conv shifted by one pixel, so both embed in
    a single 3-tap kernel: phase0 -> taps (0,1), phase1 -> taps (1,2).
    """
    kf = jnp.flip(kernel, (0, 1))  # K'
    i_ch, o_ch = kernel.shape[2], kernel.shape[3]
    out = jnp.zeros((3, 3, i_ch, 4, o_ch), kernel.dtype)
    for a in (0, 1):  # output row phase
        for b in (0, 1):  # output col phase
            # phase taps along rows: K'[a], K'[a+2] at 3-kernel rows (a+0, a+1)
            for ti in (0, 1):
                for tj in (0, 1):
                    out = out.at[a + ti, b + tj, :, 2 * a + b, :].set(
                        kf[a + 2 * ti, b + 2 * tj]
                    )
    return out.reshape(3, 3, i_ch, 4 * o_ch)


def conv2d_transpose_shuffle(x, kernel, bias=None, relu: bool = False):
    """k=4, s=2 transposed conv as pad-1 → 3×3/s1 conv → depth_to_space."""
    assert kernel.shape[0] == 4 and kernel.shape[1] == 4
    k = _transpose_shuffle_kernel(kernel).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=DN,
        precision=_precision(x),
    )
    y = depth_to_space(y, 2)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    return y


def _down_shuffle_kernel(kernel):
    """Repack a k4/s2 conv kernel (4,4,I,O) into a 2×2 conv kernel
    (2,2,4·I,O) over the space-to-depth'd padded input.

    y[i] = Σ_dk xp[2i+dk]·K[dk] with xp = pad1(x); writing xp as interleaved
    even/odd phase planes (xe, xo): y[i] = xe[i]K0 + xo[i]K1 + xe[i+1]K2 +
    xo[i+1]K3 — a 2-tap conv over stacked phases.
    """
    i_ch, o_ch = kernel.shape[2], kernel.shape[3]
    out = jnp.zeros((2, 2, 2, 2, i_ch, o_ch), kernel.dtype)  # (ti,tj,a,b,I,O)
    for ti in (0, 1):
        for tj in (0, 1):
            for a in (0, 1):
                for b in (0, 1):
                    out = out.at[ti, tj, a, b].set(kernel[2 * ti + a, 2 * tj + b])
    return out.reshape(2, 2, 4 * i_ch, o_ch)


def conv2d_down_shuffle(x, kernel, bias=None, relu: bool = False):
    """k=4, s=2 SAME conv as pad-1 → space_to_depth → 2×2/s1 conv.

    Even spatial dims only: the reformulation's pad is fixed at (1, 1) and
    space_to_depth needs 2-divisible extents, while TF-SAME on an odd
    input pads (1, 2) — silently different math. The lax impl handles odd
    inputs; this one refuses them (review r4)."""
    assert kernel.shape[0] == 4 and kernel.shape[1] == 4
    if x.shape[1] % 2 or x.shape[2] % 2:
        raise ValueError(
            f"impl='shuffle' needs even spatial dims, got "
            f"{x.shape[1]}x{x.shape[2]} — use impl='lax'"
        )
    k = _down_shuffle_kernel(kernel).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = space_to_depth(xp, 2)
    y = lax.conv_general_dilated(
        xs,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=DN,
        precision=_precision(x),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    return y


# --------------------------------------------------------------------------
# Dispatch
# --------------------------------------------------------------------------


def down_conv(x, kernel, bias, impl: str = "auto", relu: bool = True):
    """DownShuffle op (reference train.py:158-169): 4×4/s2 SAME conv + ReLU.

    impl: 'auto' (lax — measured fastest), 'lax', 'shuffle' (space-to-depth
    reformulation), 'pallas' (fused phase-split kernel, ops/pallas_conv.py;
    falls back to lax on unsupported shapes or non-TPU backends)."""
    if impl == "pallas" and bias is not None:
        from . import pallas_conv

        if (
            pallas_conv.supported(x.shape, kernel.shape)
            and jax.default_backend() == "tpu"
        ):
            return pallas_conv.down_conv_fused(x, kernel, bias, relu, False)
        return conv2d(x, kernel, bias, stride=2, relu=relu)
    if impl == "shuffle" or (impl == "auto" and _prefer_shuffle()):
        return conv2d_down_shuffle(x, kernel, bias, relu=relu)
    return conv2d(x, kernel, bias, stride=2, relu=relu)


def up_conv(x, kernel, bias, impl: str = "auto", relu: bool = True):
    """UpShuffle op (reference train.py:145-156): 4×4/s2 transposed conv + ReLU."""
    if impl == "shuffle" or (impl == "auto" and _prefer_shuffle()):
        return conv2d_transpose_shuffle(x, kernel, bias, relu=relu)
    return conv2d_transpose(x, kernel, bias, stride=2, relu=relu)


def _prefer_shuffle() -> bool:
    """Measured on TPU v5e (256² U-Net train step, bf16, batch 32): XLA's
    native strided/dilated conv lowering beats the pixel-shuffle
    reformulation (711 vs 453 img/s) — its conv-packing already handles
    k4/s2 well. 'auto' therefore always picks the lax path; the shuffle
    kernels remain selectable via Config.conv_impl='shuffle'."""
    return False


def dense(x, kernel, bias=None):
    y = jnp.einsum(
        "...i,io->...o", x, kernel.astype(x.dtype), precision=_precision(x)
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
