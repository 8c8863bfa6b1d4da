"""Spatial sharding — the sequence-parallel analogue for conv U-Nets.

The reference has no attention/sequences; its scaling dimension is image
resolution (SURVEY §5 "long-context"). At 512²+ per-sample activations
outgrow HBM under big batches; the TPU-native answer is sharding the *height*
axis of activations across the mesh and exchanging one-pixel halos between
neighbouring shards before each spatial conv (`shard_map` + `ppermute` over
ICI).

This module provides:

  * ``halo_exchange(x, axis_name)`` — append the neighbour rows needed by a
    k=4/s2 'SAME' conv (one row from each neighbour — the halo implied by
    TF-'SAME' padding (1,1); boundary shards zero-pad instead).
  * ``sharded_down_conv`` — the DownShuffle op on height-sharded activations:
    halo exchange, then a VALID k=4/s2 conv on the padded shard.
  * ``make_spatial_apply`` — wraps both into a shard_map'd callable for use
    under jit over a mesh with a 'spatial' axis.

Each shard must hold an even number of rows (stride alignment). Value parity
with the unsharded op is tested on the 8-device CPU mesh
(tests/test_spatial.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.conv import DN, _precision


def _shift_from_lower(x, axis_name, rows: int):
    """Rows sent upward: shard i receives the *last* ``rows`` rows of shard
    i−1 (zeros at the boundary)."""
    if rows == 0:
        # x[:, -0:] would slice the WHOLE shard — a zero halo is an empty
        # block, and skipping the ppermute saves the collective too
        return x[:, :0, :, :]
    n = jax.lax.psum(1, axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    chunk = x[:, -rows:, :, :]
    recv = jax.lax.ppermute(chunk, axis_name, perm)
    return recv  # shard 0 receives zeros


def _shift_from_upper(x, axis_name, rows: int):
    """Shard i receives the *first* ``rows`` rows of shard i+1."""
    if rows == 0:  # skip the collective (x[:, :0] is already empty)
        return x[:, :0, :, :]
    n = jax.lax.psum(1, axis_name)
    perm = [(i + 1, i) for i in range(n - 1)]
    chunk = x[:, :rows, :, :]
    recv = jax.lax.ppermute(chunk, axis_name, perm)
    return recv  # last shard receives zeros


def halo_exchange(x, axis_name: str, lo: int = 1, hi: int = 1):
    """Pad the height axis of a height-sharded (B, h_shard, W, C) block with
    ``lo`` rows from the previous shard and ``hi`` rows from the next
    (zeros at the global boundary — exactly TF-'SAME' (1,1) padding for a
    k=4/s2 conv: output row i consumes input rows [2i−1, 2i+2])."""
    top = _shift_from_lower(x, axis_name, lo)
    bottom = _shift_from_upper(x, axis_name, hi)
    return jnp.concatenate([top, x, bottom], axis=1)


def _sharded_down_conv_local(x, kernel, bias, axis_name):
    """Local computation of the k4/s2 'SAME' conv on a height shard."""
    if x.shape[1] % 2:
        # an odd per-shard height breaks the stride-2 phase on shards > 0:
        # the global output would be the wrong height AND numerically wrong
        # per row, silently (review r4). Shapes are static here, so this
        # raises at trace time.
        raise ValueError(
            f"spatial down-conv needs an even per-shard height, got "
            f"{x.shape[1]} — use fewer spatial shards or a divisible size"
        )
    xh = halo_exchange(x, axis_name, lo=1, hi=1)
    # width handled locally with the usual SAME pads (1,1)
    y = lax.conv_general_dilated(
        xh,
        kernel.astype(x.dtype),
        window_strides=(2, 2),
        padding=((0, 0), (1, 1)),
        dimension_numbers=DN,
        precision=_precision(x),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return jax.nn.relu(y)


def make_spatial_down_conv(mesh: Mesh, axis: str = "spatial"):
    """Build a jitted height-sharded DownShuffle: (B, H, W, C) sharded on H.

    Returns ``fn(x, kernel, bias) -> y`` with y's height = H/2, still sharded.
    """
    from jax import shard_map

    fn = shard_map(
        functools.partial(_sharded_down_conv_local, axis_name=axis),
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(), P()),
        out_specs=P(None, axis, None, None),
    )
    return jax.jit(fn)


def spatial_sharding(mesh: Mesh, axis: str = "spatial") -> NamedSharding:
    return NamedSharding(mesh, P(None, axis, None, None))
