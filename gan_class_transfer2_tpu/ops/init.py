"""Parameter initializers.

Reproduces TF/Keras ``glorot_uniform`` semantics (the reference uses it on
every conv/dense: reference train.py:134, 149, 161) including TF's fan
computation rules, which differ per layer type:

  * Conv2D kernel (kh, kw, in, out):            fan_in = kh·kw·in,  fan_out = kh·kw·out
  * Conv2DTranspose kernel (kh, kw, out, in):    fan_in = kh·kw·out, fan_out = kh·kw·in
    (TF computes fans positionally on the stored shape — for transposed convs
    the roles are swapped relative to dataflow.)
  * Dense (in, out):                             fan_in = in, fan_out = out

We store all kernels as HWIO = (kh, kw, in, out) where "in/out" are the
layer's dataflow channels, so the transpose-conv fan rule is expressed
explicitly via ``transpose=True``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def glorot_uniform(key, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def conv_kernel(key, kh, kw, in_ch, out_ch, transpose=False, dtype=jnp.float32):
    """Glorot-uniform conv kernel, HWIO layout.

    With ``transpose=True`` uses TF's Conv2DTranspose fan rule (fans computed
    on TF's (kh, kw, out, in) storage layout)."""
    rf = kh * kw
    if transpose:
        fan_in, fan_out = rf * out_ch, rf * in_ch
    else:
        fan_in, fan_out = rf * in_ch, rf * out_ch
    return glorot_uniform(key, (kh, kw, in_ch, out_ch), fan_in, fan_out, dtype)


def dense_kernel(key, in_ch, out_ch, dtype=jnp.float32):
    return glorot_uniform(key, (in_ch, out_ch), in_ch, out_ch, dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
