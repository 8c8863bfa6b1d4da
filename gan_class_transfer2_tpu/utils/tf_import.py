"""Import reference (TF/Keras) Denoiser weights into this framework.

BASELINE.json config 2 asks for fixed-seed sample parity vs the reference.
Exact RNG parity across TF and JAX is not meaningful (different PRNG
algorithms for init/crop/flip/t/ε — SURVEY §7 'hard parts'), so parity is
established at the weight level: take a trained/initialised reference model's
weights, map them into our parameter pytree, and verify forward-pass
equality. tests/test_reference_parity.py does this end-to-end against a
TF model of the reference topology (opt-in, RUN_TF_PARITY=1).

Weight order contract: TF Keras collects ``model.weights`` in build order.
For the reference Denoiser (reference train.py:175-215) at block_depth=0
that is: outer Sequential → [pre Block (empty), octave 0 down conv(kernel,
bias), octave 1 down … octave N-1 down, middle (empty), octave N-1 up
conv(kernel, bias), … octave 0 up, post Block (empty), head Dense(kernel,
bias)] — i.e. downs outside-in, ups inside-out, then the head. With
block_depth>0 each Block contributes its convs at the corresponding point.
This function walks our pytree in the same order and consumes the flat list.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def import_flat_weights(cfg, params, flat: Sequence[np.ndarray]):
    """Fill ``params`` (from models.unet.init_unet) from a flat TF weight
    list. Conv2DTranspose kernels are converted from TF's (kh, kw, out, in)
    to our dataflow HWIO (kh, kw, in, out). Returns a new pytree."""
    import jax.numpy as jnp

    flat = list(flat)
    pos = 0

    def take():
        nonlocal pos
        arr = np.asarray(flat[pos])
        pos += 1
        return arr

    def fill_block(block):
        out = []
        for layer in block:
            k = take()
            b = take()
            assert k.shape == layer["kernel"].shape, (k.shape, layer["kernel"].shape)
            out.append({"kernel": jnp.asarray(k), "bias": jnp.asarray(b)})
        return out

    new = {}
    new["pre_block"] = fill_block(params["pre_block"])

    octaves = [dict(level) for level in params["octaves"]]
    # downs, outside-in (+ block_in convs per level)
    for level in octaves:
        k, b = take(), take()
        assert k.shape == level["down"]["kernel"].shape
        level["down"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
        level["block_in"] = fill_block(level["block_in"])
    new["middle"] = fill_block(params["middle"])
    # ups, inside-out (+ block_out convs per level)
    for level in reversed(octaves):
        level["block_out"] = fill_block(level["block_out"])
        k, b = take(), take()
        kt = k.transpose(0, 1, 3, 2)  # TF convT (kh,kw,out,in) -> HWIO
        assert kt.shape == level["up"]["kernel"].shape, (
            kt.shape,
            level["up"]["kernel"].shape,
        )
        level["up"] = {"kernel": jnp.asarray(kt), "bias": jnp.asarray(b)}
        if "skip_dense" in level:
            d = take()
            assert d.shape == level["skip_dense"].shape
            level["skip_dense"] = jnp.asarray(d)
    new["octaves"] = octaves

    new["post_block"] = fill_block(params["post_block"])
    k, b = take(), take()
    assert k.shape == params["head"]["kernel"].shape
    new["head"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}

    if pos != len(flat):
        raise ValueError(f"consumed {pos} of {len(flat)} weights — order mismatch")
    return new


def export_flat_weights(cfg, params) -> List[np.ndarray]:
    """Inverse of import_flat_weights: flatten our pytree into the TF build
    order (convT kernels converted back to TF's (kh, kw, out, in) layout),
    so trained weights can be loaded into a Keras model of the reference
    topology via ``model.set_weights``."""
    out: List[np.ndarray] = []

    def dump_block(block):
        for layer in block:
            out.append(np.asarray(layer["kernel"]))
            out.append(np.asarray(layer["bias"]))

    dump_block(params["pre_block"])
    for level in params["octaves"]:
        out.append(np.asarray(level["down"]["kernel"]))
        out.append(np.asarray(level["down"]["bias"]))
        dump_block(level["block_in"])
    dump_block(params["middle"])
    for level in reversed(params["octaves"]):
        dump_block(level["block_out"])
        out.append(np.asarray(level["up"]["kernel"]).transpose(0, 1, 3, 2))
        out.append(np.asarray(level["up"]["bias"]))
        if "skip_dense" in level:
            out.append(np.asarray(level["skip_dense"]))
    dump_block(params["post_block"])
    out.append(np.asarray(params["head"]["kernel"]))
    out.append(np.asarray(params["head"]["bias"]))
    return out


def keras_weight_list(model) -> List[np.ndarray]:
    """Flatten a Keras model's weights in build order (TF import helper)."""
    return [np.asarray(w) for w in model.get_weights()]
