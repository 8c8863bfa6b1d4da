"""Compiled model bundles: serialized StableHLO inference artifacts.

The reference can only be deployed by shipping its Python source plus a
weights directory and re-tracing the model at startup (reference
train.py:505-514 — there is no export surface at all, not even
``model.save``). A production serving fleet wants the opposite: a single
self-contained, version-stable artifact that loads and runs without the
framework's model code ever being importable on the box.

``jax.export`` gives exactly that on TPU: each inference program (reverse
diffusion sampler, raw denoiser forward, DDIM inversion, GAN transfer) is
traced once, lowered to StableHLO with the trained weights embedded as
constants, and serialized with a guaranteed-compatible calling convention.
Bundles are:

- **batch-polymorphic** — exported over a symbolic batch dimension, so one
  artifact serves any batch size (the serving batcher can coalesce freely);
- **multi-platform** — lowered for both ``tpu`` and ``cpu`` by default, so
  the same artifact runs on a dev box and a serving chip;
- **self-describing** — ``manifest.json`` records the config, model kind,
  train step, program signatures, jax version, and calling-convention
  version.

Layout::

    bundle/
      manifest.json
      sample.jaxexport
      denoise.jaxexport
      ...

CLI: ``gct2 export-model --checkpoint-dir C --out bundle/`` writes one;
``gct2 sample --bundle bundle/`` consumes one (no checkpoint, no model
build). Library: :func:`export_bundle` / :func:`load_bundle`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

FORMAT_VERSION = 1

# program name -> bundle file name
_PROGRAM_FILE = "{name}.jaxexport"
_MANIFEST = "manifest.json"


def _diffusion_programs(cfg, params):
    """Program table for a diffusion checkpoint: name -> (fn, arg specs).

    Arg specs are built lazily in :func:`export_bundle` from the signature
    description returned here: each entry is ``("image", channels)`` for a
    (b, size, size, C) float32 input or ``("ivec",)`` for a (b,) int32 one.
    """
    import jax.numpy as jnp

    from ..models import api as model_api
    from ..sample import sampler

    conditional = isinstance(params, dict) and "embed" in params
    cls = [("ivec",)] if conditional else []

    def denoise(x, t, *c):
        out = model_api.apply_denoiser(
            cfg, params, x.astype(jnp.dtype(cfg.compute_dtype)), t,
            class_idx=c[0] if c else None,
        )
        return out.astype(jnp.float32)

    def sample_fn(init, *c):
        return sampler.sample(
            cfg, params, init, class_idx=c[0] if c else None,
            snapshots=False,
        ).images

    def invert_fn(image, *c):
        return sampler.invert(
            cfg, params, image, class_idx=c[0] if c else None
        )

    def preview_fn(image, noise, *c):
        # the /denoise serving surface (single-step preview at test_step,
        # reference train.py:325-361); returns the denoised image only
        return sampler.preview(
            cfg, params, image, noise, class_idx=c[0] if c else None
        )[0]

    return {
        "denoise": (denoise, [("image", 3), ("ivec",)] + cls),
        "sample": (sample_fn, [("image", 3)] + cls),
        "invert": (invert_fn, [("image", 3)] + cls),
        "preview": (preview_fn, [("image", 3), ("image", 3)] + cls),
    }


def _gan_programs(cfg, state):
    from ..train import gan as gan_lib

    def make(direction):
        g = gan_lib.select_generator(state, direction)
        return lambda x: gan_lib._generate(cfg, g, x)

    return {
        "transfer_ab": (make("ab"), [("image", 3)]),
        "transfer_ba": (make("ba"), [("image", 3)]),
    }


def _cgan_programs(cfg, state):
    from ..models import conditional as cond_lib
    from ..train import conditional_gan as cgan_lib

    g = cgan_lib.select_generator(state)

    def transfer(x, target_class):
        return cond_lib.conditional_unet_apply(cfg, g, x, target_class)

    return {"transfer": (transfer, [("image", 3), ("ivec",)])}


def _aval_json(aval) -> Dict[str, Any]:
    return {
        "shape": [str(d) for d in aval.shape],  # symbolic dims -> "b"
        "dtype": str(aval.dtype),
    }


def export_bundle(
    cfg,
    state,
    out_dir: str,
    *,
    model: str = "diffusion",
    programs=None,
    platforms=("tpu", "cpu"),
) -> Dict[str, Any]:
    """Export trained ``state`` as a self-contained compiled bundle.

    ``model``: "diffusion" (denoise/sample/invert), "gan"
    (transfer_ab/transfer_ba), or "cgan" (transfer). ``programs``: subset of
    program names to export (default: all for the model kind). Weights — EMA
    when the run kept one — are embedded as constants. Returns the manifest.
    """
    import jax
    from jax import export as jax_export

    if model == "diffusion":
        params = state.ema_params if state.ema_params is not None else state.params
        table = _diffusion_programs(cfg, params)
    elif model == "gan":
        table = _gan_programs(cfg, state)
    elif model == "cgan":
        table = _cgan_programs(cfg, state)
    else:
        raise ValueError(f"unknown model kind {model!r}")

    if programs is not None:
        if not programs:
            raise ValueError(
                f"programs must be non-empty when given; "
                f"available for {model}: {sorted(table)}"
            )
        unknown = set(programs) - set(table)
        if unknown:
            raise ValueError(
                f"unknown programs {sorted(unknown)}; "
                f"available for {model}: {sorted(table)}"
            )
        table = {k: v for k, v in table.items() if k in programs}

    (b,) = jax_export.symbolic_shape("b")

    def spec(kind):
        if kind[0] == "image":
            return jax.ShapeDtypeStruct(
                (b, cfg.size, cfg.size, kind[1]), jax.numpy.float32
            )
        return jax.ShapeDtypeStruct((b,), jax.numpy.int32)

    os.makedirs(out_dir, exist_ok=True)
    manifest: Dict[str, Any] = {
        "format_version": FORMAT_VERSION,
        "model": model,
        "step": int(state.step),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "config": json.loads(cfg.to_json()),
        "programs": {},
    }
    for name, (fn, sig) in table.items():
        specs = [spec(k) for k in sig]
        exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
            *specs
        )
        fname = _PROGRAM_FILE.format(name=name)
        with open(os.path.join(out_dir, fname), "wb") as fh:
            fh.write(exported.serialize())
        manifest["programs"][name] = {
            "file": fname,
            "inputs": [_aval_json(a) for a in exported.in_avals],
            "outputs": [_aval_json(a) for a in exported.out_avals],
        }
        manifest.setdefault(
            "calling_convention_version", exported.calling_convention_version
        )
    with open(os.path.join(out_dir, _MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


class Bundle:
    """A loaded model bundle: ``bundle.call(name, *arrays)``.

    Programs deserialize lazily (one disk read + parse per program, cached);
    calls run under the current JAX platform, which must be one of
    ``manifest["platforms"]``.
    """

    def __init__(self, path: str, manifest: Dict[str, Any]):
        self.path = path
        self.manifest = manifest
        self._loaded: Dict[str, Any] = {}

    @property
    def programs(self):
        return sorted(self.manifest["programs"])

    def _exported(self, name: str):
        if name not in self.manifest["programs"]:
            raise KeyError(
                f"bundle has no program {name!r}; available: {self.programs}"
            )
        if name not in self._loaded:
            from jax import export as jax_export

            fname = self.manifest["programs"][name]["file"]
            with open(os.path.join(self.path, fname), "rb") as fh:
                self._loaded[name] = jax_export.deserialize(fh.read())
        return self._loaded[name]

    def call(self, name: str, *args):
        return self._exported(name).call(*args)


def load_bundle(path: str) -> Bundle:
    manifest_path = os.path.join(path, _MANIFEST)
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(
            f"{path!r} is not a model bundle (no {_MANIFEST})"
        )
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    version = manifest.get("format_version")
    if version != FORMAT_VERSION:
        raise ValueError(
            f"bundle format_version {version} unsupported "
            f"(this build reads {FORMAT_VERSION})"
        )
    return Bundle(path, manifest)
