"""Inversion, noise-space edits, and reverse-diffusion sampling.

The reference runs these as 401 separate eager denoiser dispatches per epoch
(reference train.py:323-496, SURVEY §3.4). Here each loop is a single
``lax.scan`` inside one jitted program — the denoiser weights stay resident,
the loop is compiled once, and intermediate snapshots are written into a
fixed-size buffer with ``lax.cond``-free masked updates.

Pipeline (mirrors log_sample):
  (a) ``preview``       — single-step denoise at ``test_step``   (train.py:325-361)
  (b) ``invert``        — t = 1…T ascending DDIM-style encoder   (train.py:364-413)
  (c) ``edit_noise``    — pixelate / shift / VQ-quantise ε̂       (train.py:415-437)
  (d) ``sample``        — t = T…1 reverse diffusion + snapshots  (train.py:439-496)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import diffusion
from ..models import api as model_api
from ..ops import image as image_ops


def sample_timesteps(cfg):
    """The reverse-diffusion visit order T, T−s, … (descending) under
    ``cfg.sample_stride`` — the ONE definition of the subset schedule, shared
    by ``sample``, ``sample_stream``, and the serving stream
    (serve/server.py), so every sampling surface visits identical timesteps."""
    import numpy as np

    stride = max(getattr(cfg, "sample_stride", 1), 1)
    return np.arange(cfg.steps, 0, -stride)


def preview(cfg, params, example_image, noise, class_idx=None):
    """Single-step denoise preview. Returns (denoised, rmse).

    ``example_image``: (1,H,W,3) clean image; ``noise``: same shape.
    (reference train.py:325-361)
    """
    factor = diffusion.preview_image_factor(cfg)
    noised = example_image * factor**0.5 + noise * (1 - factor) ** 0.5
    prediction = model_api.apply_denoiser(
        cfg, params, noised,
        jnp.full((noised.shape[0],), cfg.test_step, jnp.int32),
        class_idx=class_idx,
    ).astype(jnp.float32)
    denoised = diffusion.preview_denoise(cfg, noised, prediction)
    rmse = jnp.mean((example_image - denoised) ** 2) ** 0.5
    return denoised, rmse


def _denoise_call(cfg, params, fake, t, class_idx=None):
    t_vec = jnp.full((fake.shape[0],), t, jnp.int32)
    return model_api.apply_denoiser(
        cfg, params, fake.astype(jnp.dtype(cfg.compute_dtype)), t_vec,
        class_idx=class_idx,
    ).astype(jnp.float32)


def invert(cfg, params, image, class_idx=None):
    """DDIM-style encoder: iterate t = 1…T, alternately re-noising and
    re-estimating (x̂, ε̂) (reference train.py:364-413). Returns (x̂, ε̂).

    Initialisation quirk preserved: ε̂ starts as the image itself
    ("might be close enough", train.py:367)."""

    def body(carry, t):
        x_theta, epsilon_theta = carry
        t = t.astype(jnp.float32)
        fake = diffusion.renoise(cfg, x_theta, epsilon_theta, t)
        prediction = _denoise_call(cfg, params, fake, t, class_idx)
        x_theta, epsilon_theta = diffusion.step_update(
            cfg, prediction, fake, epsilon_theta, t
        )
        return (x_theta, epsilon_theta), None

    ts = jnp.arange(1, cfg.steps + 1)  # ascending (reference train.py:369)
    (x_theta, epsilon_theta), _ = lax.scan(body, (image, image), ts)
    return x_theta, epsilon_theta


def apply_edit(name: str, epsilon_theta, dictionary=None):
    """ONE noise-space edit (reference train.py:418-430) — the single
    definition shared by the eval program's edit_noise and the user-facing
    edit_image API, so the two surfaces cannot drift."""
    if name == "pixelate":
        return image_ops.upsample_nearest(image_ops.avg_pool(epsilon_theta, 4), 4)
    if name == "shift":
        return image_ops.roll2d(epsilon_theta, 1, 1)
    if name == "quantise":
        return image_ops.vq_quantise(epsilon_theta, dictionary)
    raise ValueError(f"unknown edit {name!r}")


def edit_noise(cfg, epsilon_theta, dictionary, extra_noise):
    """Noise-space edits + batch assembly (reference train.py:415-437).

    Returns the (2 + 4·B)-image batch: [2 pure-noise draws, ε̂, pixelated,
    shifted, VQ-quantised]."""
    fake = jnp.concatenate(
        [epsilon_theta]
        + [apply_edit(n, epsilon_theta, dictionary)
           for n in ("pixelate", "shift", "quantise")],
        0,
    )
    return jnp.concatenate([extra_noise, fake], 0)


class SampleResult(NamedTuple):
    images: jnp.ndarray  # final x̂ batch
    snapshots: jnp.ndarray  # (4, B, H, W, C) at t = T, 3T/4, T/2, T/4


def sample(cfg, params, init_batch, class_idx=None,
           snapshots: bool = True) -> SampleResult:
    """Reverse diffusion t = T…1 with intermediate snapshots
    (reference train.py:439-496). ``init_batch`` seeds both x̂ and ε̂
    (train.py:436-437).

    ``cfg.sample_stride`` > 1 visits only every stride-th timestep
    (T, T−s, …) — DDIM-style subset sampling, valid because each update is
    the deterministic (x̂, ε̂) re-estimate at an arbitrary t; stride 1 is
    the exact reference loop. Denoiser calls drop from T to ⌈T/s⌉.

    ``snapshots=False`` drops the (4, B, H, W, C) snapshot buffer from the
    scan carry (``.snaps`` is None): it is part of the loop state, so XLA
    cannot dead-code it for callers that only read ``.images`` — serving
    and quality-metric samplers were paying 4× the sample batch in HBM plus
    a masked select per step for values they discarded (review r4)."""
    T = cfg.steps

    def step(x_theta, epsilon_theta, t):
        tf_ = t.astype(jnp.float32)
        fake = diffusion.renoise(cfg, x_theta, epsilon_theta, tf_)
        prediction = _denoise_call(cfg, params, fake, tf_, class_idx)
        return diffusion.step_update(
            cfg, prediction, fake, epsilon_theta, tf_
        )

    ts = jnp.asarray(sample_timesteps(cfg))
    if not snapshots:
        def body_fast(carry, t):
            return step(*carry, t), None

        (x_theta, _), _ = lax.scan(body_fast, (init_batch, init_batch), ts)
        return SampleResult(x_theta, None)

    # Snapshot x̂ at the four reference timesteps (train.py:488-495); with a
    # stride, map each to the nearest VISITED timestep at or below it (the
    # lowest visited one when none is below — large strides must still fill
    # every snapshot slot). Static computation: the hit test stays exact.
    visited = [int(t) for t in sample_timesteps(cfg)]
    def nearest(s):
        below = [v for v in visited if v <= s]
        return max(below) if below else visited[-1]
    snap_ts = jnp.asarray(
        [nearest(s) for s in (T, 3 * T // 4, 2 * T // 4, T // 4)]
    )

    def body(carry, t):
        x_theta, epsilon_theta, snaps = carry
        x_theta, epsilon_theta = step(x_theta, epsilon_theta, t)
        hit = snap_ts == t
        snaps = jnp.where(hit[:, None, None, None, None], x_theta[None], snaps)
        return (x_theta, epsilon_theta, snaps), None

    snaps0 = jnp.zeros((4,) + init_batch.shape, jnp.float32)
    (x_theta, _, snaps), _ = lax.scan(body, (init_batch, init_batch, snaps0), ts)
    return SampleResult(x_theta, snaps)


def make_segment_fn(cfg, class_idx=None, mesh=None):
    """Jitted partial reverse-diffusion: advance (x̂, ε̂) over an explicit
    ``ts`` array (traced, so one compile serves every segment of the same
    length). Enables streaming intermediate states (serve/server.py).

    ``mesh``: constrain the (x̂, ε̂) batch to the mesh's data axis so the
    segment runs data-parallel (the caller pads the batch to a multiple of
    the data extent — serve/server._pad_bucket)."""

    @jax.jit
    def seg(params, x_theta, epsilon_theta, ts):
        if mesh is not None and mesh.size > 1:
            from ..parallel import mesh as mesh_lib

            x_theta, _ = mesh_lib.shard_sample_batch(x_theta, mesh)
            epsilon_theta, _ = mesh_lib.shard_sample_batch(epsilon_theta, mesh)
        def body(carry, t):
            x_theta, epsilon_theta = carry
            tf_ = t.astype(jnp.float32)
            fake = diffusion.renoise(cfg, x_theta, epsilon_theta, tf_)
            prediction = _denoise_call(cfg, params, fake, tf_, class_idx)
            x_theta, epsilon_theta = diffusion.step_update(
                cfg, prediction, fake, epsilon_theta, tf_
            )
            return (x_theta, epsilon_theta), None

        (x_theta, epsilon_theta), _ = lax.scan(
            body, (x_theta, epsilon_theta), ts
        )
        return x_theta, epsilon_theta

    return seg


def sample_stream(cfg, params, init_batch, segments: int = 4, class_idx=None):
    """Generator over intermediate x̂ states of the reverse diffusion:
    yields ``segments`` arrays, the last being the final sample batch
    (value-identical to ``sample(...).images``, including under
    ``cfg.sample_stride`` — both draw their schedule from
    ``sample_timesteps``)."""
    import numpy as np

    seg = make_segment_fn(cfg, class_idx)
    ts_all = sample_timesteps(cfg)
    # clamp: more segments than timesteps is meaningless, and array_split's
    # output is sized by this count (caller-controlled in serving)
    segments = min(max(int(segments), 1), len(ts_all))
    x_theta = epsilon_theta = init_batch
    for ts in np.array_split(ts_all, segments):
        if len(ts) == 0:
            continue
        x_theta, epsilon_theta = seg(
            params, x_theta, epsilon_theta, jnp.asarray(ts)
        )
        yield np.asarray(x_theta)


def edit_image(cfg, params, image, edits=("pixelate", "shift", "quantise"),
               dictionary=None, rng=None, class_idx=None):
    """The reference's signature workflow as a user-facing API: invert a real
    image to its noise estimate, apply noise-space edits, and decode each
    edited noise back through reverse diffusion (reference train.py:364-496 —
    the mechanism by which class/style transfer was intended to work).

    image: (B, H, W, 3) in [-1, 1) (the reference runs B=1). Returns dict:
    edit name → (B, H, W, 3) decoded image (plus "reconstruction" for the
    unedited noise).
    """
    unknown = [e for e in edits if e not in ("pixelate", "shift", "quantise")]
    if unknown:
        # reject up front — silently dropping a misspelled edit would pay
        # the full T-step inversion and return an incomplete dict
        raise ValueError(
            f"unknown edits {unknown}; valid: pixelate, shift, quantise"
        )
    if dictionary is None:
        if rng is None:
            rng = jax.random.PRNGKey(cfg.seed)
        dictionary = jax.random.normal(
            rng, (cfg.size, cfg.size, 2**cfg.bits_per_pixel, 3), jnp.float32
        )
    B = image.shape[0]
    _, epsilon_theta = invert(cfg, params, image, class_idx)
    candidates = {"reconstruction": epsilon_theta}
    for name in ("pixelate", "shift", "quantise"):
        if name in edits:
            candidates[name] = apply_edit(name, epsilon_theta, dictionary)
    names = list(candidates)
    batch = jnp.concatenate([candidates[n] for n in names], 0)
    if class_idx is not None:
        # the decode stage runs all candidates as one batch, laid out in
        # blocks of B; each input image's class applies to its candidates
        class_idx = jnp.tile(jnp.reshape(class_idx, (-1,))[:B], len(names))
    decoded = sample(cfg, params, batch, class_idx, snapshots=False).images
    # candidate blocks, NOT rows — decoded[i:i+1] on a B>1 batch returned
    # rows of the wrong candidate (review r4)
    return {n: decoded[i * B : (i + 1) * B] for i, n in enumerate(names)}


def make_eval_fn(cfg):
    """Build the full jitted eval program: preview + invert + edits + sample.

    Returns ``eval_fn(params, example_image, noise_bank, dictionary)`` →
    dict of arrays matching the reference's TensorBoard artifacts
    (tags: denoised, example loss, step_1/0.75/0.5/0.25, fake).

    Batched: ``example_image`` may be (B, H, W, 3) for any B — the reference
    runs this at B=1 (train.py:305) but every stage here is batch-general,
    so multi-image eval costs one program instead of B (VERDICT r1 next #6).
    The sampler stage then runs on a (2 + 4·B)-image batch."""

    def eval_fn(params, example_image, noise_bank, dictionary):
        preview_noise = jnp.broadcast_to(noise_bank[:1], example_image.shape)
        denoised, rmse = preview(cfg, params, example_image, preview_noise)
        x_theta, epsilon_theta = invert(cfg, params, example_image)
        batch = edit_noise(cfg, epsilon_theta, dictionary, noise_bank)
        result = sample(cfg, params, batch)
        return {
            "denoised": denoised,
            "example_loss": rmse,
            "fake": result.images,
            "step_1": result.snapshots[0],
            "step_0.75": result.snapshots[1],
            "step_0.5": result.snapshots[2],
            "step_0.25": result.snapshots[3],
        }

    return jax.jit(eval_fn)
