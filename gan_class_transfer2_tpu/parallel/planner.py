"""Parallelism planner: pick a mesh for a workload (``gct2 plan``).

The reference is single-device by construction (reference train.py:40 pins
one GPU; SURVEY §2.3's absence table) — scaling a run is entirely the
user's problem. On TPU the scaling recipe is: pick a mesh, annotate
shardings, let XLA insert the collectives. This module automates the *pick*
step: given a workload Config and a chip budget, it enumerates the
parallelism strategies this framework implements (DP, DP+ZeRO-1, TP,
pipeline over octave bands, spatial sharding), models per-chip memory and
expected throughput for each, and recommends concrete Config overrides.

Everything here is analytic — ``jax.eval_shape`` for exact parameter
shapes, closed-form activation/MAC models — so planning needs no devices
and costs no FLOPs. The models are calibrated against measured numbers in
BASELINE_MEASURED.md rather than guessed:

* throughput: a measured (size × batch) grid of img/s/chip at 64²–1024²
  on TPU v5e (tools/bench_grid.py), interpolated in log2(size) ×
  log2(batch) and validated at held-out points (tools/validate_planner.py);
* the activation-memory constant is fitted at the measured 512² b64 XLA
  ``memory_analysis`` row (14.2 GB) and validated at 1024² b16;
* PP bubble/boundary models are the ones validated on-chip ("Pipeline
  parallelism: the performance story");
* lever costs: bf16 moment storage is free (measured), remat costs ~20%
  step time and did NOT lower the measured peak at ≤512² b64 (XLA's
  scheduler already bounds liveness) — so remat is reported, not chosen.

Predictions are first-order (±20%); strategies with no measured cost model
on this stack (TP activation collectives, spatial halo exchange on a real
mesh) are reported with ``pred_img_s=None`` and an explicit note instead
of an invented number.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Optional

import numpy as np

# --------------------------------------------------------------- constants

HBM_GB_V5E = 16.0
BUDGET_FRAC = 0.75  # leave headroom for XLA workspaces / fragmentation

# Measured single-chip training throughput grid (TPU v5e, bf16, fused
# diffusion, lax convs, 32 MiB scoped VMEM — tools/bench_grid.py;
# methodology in BASELINE_MEASURED.md). Per-size batch ladders of
# img/s/chip at the default channel widths (octaves=4 at 64², 6 elsewhere).
# An earlier model transferred ONE 256² batch-efficiency curve across sizes
# by work-equivalent batch; chip measurement showed that misses 64² by −47%
# (tools/validate_planner.py), so the grid holds real ladders per size.
MEASURED_GRID = {
    64: ((32, 6283.4), (64, 9806.8), (96, 12391.4), (128, 14180.8),
         (256, 17506.0), (512, 19485.8)),
    128: ((32, 2408.6), (64, 3147.3), (128, 4211.3), (192, 4236.2),
          (256, 4575.1)),
    256: ((16, 720.9), (32, 814.9), (40, 836.4), (64, 883.1),
          (128, 1209.3), (192, 1147.1), (256, 1236.5)),
    512: ((8, 185.9), (16, 210.0), (24, 222.0), (32, 225.0), (64, 220.0)),
    1024: ((8, 51.3), (16, 53.3)),
}

# Fitted at the measured 512² b64 row: XLA memory_analysis temp+args
# 14.2 GB − 0.67 GB model state = 211.4 MB/img of activations+workspace
# vs the analytic 98.1 MB/img of saved conv outputs → ×2.155. Validated
# at 1024² b16 (predicts 14.0 GB vs 15.8 measured, −11%) — treat every
# activation figure as ±20%.
ACT_CALIB = 2.155

REMAT_NOTE = (
    "remat is NOT offered as a memory lever: measured at 512² b64 it did "
    "not lower XLA's peak (15.17 vs 14.2 GB) and costs ~20% step time "
    "(BASELINE_MEASURED.md memory frontier)"
)

# Measured cycle-GAN step-cost model, in units of the diffusion train step
# at the SAME (size, per-class batch). Anchors (TPU v5e, 256² b16/class,
# BASELINE_MEASURED "GAN-mode step" + "zero-weight term elision"): full
# cycle GAN 125.2 img/s/class, identity off 151.5, pure adversarial 261.4,
# against the diffusion grid's 720.9 at 256² b16 → step-time ratios
# 5.758 / 4.758 / 2.758. The three anchors decompose exactly as
# base + cycle + identity (the compiled step elides zero-weight terms, so
# cost is config-dependent — train/gan.py). Held-out check: the 32² b64
# full-GAN runs measured 1100-1400 img/s/class (tools/measure_fid_steps
# campaigns), bracketing this model's prediction at that point.
GAN_STEP_COST = {"base": 2.758, "cycle": 2.0, "identity": 1.0}


def gan_step_cost_ratio(cfg) -> float:
    """Cycle-GAN step time ÷ diffusion step time at equal (size, batch)."""
    return (
        GAN_STEP_COST["base"]
        + (GAN_STEP_COST["cycle"] if cfg.cycle_term_active else 0.0)
        + (GAN_STEP_COST["identity"] if cfg.identity_term_active else 0.0)
    )


# ---------------------------------------------------------- memory models


def abstract_params(cfg):
    """Exact parameter ShapeDtypeStructs via eval_shape (no FLOPs).

    The key is passed abstractly too, so planning never initialises a
    backend — ``gct2 plan`` works with the TPU tunnel down."""
    import jax
    import jax.numpy as jnp

    from ..models import unet

    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return jax.eval_shape(lambda r: unet.init_unet(r, cfg), key)


def _leaf_bytes(leaf) -> int:
    return int(np.prod(leaf.shape)) * leaf.dtype.itemsize


def param_bytes(tree) -> int:
    import jax

    return sum(_leaf_bytes(l) for l in jax.tree_util.tree_leaves(tree))


@dataclasses.dataclass
class _AbstractMesh:
    """Duck-typed stand-in so mesh.py's real sharding rules run without
    devices — the planner must model the EXACT rules the runtime applies."""

    shape: dict


def _spec_divisor(spec, axis_sizes: dict) -> int:
    """How many ways a PartitionSpec splits a leaf."""
    div = 1
    for entry in spec:
        if entry is None:
            continue
        for ax in (entry if isinstance(entry, tuple) else (entry,)):
            div *= axis_sizes.get(ax, 1)
    return div


def tp_param_bytes_per_chip(tree, model: int) -> int:
    """Per-chip parameter bytes under the TP rule (mesh._leaf_spec)."""
    import jax

    from . import mesh as mesh_lib

    sizes = {"model": model}
    return sum(
        _leaf_bytes(l) // _spec_divisor(mesh_lib._leaf_spec(l, model), sizes)
        for l in jax.tree_util.tree_leaves(tree)
    )


def zero1_moment_bytes_per_chip(
    tree, data: int, model: int, moment_dtype: str
) -> int:
    """Per-chip Adam moment bytes (2 moments) under mesh._zero1_spec."""
    import jax

    from . import mesh as mesh_lib

    fake = _AbstractMesh(shape={"data": data, "model": model})
    sizes = {"data": data, "model": model}
    itemsize = 2 if moment_dtype == "bfloat16" else 4
    total = 0
    for l in jax.tree_util.tree_leaves(tree):
        spec = mesh_lib._zero1_spec(l, fake)
        total += (
            int(np.prod(l.shape)) * itemsize // _spec_divisor(spec, sizes)
        )
    return 2 * total


def model_state_bytes_per_chip(
    p_bytes_chip: int,
    n_param_elems_chip: float,
    *,
    zero1_data: int = 1,
    moment_dtype: str = "float32",
    moment_bytes_chip: Optional[int] = None,
    ema: bool = False,
) -> float:
    """Steady per-chip model state: fp32 params + fp32 grads (live at the
    update) + 2 Adam moments (optionally ZeRO-1-sharded / bf16)."""
    if moment_bytes_chip is None:
        mb = 2 if moment_dtype == "bfloat16" else 4
        moment_bytes_chip = 2 * n_param_elems_chip * mb / zero1_data
    state = p_bytes_chip + p_bytes_chip + moment_bytes_chip
    if ema:
        state += p_bytes_chip
    return float(state)


def act_elems_per_image(cfg) -> int:
    """Saved-activation elements per image: every down/up conv output plus
    the input and head output (SURVEY §2.2's topology). Multiplied by
    ACT_CALIB to cover cotangents and XLA workspaces."""
    total = 2 * cfg.size**2 * 3
    for i in range(cfg.octaves):
        sp_down = (cfg.size >> (i + 1)) ** 2
        total += sp_down * cfg.octave_filters(i)
        total += (cfg.size >> i) ** 2 * cfg.octave_up_filters(i)
        if cfg.block_depth:
            total += 2 * cfg.block_depth * sp_down * cfg.octave_filters(i)
    return total


def act_bytes(cfg, local_batch: float, spatial_ways: int = 1) -> float:
    dtype_bytes = 2 if cfg.compute_dtype in ("bfloat16", "float16") else 4
    return (
        ACT_CALIB
        * act_elems_per_image(cfg)
        * dtype_bytes
        * local_batch
        / spatial_ways
    )


# ------------------------------------------------- pipeline (PP) models
# Canonical copies of the MAC/boundary/time models validated in
# BASELINE_MEASURED.md "Pipeline parallelism: the performance story";
# tools/pp_analysis.py imports these.


def channels(cfg, i):
    """(f_i, u_i) — down/up conv out-channels at octave i (SURVEY §2.2)."""
    return cfg.octave_filters(i), cfg.octave_up_filters(i)


def conv_macs(cfg):
    """Per-image MACs of every conv, attributed to octaves (down, up, head).

    down_i: 4×4/s2 conv f_{i-1} (or 3) → f_i at (size/2^{i+1})² output;
    up_i: 4×4/s2 convT (u_{i+1}+f_i, or f_i at the innermost) → u_i at
    (size/2^i)² output; head: dense (u_0+3) → 3 at size². block_depth > 0
    adds 3×3 convs at both ends of each octave."""
    down, up = [], []
    for i in range(cfg.octaves):
        f_in = 3 if i == 0 else channels(cfg, i - 1)[0]
        f_i, u_i = channels(cfg, i)
        sp_down = (cfg.size // 2 ** (i + 1)) ** 2
        d = sp_down * 16 * f_in * f_i
        if i == cfg.octaves - 1:
            up_in = f_i
        else:
            up_in = channels(cfg, i + 1)[1] + f_i
        sp_up = (cfg.size // 2**i) ** 2
        u = sp_up * 4 * up_in * u_i
        if cfg.block_depth > 0:
            blk = cfg.block_depth * sp_down * 9 * f_i * f_i
            d += blk
            u += blk
        down.append(d)
        up.append(u)
    head = cfg.size**2 * (channels(cfg, 0)[1] + 3) * 3
    return down, up, head


def stage_work(cfg, plan):
    """Per-device (w_down, w_up) MACs per image under a stage plan.

    Device s owns octave band [a, b); stage 0's up stage also owns the
    head; the last device fuses band+middle into one virtual stage."""
    down, up, head = conv_macs(cfg)
    out = []
    for s, (a, b) in enumerate(plan):
        w_d = sum(down[a:b])
        w_u = sum(up[a:b])
        if s == 0:
            w_u += head
        if s == len(plan) - 1:
            mid = (
                cfg.block_depth
                * (cfg.size // 2**cfg.octaves) ** 2
                * 9
                * channels(cfg, cfg.octaves - 1)[0] ** 2
            )
            out.append((w_d + w_u + mid, 0.0))
        else:
            out.append((w_d, w_u))
    return out


def boundary_bytes(cfg, plan, micro_batch, dtype_bytes=2):
    """Bytes PP ships across each stage boundary per microbatch
    (forward activations + backward cotangents)."""
    per_boundary = []
    for s in range(len(plan) - 1):
        k = plan[s][1]
        sp = (cfg.size // 2**k) ** 2
        f_prev = channels(cfg, k - 1)[0]
        u_k = channels(cfg, k)[1]
        fwd = micro_batch * sp * (f_prev + u_k) * dtype_bytes
        per_boundary.append(2 * fwd)
    return per_boundary


def pp_times(work, n_micro):
    """(t_pp, t_ideal, bubble) in MAC units from per-device (w_d, w_u)."""
    w_dev = [d + u for d, u in work]
    taus = (
        [d for d, _ in work[:-1]]
        + [work[-1][0]]
        + [u for _, u in reversed(work[:-1])]
    )
    t_pp = (n_micro - 1) * max(w_dev) + sum(taus)
    t_ideal = n_micro * sum(w_dev) / len(work)
    return t_pp, t_ideal, 1 - t_ideal / t_pp


def pp_stage_act_elems(cfg, plan, s) -> int:
    """Saved-activation elements per image for stage s's octave band."""
    a, b = plan[s]
    total = 0
    for i in range(a, b):
        total += (cfg.size >> (i + 1)) ** 2 * cfg.octave_filters(i)
        total += (cfg.size >> i) ** 2 * cfg.octave_up_filters(i)
        if cfg.block_depth:
            total += (
                2 * cfg.block_depth
                * (cfg.size >> (i + 1)) ** 2
                * cfg.octave_filters(i)
            )
    if s == 0:
        total += 2 * cfg.size**2 * 3
    return total


# ---------------------------------------------------- throughput model


def _flops_per_image_train(cfg) -> float:
    from ..utils import benchmark as bench_lib

    return 3.0 * bench_lib.model_flops_per_image(cfg)


def _grid_cfg(size: int):
    """The Config the grid was measured at (default widths)."""
    from ..config import Config

    return Config(
        size=size, octaves=4 if size == 64 else 6,
        compute_dtype="bfloat16", checkpoint_dir=None,
    )


def _ladder_ips(size: int, batch: float) -> float:
    """Interpolate a measured size's batch ladder in log2(batch).

    Clamps at the ladder ends: beyond the largest measured batch the
    ladders are flat (measured), below the smallest the prediction is
    optimistic — small launches only matter for ranking PP microbatching,
    where relative order survives the clamp."""
    ladder = MEASURED_GRID[size]
    xs = [math.log2(b) for b, _ in ladder]
    ys = [v for _, v in ladder]
    return float(np.interp(math.log2(max(batch, 1.0)), xs, ys))


def predict_ips_per_chip(cfg, local_batch: float) -> float:
    """First-order per-chip img/s at this size and local batch.

    For each measured size, evaluate its ladder at the WORK-EQUIVALENT
    batch (conserving per-step conv work: b·size²), convert to achieved
    model-TFLOP/s through that size's own FLOP count, interpolate across
    sizes in log2(size), and convert back through ``cfg``'s FLOP count. At
    a measured (size, batch) grid point this reduces to the measurement
    itself (pinned by test); held-out-point validation measured ≤14% error
    (tools/validate_planner.py, BASELINE_MEASURED.md).

    A per-chip batch that is not a multiple of 8 pads to the next sublane
    multiple and throws the padded fraction away — measured: 1024² b12 runs
    at the b16 rate × 12/16 (38.8 vs 53.3 img/s), 256² b36 at the b40 rate
    × 36/40 (748 vs 836) — so the model evaluates at the padded batch and
    scales down (held-out b40 then predicts to 0.06%).

    The grid is bf16 (the supported fast path). fp32 convs take the MXU's
    multi-pass path; the ×1/3 factor is an ASSUMPTION, not a measurement —
    plan production runs in bf16."""
    from ..utils import benchmark as bench_lib

    padded = max(math.ceil(local_batch / 8) * 8, 8)
    waste = local_batch / padded if local_batch >= 1 else 1.0
    if local_batch >= 1:
        local_batch = padded

    pts = []
    for s in sorted(MEASURED_GRID):
        b_eq = local_batch * (cfg.size / s) ** 2
        fl = 3.0 * bench_lib.model_flops_per_image(_grid_cfg(s))
        pts.append((math.log2(s), _ladder_ips(s, b_eq) * fl / 1e12))
    tflops = float(
        np.interp(math.log2(cfg.size), [p[0] for p in pts],
                  [p[1] for p in pts])
    )
    ips = waste * tflops * 1e12 / _flops_per_image_train(cfg)
    if cfg.compute_dtype == "float32":
        ips /= 3.0
    return ips


def _knee_batch(cfg) -> int:
    """Smallest power-of-two per-chip batch whose predicted throughput is
    ≥95% of the flat ceiling (the measured ladders saturate)."""
    ceiling = 0.95 * predict_ips_per_chip(cfg, 1 << 20)
    b = 1
    while b < (1 << 20) and predict_ips_per_chip(cfg, b) < ceiling:
        b *= 2
    return b


# ----------------------------------------------------- GAN-mode workloads


def _gan_generator_passes(cfg, model: str) -> int:
    """Gradient-traversed generator (U-Net) applications per G step.

    Mirrors train/gan.gan_train_step and conditional_gan_train_step:
    zero-weight loss terms are elided from the compiled program, so the
    pass count is config-dependent. The discriminator's activations are
    excluded (measured small next to the U-Net's)."""
    extra = (1 if cfg.cycle_term_active else 0) + (
        1 if cfg.identity_term_active else 0
    )
    per_direction = 1 + extra
    return 2 * per_direction if model == "gan" else per_direction


def _abstract_gan_state(cfg, model: str):
    """Exact GANState / ConditionalGANState ShapeDtypeStructs (no FLOPs)."""
    import jax
    import jax.numpy as jnp

    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    if model == "gan":
        from ..train import gan as gan_lib

        return jax.eval_shape(lambda r: gan_lib.init_gan_state(cfg, r), key)
    from ..train import conditional_gan as cgan_lib

    return jax.eval_shape(
        lambda r: cgan_lib.init_conditional_gan_state(cfg, r), key
    )


def _plan_gan(cfg, model: str, n_chips: int, hbm_gb: float,
              budget_frac: float) -> dict:
    """DP candidates for the GAN-mode trainers.

    The GAN steps scale over the mesh via the same batch sharding as the
    diffusion step (mesh.make_parallel_gan_train_step); pipeline/TP/spatial
    enumeration is diffusion-specific, so GAN planning covers DP with the
    bf16-moment and ZeRO-1 levers. State bytes are EXACT (eval_shape of the
    real init, params + both optimizers + EMA); activations are the
    diffusion activation model × the generator pass count (cycle/identity
    terms each add a full U-Net pass per direction — train/gan.py) with the
    discriminator excluded. Throughput for model="gan" comes from the
    diffusion grid divided by the measured GAN_STEP_COST ratio (img/s per
    class); cgan has no measured anchors and stays ``pred_img_s=None``."""
    import jax

    cfg = cfg.validate()
    budget = hbm_gb * 1024**3 * budget_frac
    passes = _gan_generator_passes(cfg, model)
    g_fields = (
        ("g_ab", "g_ba", "d_a", "d_b") if model == "gan"
        else ("generator", "discriminator")
    )

    def state_bytes(mdt: str, zero1_ways: int) -> int:
        c = cfg
        if mdt != c.moment_dtype:
            c = c.replace(
                moment_dtype=mdt,
                optimizer=c.optimizer
                if c.optimizer in ("adam_tf", "adam_fused") else "adam_tf",
            )
        tree = _abstract_gan_state(c, model)
        # params + both opt states + EMA, exactly as init builds them
        total = param_bytes(tree)
        # moments shard over the data axis under ZeRO-1 (mesh._zero1_spec
        # applies to every opt-state leaf); first-order: divide opt bytes
        opt = param_bytes(tree.g_opt) + param_bytes(tree.d_opt)
        total -= opt - opt // zero1_ways
        # gradients for every trained tree are live at the update
        total += sum(param_bytes(getattr(tree, f)) for f in g_fields)
        return total

    candidates = []
    B = cfg.batch_size
    if B % n_chips == 0 or n_chips == 1:
        b_local = B / n_chips

        def act_fn(accum):
            # accum is never engaged (allow_accum=False below): the GAN
            # runners' effective-batch semantics under MultiSteps are
            # unvalidated, so the planner does not recommend it
            return act_bytes(cfg, b_local) * passes

        ov, state, act, lever_note = _auto_levers(
            cfg, n_chips, n_chips, state_bytes, act_fn, budget,
            allow_accum=False,
        )
        overrides = {"mesh_data": n_chips, "mesh_model": 1, **ov}
        note = f"{passes} generator passes/step (cycle/identity terms)"
        if lever_note:
            note += "; " + lever_note
        fits = state + act <= budget
        ips = None
        if fits and model == "gan":
            # measured step-cost model (GAN_STEP_COST): diffusion-grid
            # throughput at the per-class batch ÷ the anchored cost ratio.
            # Units: img/s PER CLASS (each step also processes the other
            # class's batch). cgan stays unpredicted — no measured anchors.
            ratio = gan_step_cost_ratio(cfg)
            ips = predict_ips_per_chip(cfg, b_local) / ratio * n_chips
            note += (
                f"; pred is img/s per class (measured step-cost ratio "
                f"{ratio:.2f}× the diffusion step)"
            )
        candidates.append(Candidate(
            "DP", overrides, state / 1e9, act / 1e9,
            fits, ips, None, note,
        ))
    else:
        candidates.append(Candidate(
            "DP", {"mesh_data": n_chips}, 0, 0, False, None, None,
            f"batch_size={B} not divisible by {n_chips} chips",
        ))

    chosen = candidates[0] if candidates and candidates[0].fits else None
    flags = " ".join(
        f"--{k.replace('_', '-')} {v}"
        for k, v in (chosen.overrides.items() if chosen else ())
    )
    tree = _abstract_gan_state(cfg, model)
    n_params = sum(
        int(np.prod(l.shape))
        for f in g_fields
        for l in jax.tree_util.tree_leaves(getattr(tree, f))
    )
    return {
        "workload": {
            "model": model,
            "size": cfg.size,
            "batch_size": B,
            "params_m": round(n_params / 1e6, 1),
            "compute_dtype": cfg.compute_dtype,
            "generator_passes": passes,
        },
        "chips": n_chips,
        "slices": 1,
        "hbm_gb": hbm_gb,
        "budget_gb": round(budget / 1e9, 2),
        "candidates": [c.to_dict() for c in candidates],
        "chosen": chosen.name if chosen else None,
        "overrides": chosen.overrides if chosen else {},
        "cli_flags": flags,
        "notes": [
            "GAN-mode planning covers DP (the supported mesh scaling for "
            "the GAN steps)",
            "gan throughput = diffusion grid ÷ measured step-cost ratio "
            "(GAN_STEP_COST anchors at 256² b16; validate with "
            "tools/validate_planner.py --gan); cgan has no measured "
            "anchors and stays unpredicted"
            if model == "gan"
            else "no cgan throughput prediction — no measured anchors "
            "(the GAN_STEP_COST ratios are cycle-GAN-specific)",
            "activation model = diffusion activations × generator passes, "
            "discriminator excluded (±30%)",
            REMAT_NOTE,
        ],
    }


# ------------------------------------------------------------ candidates


@dataclasses.dataclass
class Candidate:
    name: str
    overrides: dict
    state_gb: float
    act_gb: float
    fits: bool
    pred_img_s: Optional[float]  # total, all chips; None = unmeasured
    ici_mb_step: Optional[float]
    note: str = ""

    @property
    def total_gb(self) -> float:
        return self.state_gb + self.act_gb

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "overrides": self.overrides,
            "state_gb": round(self.state_gb, 2),
            "act_gb": round(self.act_gb, 2),
            "total_gb": round(self.total_gb, 2),
            "fits": self.fits,
            "pred_img_s": (
                round(self.pred_img_s, 1)
                if self.pred_img_s is not None
                else None
            ),
            "ici_mb_step": (
                round(self.ici_mb_step, 1)
                if self.ici_mb_step is not None
                else None
            ),
            "note": self.note,
        }


def _divisors(n: int):
    return [d for d in range(1, n + 1) if n % d == 0]


def _auto_levers(cfg, zero1_ways, dp_total, state_fn, act_fn, budget,
                 allow_accum=True):
    """Engage the measured-free memory levers until the candidate fits.

    Order: bf16 moments (free — measured) → ZeRO-1 (shards the moments,
    keeps the per-launch batch) → grad_accum. grad_accum's overrides
    REDUCE ``batch_size`` to B/accum alongside ``grad_accum=accum``: the
    runtime's optax.MultiSteps micro-steps at the FULL configured
    batch_size and is "equivalent to an N×batch_size step"
    (train/trainer.py), so keeping batch_size at B would neither shrink
    activations nor preserve the recipe. ZeRO-1 and grad_accum are
    mutually exclusive (Config.validate), so the planner picks whichever
    fits — preferring ZeRO-1, which keeps the per-launch batch on the
    MXU's good side. A grad_accum that does not produce a fit is never
    recorded. Returns (overrides, state_bytes, act_bytes, note)."""
    overrides: dict = {}
    notes = []
    mdt = cfg.moment_dtype
    z0 = zero1_ways if cfg.zero1 else 1
    state = state_fn(mdt, z0)
    act = act_fn(1)
    if state + act > budget and mdt != "bfloat16":
        mdt = "bfloat16"
        overrides["moment_dtype"] = "bfloat16"
        overrides["optimizer"] = (
            cfg.optimizer
            if cfg.optimizer in ("adam_tf", "adam_fused")
            else "adam_tf"
        )
        state = state_fn(mdt, z0)
        notes.append("bf16 moments (free — measured)")
    if state + act <= budget:
        return overrides, state, act, "; ".join(notes)

    z_state = state_fn(mdt, zero1_ways) if zero1_ways > 1 else state
    can_zero1 = zero1_ways > 1 and not cfg.zero1 and cfg.grad_accum == 1
    if can_zero1 and z_state + act <= budget:
        overrides["zero1"] = True
        notes.append("ZeRO-1 moments over data axis")
        return overrides, z_state, act, "; ".join(notes)

    if allow_accum and cfg.grad_accum == 1 and not cfg.zero1:
        B = cfg.batch_size
        b_local = B // max(dp_total, 1)
        accum = 2
        while accum <= min(64, b_local):
            if b_local % accum == 0 and state + act_fn(accum) <= budget:
                overrides["grad_accum"] = accum
                overrides["batch_size"] = B // accum
                notes.append(
                    f"grad_accum={accum} with batch_size {B // accum} "
                    f"(micro-step batch {b_local // accum}/chip; effective "
                    f"batch stays {B})"
                )
                return overrides, state, act_fn(accum), "; ".join(notes)
            accum *= 2

    if can_zero1 and z_state < state:
        # does not reach a fit, but strictly reduces state — report it
        overrides["zero1"] = True
        notes.append("ZeRO-1 moments over data axis (still does not fit)")
        state = z_state
    return overrides, state, act, "; ".join(notes)


def plan(cfg, n_chips: int, hbm_gb: float = HBM_GB_V5E,
         budget_frac: float = BUDGET_FRAC, model: str = "diffusion") -> dict:
    """Enumerate and rank parallelism strategies for ``cfg`` on ``n_chips``.

    Returns a JSON-ready dict: workload summary, every candidate with its
    memory/throughput model, the chosen strategy's Config overrides and CLI
    flags, and the planner's caveats. ``model``: "diffusion" (the full
    enumeration) or "gan"/"cgan" (DP with exact state trees — see
    ``_plan_gan``)."""
    import jax  # noqa: F401  (eval_shape via abstract_params)

    if model in ("gan", "cgan"):
        return _plan_gan(cfg, model, n_chips, hbm_gb, budget_frac)
    if model != "diffusion":
        raise ValueError(f"unknown model {model!r}")
    cfg = cfg.validate()
    tree = abstract_params(cfg)
    p_bytes = param_bytes(tree)
    n_params = p_bytes / 4
    budget = hbm_gb * 1024**3 * budget_frac
    slices = max(getattr(cfg, "mesh_slice", 1), 1)
    if n_chips % slices:
        raise ValueError(f"n_chips={n_chips} not divisible by mesh_slice={slices}")
    per_slice = n_chips // slices
    B = cfg.batch_size

    candidates = []

    def add(c):
        candidates.append(c)

    # ---- pure DP (optionally with the auto levers) ----
    dp_total = n_chips  # slice × data both carry batch
    if B % dp_total == 0 or dp_total == 1:
        b_local = B / dp_total

        def state_fn(mdt, z):
            return model_state_bytes_per_chip(
                p_bytes,
                n_params,
                moment_bytes_chip=zero1_moment_bytes_per_chip(
                    tree, per_slice, 1, mdt
                )
                if z > 1
                else None,
                moment_dtype=mdt,
                ema=cfg.ema_decay > 0,
            )

        def act_fn(accum):
            return act_bytes(cfg, b_local / accum)

        ov, state, act, lever_note = _auto_levers(
            cfg, per_slice, dp_total, state_fn, act_fn, budget
        )
        fits = state + act <= budget
        ips = None
        if fits:
            eff_batch = b_local / ov.get("grad_accum", 1)
            per_chip = predict_ips_per_chip(cfg, eff_batch)
            ips = per_chip * n_chips
            if eff_batch >= 1 and eff_batch % 8:
                pad = math.ceil(eff_batch / 8) * 8
                lever_note = (lever_note + "; " if lever_note else "") + (
                    f"per-chip batch {eff_batch:g} pads to {pad} on the "
                    f"sublane dim ({1 - eff_batch / pad:.0%} of each step "
                    f"is padding) — round the global batch to a multiple "
                    f"of {8 * dp_total}"
                )
            eff = per_chip / predict_ips_per_chip(cfg, 1 << 20)
            if eff < 0.95:
                knee = _knee_batch(cfg) * dp_total
                lever_note = (lever_note + "; " if lever_note else "") + (
                    f"per-chip batch {eff_batch:g} is below the measured "
                    f"knee — global batch ≥{knee} would buy "
                    f"~{(1 / eff - 1):.0%} more throughput if the recipe "
                    "tolerates it"
                )
        # ring all-reduce of bf16 grads over the data axis
        ici = 2 * (dp_total - 1) / dp_total * n_params * 2 / 1e6
        name = "DP" + (f"×{slices}slices" if slices > 1 else "")
        ov = {"mesh_data": per_slice, "mesh_model": 1, **ov}
        if slices > 1:
            ov["mesh_slice"] = slices
        note = lever_note
        if slices > 1:
            note = (note + "; " if note else "") + (
                "cross-slice gradient partials ride DCN "
                "(hierarchical all-reduce)"
            )
        add(Candidate(name, ov, state / 1e9, act / 1e9, fits, ips, ici, note))
    else:
        add(Candidate(
            "DP", {"mesh_data": per_slice}, 0, 0, False, None, None,
            f"batch_size={B} not divisible by {dp_total} chips — "
            f"round batch to a multiple or use grad_accum",
        ))

    # ---- DP × TP ----
    for m in (2, 4, 8):
        if per_slice % m or slices > 1:
            continue
        dp = per_slice // m
        if dp < 1 or (B % dp and dp > 1):
            continue
        b_local = B / max(dp, 1)
        p_chip = tp_param_bytes_per_chip(tree, m)
        state = model_state_bytes_per_chip(
            p_chip, p_chip / 4, moment_dtype=cfg.moment_dtype,
            ema=cfg.ema_decay > 0,
        )
        act = act_bytes(cfg, b_local)  # activations replicated over model
        fits = state + act <= budget
        add(Candidate(
            f"DP{dp}×TP{m}",
            {"mesh_data": dp, "mesh_model": m},
            state / 1e9, act / 1e9, fits, None, None,
            "TP halves param memory per ×2 but adds per-layer activation "
            "collectives — unmeasured on this stack; prefer DP/PP unless "
            "params alone overflow",
        ))

    # ---- PP × DP ----
    from . import pipeline as pp
    for S in range(2, min(cfg.octaves, per_slice) + 1):
        if slices > 1:
            continue
        idle = 0
        if per_slice % S == 0:
            dp = per_slice // S
        else:
            dp, idle = 1, per_slice - S  # PP-only plan, leftover chips idle
        if B % max(dp, 1):
            continue
        b_local = B // max(dp, 1)
        # explicit pipeline_cuts pin exactly one stage count; for every
        # other S fall back to the MAC plan instead of crashing
        cuts = [c for c in (cfg.pipeline_cuts or "").split(",") if c]
        plan_cfg = cfg if len(cuts) + 1 == S else cfg.replace(pipeline_cuts="")
        plan_s = pp.plan_stages(plan_cfg, S)
        work = stage_work(cfg, plan_s)
        # microbatches: smallest divisor of the per-replica batch with <10%
        # bubble (more microbatches shrink the bubble but also the
        # per-launch conv batch); fall back to the bubble-minimising one
        ms = [d for d in _divisors(int(b_local)) if S <= d <= 32 * S]
        M = None
        for cand_m in ms:  # ascending: first under 10%, else the largest
            _, _, bub = pp_times(work, cand_m)
            M = cand_m
            if bub < 0.10:
                break
        if M is None:
            continue
        _, _, bubble = pp_times(work, M)
        micro_b = b_local // M
        stage_p = [
            param_bytes(pp.tree_stage_view(plan_s, tree, s))
            for s in range(S)
        ]
        worst = max(range(S), key=lambda s: stage_p[s])
        state = model_state_bytes_per_chip(
            stage_p[worst], stage_p[worst] / 4,
            moment_dtype=cfg.moment_dtype, ema=cfg.ema_decay > 0,
        )
        # live per chip: the schedule recomputes band activations in the
        # backward (parallel/pipeline.py), so only ONE microbatch's band
        # activations are live at a time, plus the stage's boundary inputs
        # buffered for every in-flight microbatch
        dtype_b = 2 if cfg.compute_dtype != "float32" else 4
        bb_per_micro = boundary_bytes(cfg, plan_s, micro_b, dtype_b)

        def stage_act(s):
            band = (
                ACT_CALIB
                * pp_stage_act_elems(cfg, plan_s, s)
                * dtype_b
                * micro_b
            )
            bufs = sum(
                bb_per_micro[j]
                for j in range(len(bb_per_micro))
                if j in (s - 1, s)
            ) * M / 2  # fwd-side buffers only (cotangents stream)
            return band + bufs

        act = max(stage_act(s) for s in range(S))
        fits = state + act <= budget
        bb = sum(boundary_bytes(cfg, plan_s, micro_b)) * M / 1e6
        ips = None
        if fits:
            w_dev = [d + u for d, u in work]
            balance = (sum(w_dev) / len(w_dev)) / max(w_dev)
            # efficiency at the MICROBATCH — each PP launch convolves only
            # micro_b images, and small launches waste the MXU (the reason
            # PP loses to DP whenever DP fits)
            ips = (
                predict_ips_per_chip(cfg, micro_b)
                * (n_chips - idle)
                * (1 - bubble)
                * balance
            )
        note = (
            f"bubble {bubble:.1%} at M={M}; calibrate pipeline_cuts with "
            "tools/pp_analysis.py --calibrate on the target chip"
        )
        if idle:
            note += f"; {idle} of {per_slice} chips sit idle (S∤chips)"
        add(Candidate(
            f"PP{S}×DP{dp}",
            {
                "mesh_data": dp, "pipeline_stages": S,
                "pipeline_microbatches": M,
            },
            state / 1e9, act / 1e9, fits, ips, bb, note,
        ))

    # ---- DP × spatial (library API — no Config knob) ----
    for sp in (2, 4, 8):
        if per_slice % sp or slices > 1:
            continue
        dp = per_slice // sp
        if B % max(dp, 1):
            continue
        b_local = B / max(dp, 1)
        state = model_state_bytes_per_chip(
            p_bytes, n_params, moment_dtype=cfg.moment_dtype,
            ema=cfg.ema_decay > 0,
        )
        act = act_bytes(cfg, b_local, spatial_ways=sp)
        fits = state + act <= budget
        add(Candidate(
            f"DP{dp}×spatial{sp}", {}, state / 1e9, act / 1e9, fits, None,
            None,
            "height-sharded activations (halo exchange); library API: "
            "parallel.spatial_train.make_dp_spatial_mesh(data, spatial) — "
            "use when ONE image's activations overflow a chip "
            "(≥1024² territory)",
        ))

    # rank: fitting candidates with predictions first (by predicted
    # throughput), then fitting-unmeasured, then non-fitting
    def key(c: Candidate):
        return (
            not c.fits,
            c.pred_img_s is None,
            -(c.pred_img_s or 0),
            c.total_gb,
        )

    candidates.sort(key=key)
    chosen = candidates[0] if candidates and candidates[0].fits else None

    flags = ""
    if chosen:
        parts = []
        for k, v in chosen.overrides.items():
            parts.append(f"--{k.replace('_', '-')} {v}")
        flags = " ".join(parts)

    return {
        "workload": {
            "size": cfg.size,
            "batch_size": B,
            "params_m": round(n_params / 1e6, 1),
            "compute_dtype": cfg.compute_dtype,
            "flops_per_image_train": _flops_per_image_train(cfg),
        },
        "chips": n_chips,
        "slices": slices,
        "hbm_gb": hbm_gb,
        "budget_gb": round(budget / 1e9, 2),
        "candidates": [c.to_dict() for c in candidates],
        "chosen": chosen.name if chosen else None,
        "overrides": chosen.overrides if chosen else {},
        "cli_flags": flags,
        "notes": [
            "predictions are first-order (±20%), calibrated on measured "
            "TPU v5e anchors (BASELINE_MEASURED.md)",
            REMAT_NOTE,
        ],
    }


def format_plan(result: dict) -> str:
    """Human-readable table for the CLI."""
    w = result["workload"]
    tag = f" [{w['model']}]" if "model" in w else ""
    lines = [
        f"workload: {w['size']}²×3{tag}, {w['params_m']} M params, "
        f"global batch {w['batch_size']}, {w['compute_dtype']}",
        f"budget: {result['chips']} chips × {result['hbm_gb']} GB HBM "
        f"(plan to {result['budget_gb']} GB/chip)",
        "",
        f"{'strategy':<16} {'state GB':>9} {'act GB':>8} {'total':>7} "
        f"{'fits':>5} {'pred img/s':>11}  note",
    ]
    for c in result["candidates"]:
        pred = (
            f"{c['pred_img_s']:.0f}" if c["pred_img_s"] is not None else "—"
        )
        lines.append(
            f"{c['name']:<16} {c['state_gb']:>9.2f} {c['act_gb']:>8.2f} "
            f"{c['total_gb']:>7.2f} {'yes' if c['fits'] else 'NO':>5} "
            f"{pred:>11}  {c['note']}"
        )
    lines.append("")
    if result["chosen"]:
        lines.append(f"recommended: {result['chosen']}")
        if result["cli_flags"]:
            lines.append(f"  flags: {result['cli_flags']}")
    else:
        lines.append(
            "NO strategy fits — shrink the batch, raise grad_accum, or "
            "add chips"
        )
    for n in result["notes"]:
        lines.append(f"note: {n}")
    return "\n".join(lines)
