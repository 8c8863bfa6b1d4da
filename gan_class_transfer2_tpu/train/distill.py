"""Progressive sampler distillation — halve reverse-diffusion steps.

The serving/eval cost of this framework is dominated by the T-step sampler
(SURVEY §3.4: 401 denoiser calls per epoch; ~15.6 img/s at T=200 on a v5e
chip). ``cfg.sample_stride`` already trades steps for quality mechanically;
this module makes the trade *free*: train a student to land in ONE stride-2s
step exactly where the teacher lands in TWO stride-s steps (progressive
distillation, Salimans & Ho 2022 — adapted to the reference's sampler
algebra). Repeating k rounds gives a model whose ``sample_stride = 2^k``
samples match the original stride-1 trajectory, at 1/2^k the denoiser calls.

Derivation (x-parameterization, the reference's active default,
train.py:29,243-244): the sampler state update (core/diffusion.step_update)
is deterministic — from latent z_t and prediction x̂,

    x_θ = x̂,  ε_θ = (z_t − √ᾱ(t)·x̂) / √(1−ᾱ(t)),

and the next latent is z_{t'} = √ᾱ(t')·x_θ + √(1−ᾱ(t'))·ε_θ (renoise).
Let the teacher take two stride-s steps from z_t: t → t−s → arriving state
(x₂, ε₂), whose latent at t'' = t−2s is z'' = renoise(x₂, ε₂, t''). The
single student prediction x̂* that reproduces z'' solves

    √ᾱ''·x̂* + r·(z_t − √ᾱ_t·x̂*) = z'',   r = √(1−ᾱ'')/√(1−ᾱ_t)
    ⇒  x̂* = (z'' − r·z_t) / (√ᾱ'' − r·√ᾱ_t).

The denominator is positive for this schedule (ᾱ decreases in t, so
ᾱ'' > ᾱ_t and r < 1). At the grid's final point (t − 2s < 1) the sampler
returns x_θ directly, so the target is the teacher's final clean estimate.

The same closed form covers the ε and scaled-ε parameterizations: their
sampler update (step_update) maps the prediction to a state pair on the
same line √ᾱ_t·x_θ + √(1−ᾱ_t)·ε_θ = z_t, so the x-space solution x̂* is
parameterization-independent and the regression target is its image in the
model's prediction space — ε̂* = (z_t − √ᾱ_t·x̂*)/√(1−ᾱ_t), scaled by
√(1−ᾱ_t) for scaled-ε. Only the ODE mode is excluded: its recurrence
carries a stale ε_θ (a faithful reference quirk), so the trajectory is not
a function of the current latent alone. Class-conditional checkpoints
distill by threading the batch's labels through teacher and student alike.

Loss: prediction-space MSE against the stopped-gradient target — the same
loss space the base trainer uses (trainer.compute_loss, loss="mse"),
including the prediction_weighting √(1−ᾱ) factor when configured.

The distilled model is a drop-in checkpoint: ``config.json`` carries the
doubled ``sample_stride``, so ``sample``/``serve``/eval pick the fast
schedule up automatically (cli.config_from_args reads checkpoint configs).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import diffusion
from ..core.schedule import alpha_dash
from ..models import api as model_api
from . import trainer as trainer_lib


def _validate(cfg, stride: int) -> None:
    if cfg.parameterization == "ode":
        raise ValueError(
            "progressive distillation does not support the ODE "
            "parameterization: its sampler recurrence carries a stale "
            "epsilon_theta (core/diffusion.step_update, reference "
            "train.py:392,462), so the trajectory is not a function of the "
            "current latent alone and the one-step target is ill-defined"
        )
    if stride % 2 != 0:
        raise ValueError(f"student stride must be even, got {stride}")
    if stride > cfg.steps:
        raise ValueError(f"stride {stride} exceeds steps T={cfg.steps}")
    if cfg.dynamic_loss_scale or cfg.loss_scale > 0:
        # the distill step has no ScaleState / non-finite-skip machinery;
        # silently training an fp16 student unscaled would corrupt it
        raise ValueError(
            "loss scaling is unsupported on the distillation path "
            "(bf16 on TPU needs none); distill with compute_dtype="
            "'bfloat16' or 'float32'"
        )


def student_grid(cfg, stride: int) -> np.ndarray:
    """The student's visit schedule: exactly what sample/serve will visit at
    ``sample_stride=stride`` — delegated to sampler.sample_timesteps (the
    ONE definition of the subset schedule) so the distilled student can
    never train on a grid that drifts from the sampling surfaces."""
    from ..sample import sampler

    return sampler.sample_timesteps(cfg.replace(sample_stride=stride))


def distill_target(cfg, teacher_params, z_t, t, stride: int, class_idx=None):
    """The student's x-space regression target at latent ``z_t``, timestep
    ``t`` (per-sample, (B,1,1,1) float), for a student of ``stride`` (even;
    the teacher runs at stride/2). Pure teacher computation — wrap in
    stop_gradient at the loss. ``class_idx`` threads through conditional
    checkpoints (models/api.apply_denoiser)."""
    s = stride // 2
    t_vec = t[:, 0, 0, 0].astype(jnp.int32)

    def call(params, z, tv):
        return model_api.apply_denoiser(
            cfg, params, z.astype(jnp.dtype(cfg.compute_dtype)), tv,
            class_idx=class_idx,
        ).astype(jnp.float32)

    # teacher step 1 at t
    pred1 = call(teacher_params, z_t, t_vec)
    x1, e1 = diffusion.step_update(cfg, pred1, z_t, None, t)
    # teacher step 2 at t − s (masked out below when t − s < 1)
    t_mid = t - s
    z_mid = diffusion.renoise(cfg, x1, e1, t_mid)
    pred2 = call(teacher_params, z_mid, t_mid[:, 0, 0, 0].astype(jnp.int32))
    x2, e2 = diffusion.step_update(cfg, pred2, z_mid, e1, t_mid)

    t2 = t - stride
    ad_t = alpha_dash(t, cfg.steps, cfg.schedule)
    ad2 = alpha_dash(t2, cfg.steps, cfg.schedule)
    r = (1 - ad2) ** 0.5 / (1 - ad_t) ** 0.5
    z2 = diffusion.renoise(cfg, x2, e2, t2)
    x_mid_target = (z2 - r * z_t) / (ad2**0.5 - r * ad_t**0.5)

    # terminal handling: the sampler's output is x_θ at the last grid point,
    # so when the student has no further visit (t − stride < 1) the target is
    # the teacher's final clean estimate — x₂ when the teacher itself still
    # visits t − s, else x₁
    teacher_final = jnp.where(t_mid >= 1, x2, x1)
    return jnp.where(t2 >= 1, x_mid_target, teacher_final)


def x_to_prediction(cfg, x_target, z_t, t):
    """Map an x-space target to the model's prediction space (the inverse of
    step_update's prediction → x_θ map at latent ``z_t``, timestep ``t``)."""
    if cfg.parameterization == "x":
        return x_target
    ad = alpha_dash(t, cfg.steps, cfg.schedule)
    eps = (z_t - ad**0.5 * x_target) / (1 - ad) ** 0.5
    if cfg.parameterization == "scaled_epsilon":
        return eps * (1 - ad) ** 0.5
    return eps  # epsilon


def distill_loss(cfg, student_params, teacher_params, batch, rng, stride: int,
                 class_idx=None):
    """Draw (t, ε) on the student grid, build z_t from data, regress the
    student's prediction onto the two-teacher-step target (in the model's
    prediction space, with the trainer's prediction_weighting factor when
    configured)."""
    rng_t, rng_eps = jax.random.split(rng)
    b = batch.shape[0]
    grid = jnp.asarray(student_grid(cfg, stride))
    idx = jax.random.randint(rng_t, (b,), 0, grid.shape[0])
    t = grid[idx].reshape(b, 1, 1, 1).astype(jnp.float32)
    epsilon = jax.random.normal(rng_eps, batch.shape, batch.dtype)
    z_t = diffusion.forward_diffuse(cfg, batch, epsilon, t)

    x_target = jax.lax.stop_gradient(
        distill_target(cfg, teacher_params, z_t, t, stride, class_idx)
    )
    target = x_to_prediction(cfg, x_target, z_t, t)
    pred = model_api.apply_denoiser(
        cfg, student_params, z_t.astype(jnp.dtype(cfg.compute_dtype)),
        t[:, 0, 0, 0].astype(jnp.int32), class_idx=class_idx,
    ).astype(jnp.float32)
    if cfg.prediction_weighting and cfg.parameterization in (
        "epsilon", "scaled_epsilon"
    ):
        w = (1 - alpha_dash(t, cfg.steps, cfg.schedule)) ** 0.5
        target, pred = target * w, pred * w
    return trainer_lib.compute_loss(cfg, target, pred)


def distill_opt_config(cfg, steps: int):
    """The distillation round's optimizer schedule: the checkpoint's
    optimizer and base LR, but ROUND-SIZED — a warmup ramp, cosine restart,
    or EMA horizon sized for the original training run would otherwise
    consume (or undo) the whole round:

    * warmup capped at a tenth of the round's APPLIED updates. All LR
      schedules count applied optimizer updates, and under grad_accum > 1 a
      round of ``steps`` micro-steps applies only steps/grad_accum of them —
      capping in micro-steps left the entire round on the ramp (review r4);
    * constant (non-decaying) schedule after the ramp;
    * EMA horizon capped to ~10% of the round: a training decay like 0.9999
      would leave ~0.9999^steps of the round's OUTPUT weight on the
      un-distilled teacher (distill_round returns the EMA params),
      compounding across rounds (review r4). Floored away from 0 so the
      TrainState structure (ema_params present) is unchanged."""
    applied = max(steps // max(cfg.grad_accum, 1), 1)
    ema = cfg.ema_decay
    if ema > 0:
        ema = max(min(ema, 1.0 - 10.0 / max(applied, 11)), 0.5)
    return cfg.replace(
        warm_up=min(cfg.warm_up, max(applied // 10, 1)),
        lr_schedule="warmup",  # linear ramp then constant at base LR
        ema_decay=ema,
    )


def _distill_step_fn(cfg, stride: int):
    """The pure distillation step (state, teacher_params, batch, rng) →
    (state, loss), shared by the single-device and mesh-parallel jits."""
    _validate(cfg, stride)
    optimizer = trainer_lib.make_optimizer(cfg)

    def step(state, teacher_params, batch, rng):
        batch, rng = trainer_lib.fold_and_augment(cfg, batch, rng, state.step)
        label = None
        if isinstance(batch, dict):
            label = batch.get("label")
            batch = batch["image"]
        loss, grads = jax.value_and_grad(
            lambda p: distill_loss(
                cfg, p, teacher_params, batch, rng, stride, class_idx=label
            )
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # shared blend-and-gate (trainer.ema_update): grad_accum gating
        # identical to train_step by construction
        ema = trainer_lib.ema_update(cfg, state.ema_params, params, opt_state)
        return trainer_lib.TrainState(
            state.step + 1, params, opt_state, ema, state.scale_state
        ), loss

    return step


def make_distill_step(cfg, stride: int):
    """Jitted distillation step: (state, teacher_params, batch, rng) →
    (state, loss). ``state`` is a standard TrainState (fresh optimizer over
    the student params); uint8 batches run the on-device augment pipeline
    exactly like the base train step."""
    donate = (0,) if cfg.donate_state else ()
    return jax.jit(_distill_step_fn(cfg, stride), donate_argnums=donate)


def make_parallel_distill_step(cfg, mesh, stride: int, state_sh):
    """The distillation step jitted over a device mesh: batch sharded on
    'data', student state under the same TP/ZeRO rule the base trainer uses
    (``state_sh`` from parallel/mesh.state_shardings), teacher params
    sharded like the student's. GSPMD inserts the gradient all-reduce —
    distillation scales across chips exactly like training."""
    from ..parallel import mesh as mesh_lib

    b_sh = mesh_lib.batch_sharding(mesh)
    rep = mesh_lib.replicated_sharding(mesh)
    donate = (0,) if cfg.donate_state else ()
    return jax.jit(
        _distill_step_fn(cfg, stride),
        in_shardings=(state_sh, state_sh.params, b_sh, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=donate,
    )


def distill_round(cfg, teacher_params, data_iter, stride: int,
                  steps: int, rng, log=print,
                  on_loss=None, mesh=None) -> Tuple[dict, float]:
    """One halving round: student initialised FROM the teacher, trained
    ``steps`` optimizer steps to stride ``stride``. Returns
    (student_params, final_loss). Uses EMA params as the round's output when
    ``cfg.ema_decay > 0``. The optimizer runs on the round-sized schedule of
    :func:`distill_opt_config` (constant LR, warmup ≤ steps/10). A ``mesh``
    with >1 device runs the step data-parallel over it (batches must arrive
    sharded or uncommitted; cli._distill stages them via device_iterator)."""
    opt_cfg = distill_opt_config(cfg, steps)
    state = trainer_lib.TrainState(
        jnp.zeros((), jnp.int32),
        jax.tree_util.tree_map(jnp.copy, teacher_params),
        trainer_lib.make_optimizer(opt_cfg).init(teacher_params),
        jax.tree_util.tree_map(jnp.copy, teacher_params)
        if cfg.ema_decay > 0 else None,
        None,
    )
    if mesh is not None and mesh.size > 1:
        from ..parallel import mesh as mesh_lib

        state_sh = mesh_lib.state_shardings(state, mesh, zero1=cfg.zero1)
        state = jax.device_put(state, state_sh)
        teacher_params = jax.device_put(teacher_params, state_sh.params)
        step_fn = make_parallel_distill_step(opt_cfg, mesh, stride, state_sh)
    else:
        step_fn = make_distill_step(opt_cfg, stride)
    loss = float("nan")
    sync_every = getattr(cfg, "host_sync_every", 0) or steps
    for i in range(steps):
        batch = next(data_iter)
        state, loss_dev = step_fn(state, teacher_params, batch, rng)
        if i % max(steps // 5, 1) == 0 or i == steps - 1:
            loss = float(loss_dev)  # synchronising fetch
            log(f"  distill stride {stride}: step {i + 1}/{steps} "
                f"loss={loss:.6f}")
            if on_loss is not None:
                on_loss(stride, i + 1, loss)
        elif (i + 1) % sync_every == 0:
            # bounded in-flight dispatch (Config.host_sync_every): without
            # it the producer loop pins one host batch per queued step
            float(loss_dev)
    out = state.ema_params if state.ema_params is not None else state.params
    return out, loss


def progressive_distill(cfg, teacher_params, data_iter, target_stride: int,
                        steps_per_round: int, rng=None, log=print,
                        on_loss=None, mesh=None):
    """Full schedule: stride doubles each round from 2·sample_stride to
    ``target_stride``; each round's student becomes the next teacher.
    Returns (params, final_stride). ``mesh``: see :func:`distill_round`."""
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed + 101)
    stride = max(cfg.sample_stride, 1)
    if target_stride < stride or (target_stride % stride) != 0 or (
        target_stride // stride
    ) & (target_stride // stride - 1):
        raise ValueError(
            f"target stride {target_stride} is not reachable by doubling "
            f"from the teacher's sample_stride {stride} "
            "(must be stride · 2^k)"
        )
    if target_stride > cfg.steps:
        raise ValueError(
            f"target stride {target_stride} exceeds steps T={cfg.steps}"
        )
    params = teacher_params
    while stride < target_stride:
        stride *= 2
        rng, sub = jax.random.split(rng)
        log(f"distillation round -> stride {stride}")
        params, loss = distill_round(
            cfg, params, data_iter, stride, steps_per_round, sub, log=log,
            on_loss=on_loss, mesh=mesh,
        )
    return params, stride
