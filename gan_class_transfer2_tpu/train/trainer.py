"""The jit-compiled diffusion training step.

Reference semantics (Trainer, reference train.py:217-280):
  * per-sample ``t ~ U[1, T]`` shaped (B,1,1,1)       — train.py:224-226
  * ``ε ~ N(0,1)``                                     — train.py:227
  * forward diffusion mixture                          — train.py:231-234
  * prediction target per parameterization             — train.py:238-252
  * loss computed in fp32 regardless of compute dtype  — train.py:262-263
  * active loss = mean squared error                   — train.py:272
    alternatives (selectable here): frequency-weighted DCT MSE (:254-260),
    L1 via max(a-b, b-a) (:267-270), multiscale avg-pool MSE (:274-280)
  * optimizer Adam(warmup 2e-5/2000), TF eps=1e-7      — train.py:75
    alternatives: SGD(+momentum/nesterov), sign-SGD, RMSprop (:67-78)
  * optional l2 regularization (:80) via weight decay on EVERY leaf —
    the reference wires its commented l2 to kernel_regularizer AND
    bias_regularizer on every layer (:135-136, :151-152, :164-165,
    :200-201), so no kernel-only mask here
  * fp16 loss scaling (:82-83) as optional static scaling — unnecessary for
    TPU bf16 but kept for semantic parity.

TPU-first: the whole step (RNG → diffusion → fwd → bwd → Adam) is one XLA
program; state buffers are donated; ε and the noising mixture can be produced
by a fused Pallas kernel (ops/kernels.py) that avoids materialising ε in HBM
when the parameterization never reuses it.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core import diffusion
from ..core.schedule import make_lr_schedule
from ..models import api as model_api
from ..ops import image as image_ops


class ScaleState(NamedTuple):
    """Dynamic loss-scaling state (TF LossScaleOptimizer semantics,
    reference train.py:82-83): halve on non-finite grads and skip the
    update; double after ``growth_interval`` consecutive finite steps."""

    scale: jnp.ndarray  # scalar float32
    good_steps: jnp.ndarray  # scalar int32, consecutive finite steps


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Any
    opt_state: Any
    ema_params: Any  # == params tree, or None when ema_decay == 0
    scale_state: Any = None  # ScaleState when cfg.dynamic_loss_scale


def identity(y_true, y_pred):
    """Keras-compat loss shim (reference train.py:171-173): the reference's
    Trainer outputs its loss, so the Keras loss just averages y_pred. Our
    train step returns the loss directly; this exists for API parity."""
    return jnp.mean(y_pred)


def _sign_gradient_transform() -> optax.GradientTransformation:
    """Per-variable sign(g) (reference train.py:47-48, sign-SGD config)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return jax.tree_util.tree_map(jnp.sign, updates), state

    return optax.GradientTransformation(init, update)


def _scale_by_adam_tf(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
    moment_dtype=None,
) -> optax.GradientTransformation:
    """Keras/TF Adam update math *exactly* (reference train.py:75).

    TF adds ``eps`` AFTER ``sqrt(v)`` — not after ``sqrt(v_hat)`` as optax's
    ``scale_by_adam`` does — and folds the bias correction into the step
    size::

        local_step = iterations + 1
        alpha      = sqrt(1 - b2**local_step) / (1 - b1**local_step)
        m          = b1*m + (1-b1)*g
        v          = b2*v + (1-b2)*g**2
        var       -= lr * alpha * m / (sqrt(v) + eps)

    The two formulations differ by an effective-epsilon factor of
    ``1/sqrt(1 - b2**t)`` (≈32× at step 1 with b2=0.999), so bit-level
    training-step parity with the reference requires this variant
    (``Config.optimizer = "adam_tf"``; tests/test_step_parity.py).
    """

    def zeros(p):
        return jnp.zeros(p.shape, moment_dtype or p.dtype)

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(updates, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        # math in fp32 regardless of the moment storage dtype
        mu32 = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32),
            state.mu,
            updates,
        )
        nu32 = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu,
            updates,
        )
        alpha = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        out = jax.tree_util.tree_map(
            lambda m, v, g: (alpha * m / (jnp.sqrt(v) + eps)).astype(g.dtype),
            mu32,
            nu32,
            updates,
        )
        store = lambda t32, old: jax.tree_util.tree_map(
            lambda x, o: x.astype(o.dtype), t32, old
        )
        return out, optax.ScaleByAdamState(
            count=count, mu=store(mu32, state.mu), nu=store(nu32, state.nu)
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg) -> optax.GradientTransformation:
    lr = make_lr_schedule(cfg)
    chain = []
    if cfg.weight_decay > 0:
        # l2(λ) regularizer on every weight (reference train.py:80,
        # commented): equivalent to adding 2λ·w to the gradient — which is
        # why it must precede the clip: the reference wires l2 through
        # kernel_regularizer, so its gradient term is part of the clipped
        # total, not an unbounded addition on top (review r4).
        chain.append(optax.add_decayed_weights(2.0 * cfg.weight_decay))
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.optimizer == "adam":
        chain.append(optax.adam(lr, eps=cfg.adam_eps))
    elif cfg.optimizer in ("adam_tf", "adam_fused"):
        # exact Keras Adam update math for bit-level step parity with the
        # reference optimizer (train.py:75); see _scale_by_adam_tf.
        # adam_fused shares this optax path as its fallback — train_step
        # swaps in the one-pass Pallas kernel (ops/adam_kernel.py) when
        # fused_adam_ok(cfg); both paths use the same opt-state structure,
        # so checkpoints are interchangeable.
        moment_dtype = (
            jnp.bfloat16 if cfg.moment_dtype == "bfloat16" else None
        )
        chain.append(
            _scale_by_adam_tf(eps=cfg.adam_eps, moment_dtype=moment_dtype)
        )
        chain.append(optax.scale_by_learning_rate(lr))
    elif cfg.optimizer == "sgd":
        chain.append(optax.sgd(lr))
    elif cfg.optimizer == "momentum":
        chain.append(optax.sgd(lr, momentum=cfg.momentum, nesterov=cfg.nesterov))
    elif cfg.optimizer == "sign_sgd":
        chain.append(_sign_gradient_transform())
        chain.append(optax.sgd(lr))
    elif cfg.optimizer == "rmsprop":
        chain.append(optax.rmsprop(lr))
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    tx = optax.chain(*chain)
    if getattr(cfg, "grad_accum", 1) > 1:
        # apply every N micro-batches with the MEAN of accumulated grads —
        # equivalent to an N×batch_size step (validated in
        # tests/test_trainer.py::test_grad_accum_matches_big_batch)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def init_state(cfg, rng) -> TrainState:
    params = model_api.init_denoiser(rng, cfg)
    opt_state = make_optimizer(cfg).init(params)
    # EMA must be a distinct buffer: state donation would otherwise present
    # the same buffer twice to XLA (params and ema alias at init).
    ema = (
        jax.tree_util.tree_map(jnp.copy, params) if cfg.ema_decay > 0 else None
    )
    scale_state = None
    if cfg.dynamic_loss_scale:
        init_scale = cfg.loss_scale if cfg.loss_scale > 0 else 2.0**15
        scale_state = ScaleState(
            jnp.asarray(init_scale, jnp.float32), jnp.zeros((), jnp.int32)
        )
    return TrainState(
        jnp.zeros((), jnp.int32), params, opt_state, ema, scale_state
    )


def compute_loss(cfg, target, prediction):
    """Loss in fp32 (reference train.py:262-272 and alternatives)."""
    target = target.astype(jnp.float32)
    prediction = prediction.astype(jnp.float32)
    if cfg.loss == "mse":
        return jnp.mean(jnp.square(target - prediction))
    if cfg.loss == "l1":
        # reference train.py:267-270 (max formulation; tf.abs "crashes")
        return jnp.mean(jnp.maximum(target - prediction, prediction - target))
    if cfg.loss == "dct":
        return jnp.mean(image_ops.dct2d_weighted(target - prediction) ** 2)
    if cfg.loss == "mse_multiscale":
        return jnp.mean(jnp.square(target - prediction)) + jnp.mean(
            jnp.square(
                image_ops.avg_pool(target, 16) - image_ops.avg_pool(prediction, 16)
            )
        )
    raise ValueError(f"unknown loss {cfg.loss!r}")


def diffusion_loss(
    cfg,
    params,
    batch,
    rng,
    *,
    t_int=None,
    epsilon_in=None,
    mesh=None,
    batch_spec=None,
):
    """Sample (t, ε), noise the batch, predict, and compute the loss.

    ``batch`` is either an image array or a dict {"image", "label"} for
    class-conditional training (BASELINE config 5).

    ``t_int``/``epsilon_in`` optionally inject the randomness instead of
    drawing it from ``rng`` — used by the bit-level step-parity harness
    (tests/test_step_parity.py) to feed both this step and a live TF
    reference step the identical (t, ε) draws.

    ``mesh``/``batch_spec`` (from the parallel step builders): Mosaic
    kernels cannot be GSPMD-partitioned, so on a >1-device mesh the fused
    diffusion kernel must run in a shard_map island keyed by the batch's
    partition spec (ops/kernels.forward_diffuse_fused_sharded); without
    the spec the fused path is disabled on multi-device meshes."""
    label = None
    if isinstance(batch, dict):
        label = batch.get("label")
        batch = batch["image"]
    noised, target, pred_scale, t_int = draw_and_diffuse(
        cfg, batch, rng, t_int=t_int, epsilon_in=epsilon_in,
        mesh=mesh, batch_spec=batch_spec,
    )
    prediction = model_api.apply_denoiser(
        cfg, params, noised, t_int[:, 0, 0, 0], class_idx=label
    )
    prediction = prediction.astype(jnp.float32) * pred_scale
    return compute_loss(cfg, target, prediction)


def draw_and_diffuse(
    cfg, batch, rng, *, t_int=None, epsilon_in=None, mesh=None, batch_spec=None
):
    """The (t, ε) draws + forward diffusion + target selection of
    ``diffusion_loss``, shared verbatim with the pipeline-parallel prep
    program (parallel/pipeline.PipelineTrainer._prep_fn) so the two paths
    cannot drift apart in RNG order or fused-kernel gating. Returns
    ``(noised, target, prediction_scale, t_int)`` with ``t_int`` shaped
    (B,1,1,1) int32."""
    rng_t, rng_eps = jax.random.split(rng)
    b = batch.shape[0]
    if t_int is None:
        t_int = jax.random.randint(rng_t, (b, 1, 1, 1), 1, cfg.steps + 1)
    else:
        t_int = jnp.reshape(jnp.asarray(t_int, jnp.int32), (b, 1, 1, 1))
    t = t_int.astype(batch.dtype)
    multi_device = mesh is not None and mesh.size > 1
    use_fused = (
        epsilon_in is None
        and cfg.fused_diffusion
        and cfg.parameterization == "x"  # ε unused downstream (target = x)
        and jax.default_backend() == "tpu"
        # kernel requires lane-aligned flattened samples; fall back otherwise
        and (batch.shape[1] * batch.shape[2] * batch.shape[3]) % 128 == 0
    )
    if use_fused and multi_device:
        from ..ops import kernels

        # lane alignment must hold on the per-device LOCAL shape
        if batch_spec is not None and kernels.fused_sharded_ok(
            cfg, batch.shape, mesh, batch_spec
        ):
            noised = kernels.forward_diffuse_fused_sharded(
                cfg, batch, t, rng_eps, mesh, batch_spec
            )
            epsilon = None
        else:
            use_fused = False
    elif use_fused:
        from ..ops import kernels

        noised = kernels.forward_diffuse_fused(cfg, batch, t, rng_eps)
        epsilon = None  # never materialised in HBM
    if not use_fused:
        if epsilon_in is None:
            epsilon = jax.random.normal(rng_eps, batch.shape, batch.dtype)
        else:
            epsilon = jnp.asarray(epsilon_in, batch.dtype)
        noised = diffusion.forward_diffuse(cfg, batch, epsilon, t)
    target, pred_scale = diffusion.training_target(cfg, batch, epsilon, t)
    return noised, target, pred_scale, t_int


def fold_and_augment(cfg, batch, rng, step):
    """Per-step RNG fold plus the on-device uint8 augment pipeline,
    preserving dict (labeled) batches. Shared by ``train_step``, the
    pipeline prep program, and the distillation step so their RNG stream
    and augment semantics stay identical.

    uint8 (HBM-resident raw-pixel) batches crop/flip/normalize in the same
    program but OUTSIDE the differentiated region — inside value_and_grad
    the vmapped dynamic-slice crop degrades XLA's schedule (measured 631 vs
    991 img/s at b128)."""
    rng = jax.random.fold_in(rng, step)
    raw = batch["image"] if isinstance(batch, dict) else batch
    if raw.dtype == jnp.uint8:
        rng, rng_aug = jax.random.split(rng)
        batch = augment_if_uint8(cfg, batch, rng_aug)
    return batch, rng


def augment_if_uint8(cfg, batch, rng):
    """The on-device uint8 crop/flip/normalize pipeline for HBM-resident
    raw-pixel batches (gct2 build-cache), preserving dict (labeled)
    batches; float batches pass through untouched. Shared with the GAN
    steps — they previously fed raw 0..255 uint8 straight into the
    generators (review r4)."""
    raw = batch["image"] if isinstance(batch, dict) else batch
    if raw.dtype != jnp.uint8:
        return batch
    from ..data import device_augment

    augmented = device_augment.augment_batch(raw, rng, size=cfg.size)
    if isinstance(batch, dict):
        return dict(batch, image=augmented)
    return augmented


def train_step(
    cfg,
    optimizer,
    state: TrainState,
    batch,
    rng,
    mesh_size: int = 1,
    mesh=None,
    batch_spec=None,
) -> Tuple[TrainState, jnp.ndarray]:
    """One optimizer step. Pure; jit/pjit-compiled by the caller.
    ``mesh_size`` is the device count of the compiling mesh (gates the
    fused-Adam kernel, which is single-device only); ``mesh``/``batch_spec``
    route the fused diffusion kernel through a shard_map island on
    multi-device meshes (see diffusion_loss)."""
    batch, rng = fold_and_augment(cfg, batch, rng, state.step)

    dynamic = cfg.dynamic_loss_scale
    if dynamic:
        scale = state.scale_state.scale
    else:
        scale = cfg.loss_scale if cfg.loss_scale > 0 else None

    def loss_fn(params):
        loss = diffusion_loss(
            cfg, params, batch, rng, mesh=mesh, batch_spec=batch_spec
        )
        if scale is not None:
            return loss * scale
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    if scale is not None:
        inv = 1.0 / scale
        loss = loss * inv
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)

    scale_state = state.scale_state
    if dynamic:
        # TF LossScaleOptimizer semantics: skip the whole update on any
        # non-finite gradient and halve the scale; double after
        # growth_interval consecutive clean steps (reference train.py:82-83)
        finite = jnp.asarray(True)
        for g in jax.tree_util.tree_leaves(grads):
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))
        new_updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, new_updates)
        sel = lambda n, o: jnp.where(finite, n, o)
        params = jax.tree_util.tree_map(sel, new_params, state.params)
        opt_state = jax.tree_util.tree_map(sel, new_opt, state.opt_state)
        good = scale_state.good_steps + 1
        grow = jnp.logical_and(finite, good >= cfg.loss_scale_growth_interval)
        new_scale = jnp.where(
            finite,
            jnp.where(grow, scale * 2.0, scale),
            jnp.maximum(scale * 0.5, 1.0),
        )
        new_good = jnp.where(jnp.logical_and(finite, ~grow), good, 0)
        scale_state = ScaleState(new_scale, new_good)
    else:
        from ..ops import adam_kernel

        if (
            adam_kernel.fused_adam_ok(cfg, mesh_size)
            and jax.default_backend() == "tpu"
        ):
            # one-pass Pallas Adam: moments + bias correction + param write
            # in a single HBM sweep per leaf (ops/adam_kernel.py)
            params, opt_state = adam_kernel.fused_adam_apply(
                cfg, state.params, state.opt_state, grads
            )
        else:
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
    ema = ema_update(
        cfg, state.ema_params, params, opt_state,
        finite=finite if dynamic else None,
    )
    return TrainState(state.step + 1, params, opt_state, ema, scale_state), loss


def ema_update(cfg, ema, params, opt_state, finite=None):
    """EMA blend gated on an APPLIED update: under grad_accum only when
    MultiSteps' window closed (mini_step wraps to 0), and under dynamic
    loss scaling only on ``finite`` (non-skipped) steps — no-op steps would
    decay EMA toward the unchanged params, silently raising the effective
    per-update decay. Shared by train_step and the distillation step so the
    gating cannot drift. Returns the new EMA tree (None stays None)."""
    if ema is None:
        return None
    d = cfg.ema_decay
    blended = jax.tree_util.tree_map(
        lambda e, p: e * d + p * (1.0 - d), ema, params
    )
    applied = None
    if cfg.grad_accum > 1:
        applied = opt_state.mini_step == 0
    if finite is not None:
        applied = finite if applied is None else jnp.logical_and(
            applied, finite
        )
    if applied is None:
        return blended
    return jax.tree_util.tree_map(
        lambda b, e: jnp.where(applied, b, e), blended, ema
    )


def make_injected_train_step(cfg):
    """Jitted train step with externally supplied randomness.

    Takes ``(state, batch, t_int, epsilon)`` instead of an RNG key —
    the bit-level step-parity harness feeds the identical (t, ε) draws to
    this step and to a live TF/Keras reference step and compares losses and
    post-step weights (tests/test_step_parity.py). No augmentation, loss
    scaling, or EMA: pure reference Trainer semantics
    (reference train.py:217-280)."""
    optimizer = make_optimizer(cfg)

    def step(state, batch, t_int, epsilon):
        loss, grads = jax.value_and_grad(
            lambda p: diffusion_loss(
                cfg,
                p,
                batch,
                jax.random.PRNGKey(0),  # unused: both draws are injected
                t_int=t_int,
                epsilon_in=epsilon,
            )
        )(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            state.step + 1, params, opt_state, state.ema_params, state.scale_state
        )
        return new_state, loss

    return jax.jit(step)


def make_train_step(cfg):
    """Build the jitted single-device training step with donated state."""
    optimizer = make_optimizer(cfg)

    def step(state, batch, rng):
        return train_step(cfg, optimizer, state, batch, rng)

    donate = (0,) if cfg.donate_state else ()
    return jax.jit(step, donate_argnums=donate)
