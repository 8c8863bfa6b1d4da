"""GAN-mode training: cycle-consistent class transfer with G/D pairs.

The reference code is a diffusion trainer, but the framework must also host
the GAN-style configs BASELINE.json evaluates (G/D conv stacks, adversarial +
reconstruction losses, alternating G/D updates, cycle/identity losses, EMA
sampling — see BASELINE.json "north_star" and SURVEY §7 "GAN-mode
capabilities"). Architecture:

  * G_AB, G_BA — two U-Net generators (models/unet.py, the Denoiser topology
    applied as an image→image translator)
  * D_A, D_B — strided-conv discriminators (models/discriminator.py)
  * one jit-compiled step computing D-grads (on stop-gradient'd fakes) and
    G-grads in a single XLA program: the generator forward pass is shared
    between both losses (FusedProp-style), so the "alternating" update costs
    one generator forward + two backward passes instead of two full cycles.

Loss menu (cfg.gan_loss): non-saturating BCE, LSGAN (MSE), hinge. Plus
cycle-consistency L1 (‖G_BA(G_AB(a)) − a‖₁), identity L1 (‖G_AB(b) − b‖₁)
and optional direct reconstruction L1.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import discriminator as d_lib
from ..models import unet
from ..ops import diffaug
from . import trainer as trainer_lib
from .trainer import make_optimizer


class GANState(NamedTuple):
    step: jnp.ndarray
    g_ab: Any
    g_ba: Any
    d_a: Any
    d_b: Any
    g_opt: Any
    d_opt: Any
    ema_g_ab: Any
    ema_g_ba: Any


def _d_optimizer(cfg):
    if cfg.d_learning_rate > 0:
        cfg = cfg.replace(learning_rate=cfg.d_learning_rate)
    return make_optimizer(cfg)


def init_gan_state(cfg, rng) -> GANState:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    g_ab = unet.init_unet(k1, cfg, out_channels=3)
    g_ba = unet.init_unet(k2, cfg, out_channels=3)
    d_a = d_lib.init_discriminator(k3, cfg)
    d_b = d_lib.init_discriminator(k4, cfg)
    g_opt = make_optimizer(cfg).init({"ab": g_ab, "ba": g_ba})
    d_opt = _d_optimizer(cfg).init({"a": d_a, "b": d_b})
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    ema_ab = copy(g_ab) if cfg.ema_decay > 0 else None
    ema_ba = copy(g_ba) if cfg.ema_decay > 0 else None
    return GANState(
        jnp.zeros((), jnp.int32), g_ab, g_ba, d_a, d_b, g_opt, d_opt, ema_ab, ema_ba
    )


# ------------------------------------------------------------------ losses ---


def adversarial_loss(cfg, logits, is_real: bool, for_generator: bool):
    logits = logits.astype(jnp.float32)
    if cfg.gan_loss == "nonsaturating":
        labels = jnp.ones_like(logits) if is_real else jnp.zeros_like(logits)
        return jnp.mean(
            optax.sigmoid_binary_cross_entropy(logits, labels)
        )
    if cfg.gan_loss == "lsgan":
        target = 1.0 if is_real else 0.0
        return jnp.mean((logits - target) ** 2)
    if cfg.gan_loss == "hinge":
        if for_generator:
            return -jnp.mean(logits)
        if is_real:
            return jnp.mean(jax.nn.relu(1.0 - logits))
        return jnp.mean(jax.nn.relu(1.0 + logits))
    raise ValueError(f"unknown gan_loss {cfg.gan_loss!r}")


def _l1(a, b):
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def annealed_weight(cfg, base: float, final: float, step):
    """Current loss weight at optimizer ``step``: linear ramp base→final
    over cfg.loss_anneal_steps, then hold. Returns the static python float
    when the anneal is off for this term (final < 0 or no ramp length), so
    the compiled program is unchanged unless the feature is used; a traced
    fp32 scalar otherwise. ``step`` never needs a gradient — the weight is
    constant w.r.t. params inside value_and_grad."""
    if final < 0 or cfg.loss_anneal_steps <= 0:
        return base
    frac = jnp.minimum(
        jnp.asarray(step, jnp.float32) / float(cfg.loss_anneal_steps), 1.0
    )
    return base + (final - base) * frac


def _generate(cfg, g_params, x):
    return unet.unet_apply(cfg, g_params, x)


def r1_penalty(cfg, d_params_one, real, labels=None):
    """E over the batch of ‖∇ₓD(x)‖² (summed over pixels per sample) — the
    R1 gradient penalty's raw term; the step scales it by 0.5·r1_weight.
    ``labels``: class vector for the projection-conditioned discriminator
    (conditional GAN); gradients are w.r.t. the image input only.
    Differentiating it w.r.t. d_params (the outer value_and_grad) is a
    double backward through the discriminator convs, which XLA compiles
    into the same program as the rest of the step."""

    def d_sum(x):
        out = (
            d_lib.discriminator_apply(cfg, d_params_one, x)
            if labels is None
            else d_lib.discriminator_apply(cfg, d_params_one, x, labels)
        )
        return jnp.sum(out.astype(jnp.float32))

    g = jax.grad(d_sum)(real)
    return jnp.mean(jnp.sum(g.astype(jnp.float32) ** 2, axis=(1, 2, 3)))


# -------------------------------------------------------------------- step ---


def gan_train_step(
    cfg, g_optimizer, d_optimizer, state: GANState, batch_a, batch_b, rng
) -> Tuple[GANState, dict]:
    """One alternating G/D update (both computed in one XLA program)."""
    # every discriminator input (real and fake, D and G terms) goes through
    # the diffaug policy with an independent draw; a "" policy is a no-op.
    # fold_in(step): the runner passes one rng per fit call, so without the
    # fold the augmentation draws would be FROZEN across steps (review r3c)
    rng = jax.random.fold_in(rng, state.step)
    (k_dra, k_dfa, k_drb, k_dfb, k_gfa, k_gfb,
     k_aug_a, k_aug_b) = jax.random.split(rng, 8)
    # HBM-resident uint8 batches (gct2 build-cache) crop/flip/normalize on
    # device exactly like the diffusion step — raw 0..255 pixels previously
    # flowed straight into the generators (review r4); float batches pass
    # through untouched
    batch_a = trainer_lib.augment_if_uint8(cfg, batch_a, k_aug_a)
    batch_b = trainer_lib.augment_if_uint8(cfg, batch_b, k_aug_b)
    aug = lambda k, x: diffaug.augment(cfg, k, x)
    w_cycle = annealed_weight(
        cfg, cfg.cycle_weight, cfg.cycle_weight_final, state.step
    )
    w_ident = annealed_weight(
        cfg, cfg.identity_weight, cfg.identity_weight_final, state.step
    )

    def d_loss_fn(d_params, fakes):
        fake_a, fake_b = fakes
        real_a, real_b = aug(k_dra, batch_a), aug(k_drb, batch_b)
        loss = (
            adversarial_loss(
                cfg,
                d_lib.discriminator_apply(cfg, d_params["a"], real_a),
                True,
                False,
            )
            + adversarial_loss(
                cfg,
                d_lib.discriminator_apply(cfg, d_params["a"], aug(k_dfa, fake_a)),
                False,
                False,
            )
            + adversarial_loss(
                cfg,
                d_lib.discriminator_apply(cfg, d_params["b"], real_b),
                True,
                False,
            )
            + adversarial_loss(
                cfg,
                d_lib.discriminator_apply(cfg, d_params["b"], aug(k_dfb, fake_b)),
                False,
                False,
            )
        ) * 0.5
        r1 = jnp.zeros((), jnp.float32)
        if cfg.r1_weight > 0:
            # penalised at D's ACTUAL input (the augmented reals), as in
            # the augmented-R1 formulation
            r1 = r1_penalty(cfg, d_params["a"], real_a) + r1_penalty(
                cfg, d_params["b"], real_b
            )
            loss = loss + 0.5 * cfg.r1_weight * r1
        return loss, r1

    def g_loss_fn(g_params, d_params):
        fake_b = _generate(cfg, g_params["ab"], batch_a)
        fake_a = _generate(cfg, g_params["ba"], batch_b)
        adv = adversarial_loss(
            cfg,
            d_lib.discriminator_apply(cfg, d_params["b"], aug(k_gfb, fake_b)),
            True,
            True,
        ) + adversarial_loss(
            cfg,
            d_lib.discriminator_apply(cfg, d_params["a"], aug(k_gfa, fake_a)),
            True,
            True,
        )
        # zero-weight loss terms are elided from the program entirely (cfg
        # is static under jit): cycle and identity each cost two full U-Net
        # forwards, which XLA can NOT dead-code-eliminate while their values
        # feed the metrics dict. A disabled term reports 0 in TensorBoard.
        zero = jnp.zeros((), jnp.float32)
        cycle = (
            _l1(_generate(cfg, g_params["ba"], fake_b), batch_a)
            + _l1(_generate(cfg, g_params["ab"], fake_a), batch_b)
            if cfg.cycle_term_active
            else zero
        )
        ident = (
            _l1(_generate(cfg, g_params["ab"], batch_b), batch_b)
            + _l1(_generate(cfg, g_params["ba"], batch_a), batch_a)
            if cfg.identity_term_active
            else zero
        )
        # reconstruction anchors the transfer to its *input* (the data is
        # unpaired — comparing to the opposite-class batch would be
        # meaningless and collapse G toward the target-class batch mean)
        recon = (
            _l1(fake_b, batch_a) + _l1(fake_a, batch_b)
            if cfg.reconstruction_weight > 0
            else zero
        )
        total = (
            cfg.adversarial_weight * adv
            + w_cycle * cycle
            + w_ident * ident
            + cfg.reconstruction_weight * recon
        )
        return total, (fake_a, fake_b, adv, cycle, ident)

    g_params = {"ab": state.g_ab, "ba": state.g_ba}
    d_params = {"a": state.d_a, "b": state.d_b}

    (g_loss, (fake_a, fake_b, adv, cycle, ident)), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True
    )(g_params, d_params)

    fakes = (jax.lax.stop_gradient(fake_a), jax.lax.stop_gradient(fake_b))
    (d_loss, r1), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
        d_params, fakes
    )

    g_updates, g_opt = g_optimizer.update(g_grads, state.g_opt, g_params)
    g_params = optax.apply_updates(g_params, g_updates)
    d_updates, d_opt = d_optimizer.update(d_grads, state.d_opt, d_params)
    d_params = optax.apply_updates(d_params, d_updates)

    # shared gated blend (trainer.ema_update): under grad_accum the EMA
    # moves only on APPLIED updates — the ungated blend decayed toward
    # unchanged params on every no-op micro-step, silently compounding the
    # effective per-update decay to d^accum (review r4)
    ema_ab = trainer_lib.ema_update(cfg, state.ema_g_ab, g_params["ab"], g_opt)
    ema_ba = trainer_lib.ema_update(cfg, state.ema_g_ba, g_params["ba"], g_opt)

    new_state = GANState(
        state.step + 1,
        g_params["ab"],
        g_params["ba"],
        d_params["a"],
        d_params["b"],
        g_opt,
        d_opt,
        ema_ab,
        ema_ba,
    )
    metrics = {
        "g_loss": g_loss,
        "d_loss": d_loss,
        "adversarial": adv,
        "cycle": cycle,
        "identity": ident,
    }
    if cfg.r1_weight > 0:
        metrics["r1"] = r1
    if cfg.loss_anneal_steps > 0:
        # current effective weights, so the anneal is visible in TensorBoard
        metrics["cycle_weight"] = jnp.asarray(w_cycle, jnp.float32)
        metrics["identity_weight"] = jnp.asarray(w_ident, jnp.float32)
    return new_state, metrics


def make_gan_train_step(cfg):
    g_opt = make_optimizer(cfg)
    d_opt = _d_optimizer(cfg)

    def step(state, batch_a, batch_b, rng):
        return gan_train_step(cfg, g_opt, d_opt, state, batch_a, batch_b, rng)

    donate = (0,) if cfg.donate_state else ()
    return jax.jit(step, donate_argnums=donate)


def select_generator(state: GANState, direction: str = "ab", use_ema: bool = True):
    """The generator param tree for a transfer direction (EMA when kept)."""
    if direction not in ("ab", "ba"):
        # a typo ("AB", "a_b") would silently return the ba generator
        raise ValueError(f"direction must be 'ab' or 'ba', got {direction!r}")
    if direction == "ab":
        return state.ema_g_ab if (use_ema and state.ema_g_ab is not None) else state.g_ab
    return state.ema_g_ba if (use_ema and state.ema_g_ba is not None) else state.g_ba


def make_transfer_fn(cfg, mesh=None):
    """Jitted ``(g_params, images) -> transferred`` forward, data-parallel
    over the mesh's data axis (parallel.mesh.make_data_parallel_apply) —
    the eval/serving-side sibling of ``transfer``."""
    from ..parallel import mesh as mesh_lib

    return mesh_lib.make_data_parallel_apply(
        mesh, lambda p, x: _generate(cfg, p, x)
    )


def transfer(cfg, state: GANState, images, direction: str = "ab", use_ema: bool = True):
    """Apply the learned class transfer to a batch of images."""
    return _generate(cfg, select_generator(state, direction, use_ema), images)
