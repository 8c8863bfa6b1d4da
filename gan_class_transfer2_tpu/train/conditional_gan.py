"""Multi-class conditional transfer (BASELINE.json config 5: "multi-class
conditional transfer at 256×256 with cycle/identity losses + EMA sampling").

Single conditional generator G(x, target_class) (models/conditional.py) and a
projection-conditioned discriminator D(x, class) (models/discriminator.py),
StarGAN-style:

  * adversarial: D judges (image, class) pairs — real images with their true
    class vs generated images with the target class
  * cycle: G(G(x, c_target), c_source) ≈ x
  * identity: G(x, c_source) ≈ x
  * EMA of the generator for sampling

One jitted step; batches arrive as {"image": (B,H,W,3), "label": (B,)} plus
per-sample random target classes drawn in-step.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import conditional as cond_lib
from ..models import discriminator as d_lib
from ..ops import diffaug
from . import trainer as trainer_lib
from .gan import _d_optimizer, adversarial_loss, annealed_weight, _l1, r1_penalty
from .trainer import make_optimizer


class ConditionalGANState(NamedTuple):
    step: jnp.ndarray
    generator: Any
    discriminator: Any
    g_opt: Any
    d_opt: Any
    ema_generator: Any


def init_conditional_gan_state(cfg, rng) -> ConditionalGANState:
    if cfg.num_classes < 2:
        raise ValueError("conditional GAN needs Config.num_classes >= 2")
    k_g, k_d = jax.random.split(rng)
    generator = cond_lib.init_conditional_unet(
        k_g, cfg, num_classes=cfg.num_classes, embed_dim=cfg.class_embed_dim
    )
    discriminator = d_lib.init_discriminator(k_d, cfg, num_classes=cfg.num_classes)
    g_opt = make_optimizer(cfg).init(generator)
    d_opt = _d_optimizer(cfg).init(discriminator)
    ema = (
        jax.tree_util.tree_map(jnp.copy, generator) if cfg.ema_decay > 0 else None
    )
    return ConditionalGANState(
        jnp.zeros((), jnp.int32), generator, discriminator, g_opt, d_opt, ema
    )


def conditional_gan_train_step(
    cfg, g_optimizer, d_optimizer, state: ConditionalGANState, batch, rng
) -> Tuple[ConditionalGANState, dict]:
    rng = jax.random.fold_in(rng, state.step)
    # per-sample random target class != source (shift by U[1, C-1] mod C)
    k_shift, k_gf, k_dr, k_df, k_aug = jax.random.split(rng, 5)
    # uint8 cached batches: on-device crop/flip/normalize, like gan.py and
    # the diffusion step (review r4)
    batch = trainer_lib.augment_if_uint8(cfg, batch, k_aug)
    images, labels = batch["image"], batch["label"]
    shift = jax.random.randint(
        k_shift, labels.shape, 1, cfg.num_classes
    )
    targets = (labels + shift) % cfg.num_classes
    # every discriminator input goes through the diffaug policy (no-op
    # when cfg.diffaug is ""), exactly as in gan.gan_train_step
    aug = lambda k, x: diffaug.augment(cfg, k, x)
    w_cycle = annealed_weight(
        cfg, cfg.cycle_weight, cfg.cycle_weight_final, state.step
    )
    w_ident = annealed_weight(
        cfg, cfg.identity_weight, cfg.identity_weight_final, state.step
    )

    def g_loss_fn(g_params, d_params):
        fake = cond_lib.conditional_unet_apply(cfg, g_params, images, targets)
        adv = adversarial_loss(
            cfg,
            d_lib.discriminator_apply(cfg, d_params, aug(k_gf, fake), targets),
            True,
            True,
        )
        # zero-weight terms are elided (each is a full generator forward
        # XLA cannot DCE while the value feeds metrics); disabled → 0
        zero = jnp.zeros((), jnp.float32)
        cycle = (
            _l1(cond_lib.conditional_unet_apply(cfg, g_params, fake, labels), images)
            if cfg.cycle_term_active
            else zero
        )
        ident = (
            _l1(
                cond_lib.conditional_unet_apply(cfg, g_params, images, labels),
                images,
            )
            if cfg.identity_term_active
            else zero
        )
        # reconstruction anchors the transfer to its INPUT (unpaired data),
        # exactly as in gan.gan_train_step — the knob was silently ignored
        # in conditional mode (review r4)
        recon = (
            _l1(fake, images) if cfg.reconstruction_weight > 0 else zero
        )
        total = (
            cfg.adversarial_weight * adv
            + w_cycle * cycle
            + w_ident * ident
            + cfg.reconstruction_weight * recon
        )
        return total, (fake, adv, cycle, ident)

    def d_loss_fn(d_params, fake):
        real = aug(k_dr, images)
        real_logits = d_lib.discriminator_apply(cfg, d_params, real, labels)
        fake_logits = d_lib.discriminator_apply(
            cfg, d_params, aug(k_df, fake), targets
        )
        loss = 0.5 * (
            adversarial_loss(cfg, real_logits, True, False)
            + adversarial_loss(cfg, fake_logits, False, False)
        )
        r1 = jnp.zeros((), jnp.float32)
        if cfg.r1_weight > 0:
            # R1 at D's actual (augmented) real input, class held fixed
            r1 = r1_penalty(cfg, d_params, real, labels)
            loss = loss + 0.5 * cfg.r1_weight * r1
        return loss, r1

    (g_loss, (fake, adv, cycle, ident)), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True
    )(state.generator, state.discriminator)
    (d_loss, r1), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
        state.discriminator, jax.lax.stop_gradient(fake)
    )

    g_updates, g_opt = g_optimizer.update(g_grads, state.g_opt, state.generator)
    generator = optax.apply_updates(state.generator, g_updates)
    d_updates, d_opt = d_optimizer.update(
        d_grads, state.d_opt, state.discriminator
    )
    discriminator = optax.apply_updates(state.discriminator, d_updates)

    # shared gated blend: under grad_accum the EMA moves only on APPLIED
    # updates (trainer.ema_update; review r4 — same fix as gan.py)
    ema = trainer_lib.ema_update(cfg, state.ema_generator, generator, g_opt)

    new_state = ConditionalGANState(
        state.step + 1, generator, discriminator, g_opt, d_opt, ema
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


def make_conditional_gan_train_step(cfg):
    g_opt = make_optimizer(cfg)
    d_opt = _d_optimizer(cfg)  # honors cfg.d_learning_rate like gan.py

    def step(state, batch, rng):
        return conditional_gan_train_step(cfg, g_opt, d_opt, state, batch, rng)

    donate = (0,) if cfg.donate_state else ()
    return jax.jit(step, donate_argnums=donate)


def select_generator(state: ConditionalGANState, use_ema=True):
    """The generator param tree (EMA when kept)."""
    return (
        state.ema_generator
        if (use_ema and state.ema_generator is not None)
        else state.generator
    )


def make_transfer_fn(cfg, mesh=None):
    """Jitted ``(g_params, images, target_vec) -> transferred`` forward,
    data-parallel over the mesh's data axis (the per-sample target vector
    pads and shards alongside the batch) — the eval/serving-side sibling
    of ``transfer``."""
    from ..parallel import mesh as mesh_lib

    return mesh_lib.make_data_parallel_apply(
        mesh, lambda p, x, t: cond_lib.conditional_unet_apply(cfg, p, x, t)
    )


def transfer(cfg, state: ConditionalGANState, images, target_class, use_ema=True):
    """Transfer a batch to ``target_class`` (scalar or (B,) int)."""
    target = jnp.broadcast_to(jnp.asarray(target_class), (images.shape[0],))
    return cond_lib.conditional_unet_apply(
        cfg, select_generator(state, use_ema), images, target
    )
