"""Verify FusedProp-style computation sharing in the GAN train step.

NEXT.md (round 2 perf): the step hands the G-loss's stop_gradient'd fakes to
the D-loss inside ONE XLA program (train/gan.py:172-177), so the generator
forward is shared *by construction*. What is NOT structurally guaranteed is
whether XLA's CSE also merges the discriminator forwards that appear twice
on the same fake images — once inside the G-loss gradient (for the
adversarial term) and once inside the D-loss gradient.

This tool compiles (a) the real step and (b) a deliberately UNSHARED variant
whose D-loss recomputes the fakes with its own generator forward, and counts
convolution ops in the optimized HLO of each. The delta quantifies exactly
how much compute the hand-sharing saves, and whether further FusedProp work
(PAPERS.md) has anything left to claim.

Usage: python tools/verify_gan_sharing.py   (CPU; tiny shapes)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def conv_count(compiled) -> int:
    text = compiled.as_text()
    return sum(
        1
        for line in text.splitlines()
        if "convolution(" in line or "convolution-base-dilated(" in line
    )


def main():
    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train import gan as gan_lib

    cfg = tiny_test_config(
        size=16, pixel_size=4, max_size=8, octaves=2, batch_size=2,
        donate_state=False,
    )
    rng = jax.random.PRNGKey(0)
    state = gan_lib.init_gan_state(cfg, rng)
    r = np.random.default_rng(0)
    a = jnp.asarray(r.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    b = jnp.asarray(r.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))

    shared = jax.jit(gan_lib.make_gan_train_step(cfg)).lower(
        state, a, b, rng
    ).compile()

    # Unshared variant: D-loss regenerates the fakes itself (what a naive
    # "alternate two separate steps" implementation would do).
    g_opt = gan_lib.make_optimizer(cfg)
    d_opt = gan_lib._d_optimizer(cfg)

    def unshared_step(state, batch_a, batch_b, rng):
        import optax

        from gan_class_transfer2_tpu.models import discriminator as d_lib

        g_params = {"ab": state.g_ab, "ba": state.g_ba}
        d_params = {"a": state.d_a, "b": state.d_b}

        def g_loss(gp):
            fake_b = gan_lib._generate(cfg, gp["ab"], batch_a)
            fake_a = gan_lib._generate(cfg, gp["ba"], batch_b)
            adv = gan_lib.adversarial_loss(
                cfg, d_lib.discriminator_apply(cfg, d_params["b"], fake_b),
                True, True,
            ) + gan_lib.adversarial_loss(
                cfg, d_lib.discriminator_apply(cfg, d_params["a"], fake_a),
                True, True,
            )
            cycle = gan_lib._l1(
                gan_lib._generate(cfg, gp["ba"], fake_b), batch_a
            ) + gan_lib._l1(gan_lib._generate(cfg, gp["ab"], fake_a), batch_b)
            ident = gan_lib._l1(
                gan_lib._generate(cfg, gp["ab"], batch_b), batch_b
            ) + gan_lib._l1(gan_lib._generate(cfg, gp["ba"], batch_a), batch_a)
            recon = gan_lib._l1(fake_b, batch_a) + gan_lib._l1(fake_a, batch_b)
            return (
                cfg.adversarial_weight * adv
                + cfg.cycle_weight * cycle
                + cfg.identity_weight * ident
                + cfg.reconstruction_weight * recon
            )

        def d_loss_real(dp):
            # regenerates the fakes — the duplication the real step avoids
            fake_b = jax.lax.stop_gradient(
                gan_lib._generate(cfg, g_params["ab"], batch_a)
            )
            fake_a = jax.lax.stop_gradient(
                gan_lib._generate(cfg, g_params["ba"], batch_b)
            )
            loss = 0.0
            for dname, real, fake in (
                ("a", batch_a, fake_a),
                ("b", batch_b, fake_b),
            ):
                loss = loss + gan_lib.adversarial_loss(
                    cfg, d_lib.discriminator_apply(cfg, dp[dname], real),
                    True, False,
                ) + gan_lib.adversarial_loss(
                    cfg, d_lib.discriminator_apply(cfg, dp[dname], fake),
                    False, False,
                )
            return loss * 0.5

        g_l, g_grads = jax.value_and_grad(g_loss)(g_params)
        d_l, d_grads = jax.value_and_grad(d_loss_real)(d_params)
        g_updates, g_o = g_opt.update(g_grads, state.g_opt, g_params)
        gp = optax.apply_updates(g_params, g_updates)
        d_updates, d_o = d_opt.update(d_grads, state.d_opt, d_params)
        dp = optax.apply_updates(d_params, d_updates)
        return gan_lib.GANState(
            state.step + 1, gp["ab"], gp["ba"], dp["a"], dp["b"], g_o, d_o,
            state.ema_g_ab, state.ema_g_ba,
        ), {"g_loss": g_l, "d_loss": d_l}

    unshared = jax.jit(unshared_step).lower(state, a, b, rng).compile()

    n_shared = conv_count(shared)
    n_unshared = conv_count(unshared)
    print(f"optimized-HLO convolution ops: shared={n_shared} "
          f"unshared={n_unshared} (saved {n_unshared - n_shared})")
    if n_shared < n_unshared:
        print("hand-sharing is load-bearing: XLA did NOT CSE the regenerated "
              "fakes in the unshared variant")
    elif n_shared == n_unshared:
        print("XLA CSE'd the duplicate generator forwards — sharing is free "
              "either way")
    else:
        print("unexpected: shared step has MORE convs than unshared")


if __name__ == "__main__":
    main()
