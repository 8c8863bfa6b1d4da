"""PP fused-kernel gating spot check on real TPU hardware (NEXT.md on-chip
backlog, r3e).

Only one chip exists here, so both pipeline stages are placed on the SAME
device (devices=[d, d]) — performance-meaningless, but it executes the real
PP program path on real hardware with `fused_diffusion=True`: the _prep
program must take the Mosaic fused forward-diffusion kernel (lane-aligned
single-device route, trainer.draw_and_diffuse gating) and the stage
programs must run and match the single-device step's loss from identical
(params, batch, rng).

Prints one JSON line {pp_loss, ref_loss, fused_kernel_taken, ok}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
    except Exception:
        pass

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.parallel import pipeline as pp
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    assert jax.default_backend() == "tpu", "spot check must run on the chip"
    d = jax.devices()[0]

    # lane-aligned shapes (H*W*C % 128 == 0) so the fused gate opens
    cfg = Config(
        size=64, pixel_size=32, max_size=128, octaves=3, steps=10,
        batch_size=8, compute_dtype="bfloat16", fused_diffusion=True,
        pipeline_stages=2, pipeline_microbatches=2,
        checkpoint_dir=None, donate_state=False, warm_up=0,
    ).validate()

    # the gate draw_and_diffuse takes (single-device, lane-aligned)
    fused_taken = (
        cfg.fused_diffusion
        and cfg.parameterization == "x"
        and (cfg.size * cfg.size * 3) % 128 == 0
    )

    batch = jnp.asarray(
        np.random.default_rng(0)
        .uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3))
        .astype(np.float32)
    )
    state0 = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))

    tr = pp.PipelineTrainer(cfg, devices=[d, d])
    pp_state, pp_loss = tr.step(
        tr.place_state(state0), batch, jax.random.PRNGKey(1)
    )

    ref_step = trainer_lib.make_train_step(
        cfg.replace(pipeline_stages=1, donate_state=False)
    )
    _, ref_loss = ref_step(state0, batch, jax.random.PRNGKey(1))

    pp_l, ref_l = float(pp_loss), float(ref_loss)
    ok = np.isfinite(pp_l) and abs(pp_l - ref_l) < 5e-3  # bf16 program pair
    print(json.dumps({
        "pp_loss": round(pp_l, 6), "ref_loss": round(ref_l, 6),
        "fused_kernel_taken": fused_taken, "backend": jax.default_backend(),
        "ok": bool(ok),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
