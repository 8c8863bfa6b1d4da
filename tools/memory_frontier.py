"""Memory frontier measurement: the >=512² regime (VERDICT r1 next #10).

Compiles (no execute) the 512² training step on the real TPU and reports
XLA's memory analysis with remat on/off at several batch sizes — the
remat-vs-batch frontier data NEXT.md calls for — plus the analytic ZeRO-1
optimizer-state saving per data-parallel rank.

Usage: python tools/memory_frontier.py [--size 512] [--batches 16,32,64]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--moment-dtype", default="float32",
                    help="Adam moment storage (float32|bfloat16; bfloat16 "
                    "requires --optimizer adam_tf/adam_fused)")
    ap.add_argument("--optimizer", default="adam")
    ap.add_argument(
        "--spatial", action="store_true",
        help="measure the spatially-sharded path instead: compile the "
        "spatial train step (1-shard mesh on the real chip — per-shard "
        "memory at N shards is ~1/N of this) with concat elision on/off, "
        "reporting the elision delta (VERDICT r2 weak #7 frontier update)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    hbm_gb = 16.0  # v5e

    if args.spatial:
        # the shard_map halo-exchange route (parallel/spatial_unet.py):
        # compile forward+grad of the spatially-sharded apply with concat
        # elision on/off. 1-shard mesh on the real chip — per-shard memory
        # at N shards is ~1/N of this; the elision DELTA is the new datum.
        from gan_class_transfer2_tpu.models import unet
        from gan_class_transfer2_tpu.parallel import spatial_train, spatial_unet

        mesh = spatial_train.make_spatial_mesh(1)
        for b in [int(x) for x in args.batches.split(",")]:
            for elide in (False, True):
                cfg = Config(size=args.size, batch_size=b,
                             compute_dtype="bfloat16", warm_up=0,
                             concat_elision=elide, fused_diffusion=False,
                             checkpoint_dir=None, donate_state=True)
                fn = spatial_unet.make_spatial_unet_apply(cfg, mesh)

                def loss(p, x):
                    return jnp.mean(fn(p, x).astype(jnp.float32) ** 2)

                abstract = jax.eval_shape(
                    lambda r: unet.init_unet(r, cfg), jax.random.PRNGKey(0)
                )
                row = {"path": "spatial-shardmap", "size": args.size,
                       "batch": b, "concat_elision": elide}
                try:
                    compiled = jax.jit(jax.grad(loss)).lower(
                        abstract,
                        jax.ShapeDtypeStruct(
                            (b, args.size, args.size, 3), jnp.float32
                        ),
                    ).compile()
                    mem = compiled.memory_analysis()
                    temp = mem.temp_size_in_bytes
                    arg = mem.argument_size_in_bytes
                    row.update({
                        "temp_gb": round(temp / 1e9, 2),
                        "args_gb": round(arg / 1e9, 2),
                        "total_gb": round((temp + arg) / 1e9, 2),
                        "fits_v5e_16gb": (temp + arg) / 1e9 < hbm_gb,
                    })
                except Exception as e:  # noqa: BLE001
                    row["error"] = f"{type(e).__name__}: {str(e)[:160]}"
                print(json.dumps(row), flush=True)
        return

    for b in [int(x) for x in args.batches.split(",")]:
        for remat in (False, True):
            cfg = Config(size=args.size, batch_size=b,
                         compute_dtype="bfloat16", remat=remat,
                         fused_diffusion=True, warm_up=0,
                         checkpoint_dir=None, donate_state=True,
                         optimizer=args.optimizer,
                         moment_dtype=args.moment_dtype)
            optimizer = trainer_lib.make_optimizer(cfg)

            def step(state, batch, rng):
                return trainer_lib.train_step(cfg, optimizer, state, batch, rng)

            abstract = jax.eval_shape(
                lambda r: trainer_lib.init_state(cfg, r), jax.random.PRNGKey(0)
            )
            row = {"size": args.size, "batch": b, "remat": remat}
            try:
                compiled = jax.jit(step, donate_argnums=(0,)).lower(
                    abstract,
                    jax.ShapeDtypeStruct((b, args.size, args.size, 3), jnp.float32),
                    jax.ShapeDtypeStruct((2,), jnp.uint32),
                ).compile()
                mem = compiled.memory_analysis()
                temp = mem.temp_size_in_bytes
                arg = mem.argument_size_in_bytes
                row.update({
                    "temp_gb": round(temp / 1e9, 2),
                    "args_gb": round(arg / 1e9, 2),
                    "total_gb": round((temp + arg) / 1e9, 2),
                    "fits_v5e_16gb": (temp + arg) / 1e9 < hbm_gb,
                })
            except Exception as e:  # noqa: BLE001 — OOM at compile is data too
                row["error"] = f"{type(e).__name__}: {str(e)[:160]}"
            print(json.dumps(row), flush=True)

    # analytic ZeRO-1 saving: Adam moments are 2 x params x 4 B
    from gan_class_transfer2_tpu.models import unet

    cfg = Config(size=args.size, compute_dtype="bfloat16")
    n_params = unet.param_count(
        jax.eval_shape(lambda r: unet.init_unet(r, cfg), jax.random.PRNGKey(0))
    )
    moments_gb = 2 * n_params * 4 / 1e9
    print(json.dumps({
        "zero1_analytics": {
            "params": n_params,
            "adam_moments_gb_unsharded": round(moments_gb, 3),
            "per_rank_gb_at_data8": round(moments_gb / 8, 3),
            "freed_per_rank_gb_at_data8": round(moments_gb * 7 / 8, 3),
        }
    }))


if __name__ == "__main__":
    main()
