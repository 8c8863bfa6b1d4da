"""Flagship-scale validation of compiled model bundles (utils/bundle.py).

Exports the 256², 41.7 M-param denoiser's `sample` program as a bundle,
then measures bundle-served reverse-diffusion throughput against the live
jitted sampler on the same device — the deployment question is whether the
sealed artifact pays any steady-state cost vs in-process jit (it should
not: both run the same XLA program; the bundle only fixes the weights as
constants instead of arguments).

Prints one JSON line:
  {"bundle_mb": ..., "export_s": ..., "bundle_img_s": ..., "live_img_s": ...}

Run on the chip (default platform) or --platform cpu at tiny shapes.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=("tpu", "cpu"), default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--octaves", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", type=str, default="/tmp/gct2_flagship_bundle")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.sample import sampler
    from gan_class_transfer2_tpu.train import trainer as trainer_lib
    from gan_class_transfer2_tpu.utils import bundle as bundle_lib

    cfg = Config(
        size=args.size, steps=args.steps, octaves=args.octaves,
        compute_dtype="bfloat16", batch_size=args.batch,
    )
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))

    platform = jax.devices()[0].platform
    t0 = time.monotonic()
    manifest = bundle_lib.export_bundle(
        cfg, state, args.out, programs=("sample",), platforms=(platform,)
    )
    export_s = time.monotonic() - t0
    # count only THIS export's files (a reused --out dir may hold stale
    # programs from a previous run with a different program set)
    size_mb = (
        os.path.getsize(os.path.join(args.out, "manifest.json"))
        + sum(
            os.path.getsize(os.path.join(args.out, p["file"]))
            for p in manifest["programs"].values()
        )
    ) / 1e6

    bundle = bundle_lib.load_bundle(args.out)
    init = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(args.batch, cfg.size, cfg.size, 3))
        .astype(np.float32)
    )

    def timed(fn):
        float(fn()[0, 0, 0, 0])  # compile + sync by value fetch
        best = float("inf")
        for _ in range(args.reps):
            t = time.monotonic()
            float(fn()[0, 0, 0, 0])
            best = min(best, time.monotonic() - t)
        return args.batch / best

    bundle_img_s = timed(lambda: bundle.call("sample", init))

    live = jax.jit(lambda p, b: sampler.sample(cfg, p, b).images)
    live_img_s = timed(lambda: live(state.params, init))

    print(json.dumps({
        "platform": platform,
        "batch": args.batch,
        "size": args.size,
        "steps": args.steps,
        "bundle_mb": round(size_mb, 1),
        "export_s": round(export_s, 1),
        "bundle_img_s": round(bundle_img_s, 2),
        "live_img_s": round(live_img_s, 2),
        "ratio": round(bundle_img_s / live_img_s, 3),
    }))


if __name__ == "__main__":
    main()
