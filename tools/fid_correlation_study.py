"""Correlation study: does the pinned FID proxy track visual quality?

(VERDICT r2 next #1 'Done' criterion.) Trains the diffusion model on a
synthetic corpus, snapshots at a ladder of step counts, and at each
checkpoint records:

  * trained-FID  — samples vs a DISJOINT eval draw, pinned extractor
  * random-FID   — same, fixed-seed random-conv extractor (the old proxy)
  * preview RMSE — the reference's own quality scalar ('example loss',
                   train.py:357-361) averaged over eval images
  * a sample grid PNG (docs/fid_grids/step_<N>.png) for visual inspection

Writes the table + Spearman rank correlations into docs/FID.md.

Usage: python tools/fid_correlation_study.py [--max-steps 8000]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def spearman(a, b) -> float:
    import numpy as np

    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra**2).sum() * (rb**2).sum())
    return float((ra * rb).sum() / denom) if denom else 0.0


def grid_png(images, path, cols: int = 4):
    from gan_class_transfer2_tpu.utils.grid import grid_png as _g

    _g(images, path, cols)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steps", type=int, default=8000)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.data import synthetic
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset
    from gan_class_transfer2_tpu.sample import sampler
    from gan_class_transfer2_tpu.train import trainer as trainer_lib
    from gan_class_transfer2_tpu.utils import metrics

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        size=64, pixel_size=32, max_size=64, octaves=4, steps=50,
        batch_size=64, learning_rate=2e-4, warm_up=100, ema_decay=0.999,
        compute_dtype="bfloat16" if on_tpu else "float32",
        fused_diffusion=False, checkpoint_dir=None, donate_state=False,
        test_step=6,
    ).validate()

    train_images = synthetic.circles(2048, cfg.size, seed=0)
    eval_images = synthetic.circles(128, cfg.size, seed=9999)  # disjoint draw
    ds = ArrayDataset(train_images, cfg.batch_size, seed=0)
    it = iter(ds)

    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    step_fn = trainer_lib.make_train_step(cfg)
    preview_fn = jax.jit(
        lambda p, x, n: sampler.preview(cfg, p, x, n)[1]
    )
    sample_fn = jax.jit(lambda p, b: sampler.sample(cfg, p, b).images)

    ladder = [0, 250, 500, 1000, 2000, 4000, 8000]
    ladder = [s for s in ladder if s <= args.max_steps]
    rng = jax.random.fold_in(jax.random.PRNGKey(0), 17)
    eval_noise = jnp.asarray(
        np.random.default_rng(5).normal(
            size=(len(eval_images), cfg.size, cfg.size, 3)
        ).astype(np.float32)
    )
    sample_init = jnp.asarray(
        np.random.default_rng(6).normal(
            size=(64, cfg.size, cfg.size, 3)
        ).astype(np.float32)
    )
    trained_x = metrics.get_extractor("trained")
    random_x = metrics.get_extractor("random")

    rows = []
    done = 0
    for target in ladder:
        while done < target:
            batch = jnp.asarray(next(it))
            state, loss = step_fn(state, batch, rng)
            done += 1
        float(loss) if target else None  # sync (axon rule: fetch a value)
        params = state.ema_params if target else state.params
        samples = np.asarray(sample_fn(params, sample_init))
        rmse = float(
            preview_fn(params, jnp.asarray(eval_images), eval_noise)
        )
        f_trained = metrics.fid(samples, eval_images, extractor=trained_x)
        f_random = metrics.fid(samples, eval_images, extractor=random_x)
        grid_png(samples, os.path.join(REPO, "docs", "fid_grids",
                                       f"step_{target}.png"))
        rows.append((target, f_trained, f_random, rmse))
        print(json.dumps({
            "step": target, "fid_trained": round(f_trained, 4),
            "fid_random": round(f_random, 4), "preview_rmse": round(rmse, 4),
        }), flush=True)

    steps = [r[0] for r in rows]
    ft = [r[1] for r in rows]
    fr = [r[2] for r in rows]
    rm = [r[3] for r in rows]
    corr_t_rmse = spearman(ft, rm)
    corr_r_rmse = spearman(fr, rm)
    corr_t_step = spearman(ft, [-s for s in steps])

    md = [
        "# FID methodology and proxy validation",
        "",
        "True FID needs pretrained Inception weights; none exist in this",
        "zero-egress environment (no keras/torch/HF caches — verified).",
        "The framework therefore PINS a committed, trained feature",
        "extractor: an 8-way shape classifier",
        "(`tools/train_fid_extractor.py`, weights at",
        "`gan_class_transfer2_tpu/weights/fid_extractor.npz`) whose",
        "penultimate 256-d features embed shape/texture/layout. The",
        "fixed-seed random-conv projection of rounds 1–2 remains available",
        "as `fid_extractor=\"random\"`.",
        "",
        "## Does the proxy track quality?",
        "",
        "One diffusion run (64² circles corpus, disjoint eval draw),",
        "checkpoint ladder; per checkpoint: trained-FID, the old random-FID,",
        "the reference's own preview-RMSE scalar, and a sample grid",
        "(`docs/fid_grids/step_*.png` — inspect them alongside this table).",
        "",
        "| step | FID (trained) | FID (random) | preview RMSE |",
        "|---|---|---|---|",
    ]
    for target, a, b, c in rows:
        md.append(f"| {target} | {a:.4f} | {b:.4f} | {c:.4f} |")
    md += [
        "",
        f"Spearman(trained-FID, preview-RMSE) = **{corr_t_rmse:+.3f}**; "
        f"Spearman(random-FID, preview-RMSE) = {corr_r_rmse:+.3f}; "
        f"Spearman(trained-FID, training progress) = {corr_t_step:+.3f}.",
        "",
        "A correlation near +1 between the proxy and RMSE (and a strong",
        "negative trend over training) is the acceptance criterion: the",
        "pinned extractor's score moves with the independent quality",
        "signals. Regenerate with `python tools/fid_correlation_study.py`.",
        "",
    ]
    out = os.path.join(REPO, "docs", "FID.md")
    with open(out, "w") as f:
        f.write("\n".join(md))
    print(f"wrote {out}")
    print(json.dumps({
        "spearman_trained_vs_rmse": round(corr_t_rmse, 3),
        "spearman_random_vs_rmse": round(corr_r_rmse, 3),
        "spearman_trained_vs_progress": round(corr_t_step, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
