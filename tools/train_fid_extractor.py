"""Train the pinned FID feature extractor (utils/fid_extractor.py).

8-way shape classification on the deterministic synthetic corpus
(data/synthetic.SHAPE_CLASSES) at 64², with augmentation (flip, shift,
brightness/contrast jitter, additive noise) so the penultimate features
encode shape/texture/layout robustly rather than pixel positions. Fixed
seeds end-to-end — re-running reproduces the committed weights' accuracy.

Usage: python tools/train_fid_extractor.py [--steps 3000] [--platform cpu]
Writes gan_class_transfer2_tpu/weights/fid_extractor.npz and prints held-out
accuracy (expected > 0.97).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n-per-class", type=int, default=2000)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    import optax

    from gan_class_transfer2_tpu.data import synthetic
    from gan_class_transfer2_tpu.utils import fid_extractor as fx

    size = fx.INPUT_SIZE
    print("generating corpus...", flush=True)
    images, labels = [], []
    for k, (name, fn) in enumerate(synthetic.SHAPE_CLASSES):
        images.append(fn(args.n_per_class, size=size, seed=k))
        labels.append(np.full((args.n_per_class,), k, np.int32))
    images = np.concatenate(images, 0)
    labels = np.concatenate(labels, 0)

    # held-out split (never trained on): last 10% of a fixed permutation
    order = np.random.default_rng(123).permutation(len(images))
    n_eval = len(images) // 10
    eval_x = images[order[:n_eval]]
    eval_y = labels[order[:n_eval]]
    train_x = images[order[n_eval:]]
    train_y = labels[order[n_eval:]]

    params = fx.init_params(jax.random.PRNGKey(42))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def augment(x, rng):
        """Flip, pad+shift, brightness/contrast jitter, additive noise —
        all batched, jit-traceable."""
        n = x.shape[0]
        r1, r2, r3, r4, r5, r6 = jax.random.split(rng, 6)
        flip = jax.random.bernoulli(r1, 0.5, (n, 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1], x)
        # shift by up to ±4 px via pad + dynamic crop (vmapped)
        pad = 4
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        offs = jax.random.randint(r2, (n, 2), 0, 2 * pad + 1)

        def crop(img, off):
            return jax.lax.dynamic_slice(
                img, (off[0], off[1], 0), (size, size, 3)
            )

        x = jax.vmap(crop)(xp, offs)
        bright = jax.random.uniform(r3, (n, 1, 1, 1), minval=-0.15, maxval=0.15)
        contrast = jax.random.uniform(r4, (n, 1, 1, 1), minval=0.85, maxval=1.15)
        x = (x + bright) * contrast
        noise = 0.05 * jax.random.normal(r5, x.shape)
        x = jnp.clip(x + noise, -1.0, 0.992)
        del r6
        return x

    def loss_fn(p, x, y, rng):
        lg = fx.logits(p, augment(x, rng))
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(lg, y)
        )

    @jax.jit
    def step(p, o, x, y, rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y, rng)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    @jax.jit
    def accuracy(p, x, y):
        return jnp.mean(jnp.argmax(fx.logits(p, x), -1) == y)

    rng = np.random.default_rng(7)
    key = jax.random.PRNGKey(7)
    for i in range(args.steps):
        idx = rng.integers(0, len(train_x), args.batch)
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(train_x[idx]),
            jnp.asarray(train_y[idx]), sub,
        )
        if (i + 1) % 500 == 0:
            accs = [
                float(accuracy(params, jnp.asarray(eval_x[j : j + 256]),
                               jnp.asarray(eval_y[j : j + 256])))
                for j in range(0, len(eval_x), 256)
            ]
            print(
                f"step {i+1}: loss {float(loss):.4f} "
                f"held-out acc {np.mean(accs):.4f}",
                flush=True,
            )

    accs = [
        float(accuracy(params, jnp.asarray(eval_x[j : j + 256]),
                       jnp.asarray(eval_y[j : j + 256])))
        for j in range(0, len(eval_x), 256)
    ]
    acc = float(np.mean(accs))
    out = args.out or fx.WEIGHTS_PATH
    fx.save_params(params, out)
    print(f"held-out accuracy {acc:.4f}; wrote {out}", flush=True)
    return 0 if acc > 0.9 else 1


if __name__ == "__main__":
    sys.exit(main())
