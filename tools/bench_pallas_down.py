"""TPU microbench: Pallas fused down-conv vs lax strided conv per layer."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.ops import conv as C
    from gan_class_transfer2_tpu.ops import pallas_conv as PC

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    layers = [("down1", 128, 128, 256), ("down2", 64, 256, 512),
              ("down3", 32, 512, 512)]
    r = np.random.default_rng(0)

    def timeit(fn, *xs, iters=10):
        y = fn(*xs)
        float(jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*xs)
        float(jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1000

    for name, s, cin, cout in layers:
        x = jnp.asarray(r.normal(size=(B, s, s, cin)).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray((r.normal(size=(4, 4, cin, cout)) * 0.05).astype(np.float32),
                        jnp.bfloat16)
        b = jnp.zeros((cout,), jnp.bfloat16)
        flops = 2 * B * (s // 2) ** 2 * 16 * cin * cout

        lax_f = jax.jit(lambda x, k, b: C.conv2d(x, k, b, stride=2, relu=True))
        pal_f = jax.jit(lambda x, k, b: PC.down_conv_fused(x, k, b, True, False))
        row = {"layer": name}
        row["lax_fwd_ms"] = round(timeit(lax_f, x, k, b), 3)
        try:
            row["pallas_fwd_ms"] = round(timeit(pal_f, x, k, b), 3)
        except Exception as e:
            row["pallas_error"] = f"{type(e).__name__}: {str(e)[:200]}"
            print(json.dumps(row), flush=True)
            continue
        # value check on-device
        ya = np.asarray(lax_f(x, k, b), np.float32)
        yb = np.asarray(pal_f(x, k, b), np.float32)
        row["max_abs_err"] = float(np.abs(ya - yb).max())

        lax_g = jax.jit(jax.grad(lambda x, k, b: jnp.sum(
            C.conv2d(x, k, b, stride=2, relu=True).astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        pal_g = jax.jit(jax.grad(lambda x, k, b: jnp.sum(
            PC.down_conv_fused(x, k, b, True, False).astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        row["lax_fwdbwd_ms"] = round(timeit(lax_g, x, k, b), 3)
        row["pallas_fwdbwd_ms"] = round(timeit(pal_g, x, k, b), 3)
        row["pallas_fwd_pct_peak"] = round(
            flops / (row["pallas_fwd_ms"] / 1e3) / 197e12 * 100, 1)
        row["lax_fwd_pct_peak"] = round(
            flops / (row["lax_fwd_ms"] / 1e3) / 197e12 * 100, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
