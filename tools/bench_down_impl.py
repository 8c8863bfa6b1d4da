"""Compare strided-conv lowerings for the DOWN convs on TPU.

Trace analysis (tools/trace_step.py, r2) shows up-convs near MXU peak but
down convs at ~35%: XLA's strided k4/s2 emitter is the weak one. This
benchmarks lax strided conv vs the space-to-depth 2x2 reformulation
(ops/conv.conv2d_down_shuffle) per layer, fwd and fwd+bwd, at b128 bf16.
"""

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

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    layers = [  # (name, spatial_in, cin, cout)
        ("down0", 256, 3, 128),
        ("down1", 128, 128, 256),
        ("down2", 64, 256, 512),
        ("down3", 32, 512, 512),
        ("down4", 16, 512, 512),
        ("down5", 8, 512, 512),
    ]
    r = np.random.default_rng(0)

    def timeit(fn, *xs, iters=8):
        y = fn(*xs)
        float(jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*xs)
        float(jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1000

    for name, s, cin, cout in layers:
        x = jnp.asarray(r.normal(size=(B, s, s, cin)).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(r.normal(size=(4, 4, cin, cout)).astype(np.float32) * 0.05,
                        jnp.bfloat16)
        b = jnp.zeros((cout,), jnp.bfloat16)
        flops = 2 * B * (s // 2) ** 2 * 16 * cin * cout

        lax_f = jax.jit(lambda x, k, b: C.conv2d(x, k, b, stride=2, relu=True))
        shf_f = jax.jit(lambda x, k, b: C.conv2d_down_shuffle(x, k, b, relu=True))
        lax_g = jax.jit(jax.grad(
            lambda x, k, b: jnp.sum(C.conv2d(x, k, b, stride=2, relu=True)
                                    .astype(jnp.float32) ** 2), argnums=(0, 1)))
        shf_g = jax.jit(jax.grad(
            lambda x, k, b: jnp.sum(C.conv2d_down_shuffle(x, k, b, relu=True)
                                    .astype(jnp.float32) ** 2), argnums=(0, 1)))
        row = {"layer": name, "gflop_fwd": round(flops / 1e9, 1)}
        row["lax_fwd_ms"] = round(timeit(lax_f, x, k, b), 3)
        row["shuffle_fwd_ms"] = round(timeit(shf_f, x, k, b), 3)
        row["lax_fwdbwd_ms"] = round(timeit(lax_g, x, k, b), 3)
        row["shuffle_fwdbwd_ms"] = round(timeit(shf_g, x, k, b), 3)
        row["lax_fwd_mxu_pct"] = round(flops / (row["lax_fwd_ms"] / 1e3) / 197e12 * 100, 1)
        row["shuffle_fwd_mxu_pct"] = round(flops / (row["shuffle_fwd_ms"] / 1e3) / 197e12 * 100, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
