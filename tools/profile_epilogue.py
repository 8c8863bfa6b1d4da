"""Per-layer epilogue-cost microbenchmark (TPU).

VERDICT r1 next #2: the profiled ~6-7 ms/step standalone
`broadcast_maximum_fusion` VPU passes are ReLU epilogues XLA does not fuse
into conv outputs. This tool measures, for every conv layer of the 256²
U-Net at the flagship operating point (bf16, b128), forward time of
  (a) conv only
  (b) conv + bias + relu
The delta (b)-(a) is the unfused epilogue cost = the per-layer opportunity
for a Pallas fused conv. Prints one JSON line per layer.

Timing per axon-platform rules (utils/profiler.py): sync by fetching a
value, never block_until_ready.

Usage: python tools/profile_epilogue.py [--batch 128] [--iters 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def layer_shapes(size=256, octaves=6, pixel=128, maxc=512):
    downs, ups = [], []
    c_in = 3
    s = size
    for i in range(octaves):
        f = min(pixel * (2 ** i), maxc)
        downs.append(("down%d" % i, s, c_in, f))
        c_in = f
        s //= 2
    # up path: input channels = prev out (+ concat skip for i<octaves-1)
    c = c_in  # bottleneck channels
    for i in reversed(range(octaves)):
        u = min(pixel * (2 ** i) // 2, maxc)
        ups.append(("up%d" % i, s, c, u))
        s *= 2
        skip_c = 3 if i == 0 else min(pixel * (2 ** (i - 1)), maxc)
        c = u + skip_c
    return downs, ups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.ops import conv as conv_ops

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    dt = jnp.dtype(args.dtype)
    r = np.random.default_rng(0)

    def timeit(fn, *xs):
        y = fn(*xs)
        float(jnp.sum(y.astype(jnp.float32)))  # warm + sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = fn(*xs)
        float(jnp.sum(y.astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.iters * 1000

    downs, ups = layer_shapes()
    total_delta = 0.0
    for kind, layers in (("down", downs), ("up", ups)):
        op = conv_ops.conv2d if kind == "down" else conv_ops.conv2d_transpose
        for name, s, cin, cout in layers:
            x = jnp.asarray(
                r.normal(size=(args.batch, s, s, cin)).astype(np.float32), dt
            )
            k = jnp.asarray(
                r.normal(size=(4, 4, cin, cout)).astype(np.float32) * 0.05, dt
            )
            b = jnp.zeros((cout,), dt)

            plain = jax.jit(lambda x, k: op(x, k, None, stride=2, relu=False))
            fused = jax.jit(lambda x, k, b: op(x, k, b, stride=2, relu=True))
            t_plain = timeit(plain, x, k)
            t_fused = timeit(fused, x, k, b)
            delta = t_fused - t_plain
            total_delta += delta
            print(json.dumps({
                "layer": name, "spatial": s, "cin": cin, "cout": cout,
                "conv_ms": round(t_plain, 3),
                "conv_bias_relu_ms": round(t_fused, 3),
                "epilogue_ms": round(delta, 3),
            }), flush=True)
    print(json.dumps({"total_epilogue_ms": round(total_delta, 3),
                      "batch": args.batch, "dtype": args.dtype}), flush=True)


if __name__ == "__main__":
    main()
