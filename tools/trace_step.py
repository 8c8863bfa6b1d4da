"""Trace the flagship train step on TPU and print the op-time breakdown.

Captures a jax.profiler trace of N steps of the b128 bf16 training step,
parses the xplane proto (via TF's xplane_pb2, installed in this image), and
aggregates device-plane event durations by op name — the data that tells us
exactly which fusions the 31% MXU-utilization gap lives in (VERDICT r1
next #2).

Usage: python tools/trace_step.py [--batch 128] [--steps 3] [--top 40]
"""

import argparse
import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(path: str, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    rows = []
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        agg = defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps / 1e9  # -> ms
                agg[name][1] += 1
        for name, (ms, n) in agg.items():
            rows.append((ms, n, name, plane.name))
    rows.sort(reverse=True)
    return rows[:top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--octaves", type=int, default=6)
    ap.add_argument("--out", default="/tmp/gct2_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = Config(
        compute_dtype=args.dtype, batch_size=args.batch,
        size=args.size, octaves=args.octaves,
        conv_impl="lax", fused_diffusion=True, warm_up=0,
        checkpoint_dir=None, donate_state=False,
    ).validate()
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer_lib.make_train_step(cfg)
    r = np.random.default_rng(0)
    batch = jnp.asarray(
        r.uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)).astype(np.float32),
        jnp.float32,
    )
    rng = jax.random.PRNGKey(1)
    state, loss = step(state, batch, rng)
    float(loss)  # compile + sync

    import shutil
    shutil.rmtree(args.out, ignore_errors=True)
    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, loss = step(state, batch, rng)
    float(loss)
    jax.profiler.stop_trace()

    planes = glob.glob(os.path.join(args.out, "**", "*.xplane.pb"), recursive=True)
    if not planes:
        print(json.dumps({"error": "no xplane.pb captured", "dir": args.out}))
        return 1
    rows = parse_xplane(planes[0], args.top)
    total = sum(ms for ms, *_ in rows)
    for ms, n, name, plane in rows:
        print(json.dumps({
            "ms_per_step": round(ms / args.steps, 3), "calls": n,
            "op": name[:120],
        }), flush=True)
    print(json.dumps({"traced_steps": args.steps,
                      "sum_listed_ms_per_step": round(total / args.steps, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
