"""Measure host-RSS behavior of the three device data-feeding patterns.

Motivation (r5): `measure_distill.py --flagship` fed 256²/b64 float32
batches through `device_iterator` (one host→device `device_put` per step)
and grew host RSS without bound — ~50 MB/step, i.e. exactly the batch
size, surviving array deletion, `float(loss)` syncs, and `gc.collect()` —
OOM-killing a 125 GB host mid-run. This tool isolates the three patterns:

  A. fresh numpy buffer → device_put per iter      (device_iterator's path)
  B. ONE reused staging buffer → device_put per iter
  C. HBM-resident pool, jitted gather per iter (pool passed as a jit ARG),
     plus a device→host fetch loop (the eval/scoring direction)

Measured on the axon-tunneled TPU v5e (2026-08-19):
  A leaks ~48 MB/iter  — the client retains an internal copy per transfer
  B leaks ~48 MB/iter  — so it is NOT source-buffer pinning; reuse doesn't help
  C is FLAT (579 MB over 200 draws; fetches flat too)

Conclusions baked into the framework:
  * datasets that fit HBM should feed via data.device_augment.HBMDataset
    (only the int32 index vector crosses the tunnel per step);
  * the HBM pool must be a jit ARGUMENT — closure capture bakes it into
    the HLO and axon's remote-compile endpoint rejects the request body
    (HTTP 413) at 256²-pool scale;
  * for bigger-than-HBM corpora the per-transfer leak is a platform-client
    defect outside this repo: budget host RAM ≈ batch_bytes × total_steps
    on axon, or chunk runs. Native TPU hosts do not show this (the leak is
    in the tunnel client, not JAX).

Usage:
  python tools/probe_transfer_leak.py            # all three cases, TPU
  python tools/probe_transfer_leak.py --iters 20 --case a
"""

import argparse
import gc
import json

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--case", choices=["a", "b", "c", "all"], default="all")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    import jax

    shape = (args.batch, args.size, args.size, 3)
    batch_mb = int(np.prod(shape)) * 4 / 1e6
    f = jax.jit(lambda x: x.sum())

    def emit(obj):
        print(json.dumps(obj), flush=True)

    emit({"backend": jax.default_backend(),
          "device": str(jax.devices()[0]),
          "batch_mb": round(batch_mb, 1)})

    def run_case(name, step):
        gc.collect()
        start = rss_mb()
        samples = []
        for i in range(args.iters):
            s = step(i)
            if (i + 1) % max(1, args.iters // 5) == 0:
                float(s)
                gc.collect()
                samples.append(round(rss_mb() - start, 1))
        per_iter = (samples[-1] - samples[0]) / max(
            1, args.iters - args.iters // 5) if len(samples) > 1 else 0.0
        emit({"case": name, "rss_growth_mb": samples,
              "leak_mb_per_iter": round(per_iter, 2),
              "batch_mb": round(batch_mb, 1)})

    if args.case in ("a", "all"):
        def step_a(i):
            x = np.random.default_rng(i).random(shape, dtype=np.float32)
            return f(jax.device_put(x))
        run_case("a_fresh_device_put", step_a)

    if args.case in ("b", "all"):
        stage = np.empty(shape, dtype=np.float32)
        def step_b(i):
            stage.fill(float(i % 7))
            return f(jax.device_put(stage))
        run_case("b_staged_device_put", step_b)

    if args.case in ("c", "all"):
        pool = jax.device_put(np.random.default_rng(0).random(
            (512,) + shape[1:], dtype=np.float32))
        draw = jax.jit(lambda p, idx: p[idx].sum())
        rng = np.random.default_rng(1)
        def step_c(i):
            return draw(pool, rng.integers(0, 512, args.batch).astype(np.int32))
        run_case("c_hbm_resident_draw", step_c)

        fetch = jax.jit(lambda p, idx: p[idx] * 2.0)
        def step_c2(i):
            out = np.asarray(
                fetch(pool, rng.integers(0, 512, args.batch).astype(np.int32)))
            return jax.numpy.zeros(())  # nothing pending
        run_case("c2_device_to_host_fetch", step_c2)


if __name__ == "__main__":
    main()
