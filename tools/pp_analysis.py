"""Pipeline-parallelism performance model + break-even vs DP (VERDICT r3 #6).

No pod hardware exists in this environment, so PP's performance story is
built from things measurable WITHOUT a pod:

  1. an analytic fill-drain model over the actual stage plan
     (parallel/pipeline.plan_stages + exact per-conv MACs mirroring
     SURVEY §2.2's table),
  2. exact boundary-activation byte counts from the U-Net topology
     (what PP ships across ICI) vs the gradient-all-reduce bytes DP ships,
  3. measured per-virtual-stage wall times on the virtual CPU mesh
     (--measure) validating the MAC-balance assumption,
  4. an exact model-state memory sweep over width multiples (jax.eval_shape
     — no FLOPs) locating the crossover where DP+ZeRO-1+bf16-moments stops
     fitting a 16 GB v5e chip and PP becomes the only option.

Time model (palindrome GPipe, parallel/pipeline.py design notes):
  Each of the S devices runs TWO virtual stages per microbatch (its down
  band and its up band; the last device runs band+middle fused), V = 2S-1.
  With M microbatches dispatched back-to-back,
      t_pp(M)  = (M-1) * max_s w_s  +  sum_v tau_v      (steady + fill/drain)
      t_ideal  = M * sum_s w_s / S
      bubble   = 1 - t_ideal / t_pp
  where w_s = device s's work per microbatch and tau_v the virtual-stage
  latencies; backward-with-remat multiplies every term by the same ~3x and
  cancels. Perfect balance gives bubble -> (S-1)/(M+S-1)-ish; the tool uses
  the REAL per-stage MACs, not the balanced idealisation.

Usage:
  python tools/pp_analysis.py                    # analytic tables (any host)
  python tools/pp_analysis.py --measure          # + virtual-mesh stage times
  python tools/pp_analysis.py --sweep            # + memory crossover sweep
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BYTES = 16 * 1024**3  # v5e
DP_CHIPS = 8  # the BASELINE north-star pod (v5e-8)


# MAC / boundary / time models: the canonical copies live in
# gan_class_transfer2_tpu.parallel.planner (they also drive `gct2 plan`);
# this tool imports them so the validated model cannot drift.
from gan_class_transfer2_tpu.parallel.planner import (  # noqa: E402
    boundary_bytes,
    channels,
    conv_macs,
    pp_times,
    stage_work,
)


# ------------------------------------------------------------ memory model


def param_bytes_per_stage(cfg, plan):
    """Exact per-stage parameter byte counts via eval_shape (no FLOPs)."""
    import jax

    from gan_class_transfer2_tpu.models import unet
    from gan_class_transfer2_tpu.parallel import pipeline as pp

    shapes = jax.eval_shape(lambda r: unet.init_unet(r, cfg),
                            jax.random.PRNGKey(0))
    out = []
    for s in range(len(plan)):
        view = pp.tree_stage_view(plan, shapes, s)
        out.append(sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree_util.tree_leaves(view)
        ))
    return out


import numpy as np  # noqa: E402  (used above in closures)


def model_state_bytes(param_bytes, *, zero1_ways=1, moment_bytes=2):
    """Steady model-state per chip: fp32 params + fp32 grads (transient but
    live at the update) + 2 Adam moments (bf16 by default, ZeRO-1-sharded)."""
    n_params = param_bytes / 4
    return param_bytes + param_bytes + 2 * n_params * moment_bytes / zero1_ways


# ------------------------------------------------------------------- main


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--stages", default="2,4,6")
    ap.add_argument("--microbatches", default="2,4,8,16,32")
    ap.add_argument("--measure", action="store_true",
                    help="time the per-virtual-stage programs to validate "
                    "the MAC balance (on --platform, default cpu mesh)")
    ap.add_argument("--platform", default="cpu",
                    help="measure platform: cpu (virtual mesh; per-MAC "
                    "efficiency varies ~2.5x between the 3-channel outer "
                    "conv and deep convs, so expect deviation) or tpu "
                    "(both stage programs timed sequentially on one chip — "
                    "the MXU's per-MAC rate is near-uniform at these "
                    "widths, the meaningful balance datum)")
    ap.add_argument("--calibrate", action="store_true",
                    help="measure EVERY candidate 2-stage cut's per-device "
                    "forward time (on --platform) and report the "
                    "wall-clock-optimal pipeline_cuts to pin in Config")
    ap.add_argument("--sweep", action="store_true",
                    help="width-multiple memory sweep: where does "
                    "DP+ZeRO-1 stop fitting 16 GB and PP take over?")
    args = ap.parse_args()

    if args.measure and args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")

    from gan_class_transfer2_tpu.config import Config
    from gan_class_transfer2_tpu.parallel import pipeline as pp

    cfg = Config(size=args.size, batch_size=args.batch_size,
                 checkpoint_dir=None)

    print("== fill-drain model at the flagship "
          f"({args.size}², ~41.7 M params) ==")
    print("stages microb  bubble  per-dev MAC balance (max/mean)")
    for S in map(int, args.stages.split(",")):
        plan = pp.plan_stages(cfg, S)
        work = stage_work(cfg, plan)
        w_dev = [d + u for d, u in work]
        bal = max(w_dev) / (sum(w_dev) / len(w_dev))
        for M in map(int, args.microbatches.split(",")):
            _, _, bubble = pp_times(work, M)
            print(f"{S:6d} {M:6d}  {bubble:6.1%}  {bal:.3f}  plan={plan}")

    print("\n== per-step ICI traffic: PP boundaries vs DP all-reduce ==")
    pbytes = param_bytes_per_stage(cfg, pp.plan_stages(cfg, 2))
    total_params = sum(pbytes) / 4
    dp_ar = 2 * (DP_CHIPS - 1) / DP_CHIPS * total_params * 2  # bf16 grads
    print(f"DP gradient all-reduce: {dp_ar / 1e6:.0f} MB/chip/step "
          f"({total_params / 1e6:.1f} M params, bf16, ring 2(n-1)/n)")
    for S in map(int, args.stages.split(",")):
        plan = pp.plan_stages(cfg, S)
        M = 8
        bb = boundary_bytes(cfg, plan, args.batch_size // M)
        tot = M * sum(bb)
        print(f"PP S={S} M={M} b={args.batch_size}: "
              f"{tot / 1e6:.0f} MB/step total across {len(bb)} boundaries "
              f"({[round(b / 1e6, 1) for b in bb]} MB/microbatch)")

    if args.measure or args.calibrate:
        import time

        import jax.numpy as jnp

        from gan_class_transfer2_tpu.train import trainer as trainer_lib

        # shapes big enough that conv MACs (not dispatch overhead or the
        # tunnel's ~0.7 ms per-call latency floor) dominate — the claim
        # under test is the MAC-balance model. Built from the stage
        # FUNCTIONS directly (not PipelineTrainer) so a single real TPU
        # chip can time both stage programs sequentially.
        if args.platform == "tpu":
            # the flagship itself, bf16, a b32 microbatch
            m_cfg = Config(
                size=256, batch_size=64, compute_dtype="bfloat16",
                pipeline_stages=2, pipeline_microbatches=2,
                checkpoint_dir=None, fused_diffusion=False,
                donate_state=False,
            )
        else:
            m_cfg = Config(
                size=128, batch_size=8, pixel_size=64, max_size=256,
                octaves=4, pipeline_stages=2, pipeline_microbatches=2,
                checkpoint_dir=None, fused_diffusion=False,
                donate_state=False,
            )
        params = trainer_lib.init_state(m_cfg, jax.random.PRNGKey(0)).params
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (m_cfg.batch_size // 2, m_cfg.size, m_cfg.size, 3)
        ).astype(np.float32))

        def sync(out):
            # on the tunneled TPU block_until_ready returns early; fetching
            # a scalar is the reliable fence (BASELINE_MEASURED methodology)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(leaf.reshape(-1)[0])

        def t(f, *a, iters=50):
            out = f(*a)
            sync(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*a)
            sync(out)
            return (time.perf_counter() - t0) / iters * 1e3, out

        def measure_plan(plan):
            """Forward ms of the three 2-stage virtual programs:
            (down0, mid(fused band+middle), up0+head+loss)."""
            p0 = pp.tree_stage_view(plan, params, 0)
            p1 = pp.tree_stage_view(plan, params, 1)
            down0_fn = jax.jit(pp._stage_down_fn(m_cfg, plan, 0))
            mid_fn = jax.jit(pp._stage_mid_fn(m_cfg, plan))
            loss_fn = jax.jit(pp._stage_loss_fn(m_cfg, plan))
            ms_d0, (h, skips) = t(down0_fn, p0, x)
            ms_mid, h_up = t(mid_fn, p1, h)
            t_b = jnp.ones((x.shape[0],), jnp.float32)
            ms_up0, _ = t(loss_fn, p0, h_up, skips, x, jnp.float32(1.0), t_b)
            return ms_d0, ms_mid, ms_up0

    if args.measure:
        plan = pp.plan_stages(m_cfg, 2)
        ms_d0, ms_mid, ms_up0 = measure_plan(plan)
        work = stage_work(m_cfg, plan)
        w0, w1 = work[0][0] + work[0][1], work[1][0]
        print(f"\n== measured virtual-stage times ({args.platform}, "
              f"{m_cfg.size}² b{m_cfg.batch_size // 2}, plan={plan}) ==")
        print(f"down[0] {ms_d0:.2f} ms   mid(fused band+middle) "
              f"{ms_mid:.2f} ms   up[0]+head+loss {ms_up0:.2f} ms")
        print(f"per-DEVICE forward balance dev1/dev0: MAC model "
              f"{w1 / w0:.2f}; measured {ms_mid / (ms_d0 + ms_up0):.2f}")

    if args.calibrate:
        print(f"\n== pipeline_cuts calibration ({args.platform}, "
              f"{m_cfg.size}² b{m_cfg.batch_size // 2}, 2 stages) ==")
        print("cut  dev0 ms (down+up)  dev1 ms (mid)  max(dev)  balance")
        best = None
        for cut in range(1, m_cfg.octaves):
            plan = ((0, cut), (cut, m_cfg.octaves))
            ms_d0, ms_mid, ms_up0 = measure_plan(plan)
            dev0, dev1 = ms_d0 + ms_up0, ms_mid
            mx = max(dev0, dev1)
            bal = min(dev0, dev1) / mx
            print(f"{cut:3d}  {dev0:17.2f}  {dev1:13.2f}  {mx:8.2f}  {bal:.2f}")
            if best is None or mx < best[1]:
                best = (cut, mx)
        print(f"wall-clock-optimal: pipeline_cuts=\"{best[0]}\" "
              f"(bottleneck {best[1]:.2f} ms/microbatch forward)")

    if args.sweep:
        print("\n== width sweep: model-state GB/chip (grads+params fp32, "
              "bf16 moments; activations excluded) ==")
        print("width  params(M)  DP+ZeRO1(8)  PP S=2  PP S=4  PP S=6  verdict")
        for k in (1, 2, 4, 8, 16):
            w_cfg = cfg.replace(pixel_size=128 * k, max_size=512 * k)
            rows = {}
            for S in (2, 4, 6):
                plan = pp.plan_stages(w_cfg, S)
                pb = param_bytes_per_stage(w_cfg, plan)
                rows[S] = max(model_state_bytes(b) for b in pb)
                total = sum(pb)
            dp = model_state_bytes(total, zero1_ways=DP_CHIPS)
            fits = lambda x: x < HBM_BYTES * 0.75  # leave room for activations
            verdict = ("DP fine" if fits(dp) else
                       "PP S=2" if fits(rows[2]) else
                       "PP S=4" if fits(rows[4]) else
                       "PP S=6" if fits(rows[6]) else "needs TP too")
            print(f"{k:5d}  {total / 4 / 1e6:9.1f}  "
                  f"{dp / 1e9:11.2f}  {rows[2] / 1e9:6.2f}  "
                  f"{rows[4] / 1e9:6.2f}  {rows[6] / 1e9:6.2f}  {verdict}")
        print(json.dumps({"hbm_budget_frac": 0.75, "chips": DP_CHIPS}))


if __name__ == "__main__":
    main()
