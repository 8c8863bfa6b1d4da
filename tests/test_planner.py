"""Parallelism planner (parallel/planner.py, `gct2 plan`).

The reference is single-device by construction (reference train.py:40), so
strategy selection has no reference counterpart — these tests pin the
planner's own contracts: the MAC model conserves total work, the sharded
memory models agree with the runtime's actual sharding rules, the lever
auto-engagement is deterministic, and the CLI surface emits a valid plan.
"""

import json

import numpy as np
import pytest

from gan_class_transfer2_tpu.config import Config
from gan_class_transfer2_tpu.parallel import pipeline as pp
from gan_class_transfer2_tpu.parallel import planner


def flagship(**kw):
    base = dict(compute_dtype="bfloat16", batch_size=256, checkpoint_dir=None)
    base.update(kw)
    return Config(**base)


def test_flagship_8chip_plan_recommends_dp():
    r = planner.plan(flagship(), 8)
    assert r["chosen"] == "DP"
    assert r["overrides"]["mesh_data"] == 8
    dp = next(c for c in r["candidates"] if c["name"] == "DP")
    assert dp["fits"]
    # memory model: 41.7 M params → ~0.67 GB state (fp32 p+g+2 moments)
    assert 0.5 < dp["state_gb"] < 0.9
    assert dp["pred_img_s"] > 0
    # ring all-reduce of bf16 grads: 2(n-1)/n · 41.7 M · 2 B ≈ 146 MB
    assert 120 < dp["ici_mb_step"] < 170
    assert "--mesh-data 8" in r["cli_flags"]


@pytest.mark.parametrize("block_depth", [0, 2])
@pytest.mark.parametrize("stages", [2, 3, 6])
def test_stage_work_conserves_total_macs(stages, block_depth):
    cfg = flagship(block_depth=block_depth)
    down, up, head = planner.conv_macs(cfg)
    mid = (
        block_depth
        * (cfg.size // 2**cfg.octaves) ** 2
        * 9
        * planner.channels(cfg, cfg.octaves - 1)[0] ** 2
    )
    total = sum(down) + sum(up) + head + mid
    plan_s = pp.plan_stages(cfg, stages)
    work = planner.stage_work(cfg, plan_s)
    assert sum(d + u for d, u in work) == pytest.approx(total, rel=1e-12)


def test_pp_times_bubble_shrinks_with_microbatches():
    cfg = flagship()
    work = planner.stage_work(cfg, pp.plan_stages(cfg, 2))
    t2, i2, b2 = planner.pp_times(work, 2)
    t32, i32, b32 = planner.pp_times(work, 32)
    assert t2 >= i2 and t32 >= i32
    assert b32 < b2
    assert 0 <= b32 < 1


def test_tp_and_zero1_bytes_match_runtime_rules():
    cfg = flagship()
    tree = planner.abstract_params(cfg)
    total = planner.param_bytes(tree)
    tp2 = planner.tp_param_bytes_per_chip(tree, 2)
    # TP shards the big conv kernels; biases/small leaves stay replicated
    assert total / 2 <= tp2 < 0.7 * total
    for data in (2, 8):
        per_chip = planner.zero1_moment_bytes_per_chip(tree, data, 1, "float32")
        # 2 fp32 moments over all params, sharded `data` ways with
        # non-divisible leaves replicated
        assert 2 * total / data <= per_chip <= 2 * total
    bf16 = planner.zero1_moment_bytes_per_chip(tree, 8, 1, "bfloat16")
    assert bf16 == planner.zero1_moment_bytes_per_chip(tree, 8, 1, "float32") // 2


def test_auto_levers_engage_under_tight_hbm():
    # 2 GB/chip: flagship DP on 8 chips does not fit raw (0.67 state +
    # 1.69 act GB > 1.5 budget) — the planner must engage the measured-free
    # levers (bf16 moments, then ZeRO-1 or grad_accum) and still fit
    r = planner.plan(flagship(), 8, hbm_gb=2.0)
    dp = next(c for c in r["candidates"] if c["name"] == "DP")
    assert dp["fits"]
    ov = dp["overrides"]
    assert ov.get("moment_dtype") == "bfloat16"
    assert ov.get("grad_accum", 1) > 1 or ov.get("zero1")
    if ov.get("grad_accum", 1) > 1:
        # MultiSteps micro-steps at the configured batch_size, so the plan
        # must reduce batch_size alongside grad_accum to actually shrink
        # activations while keeping the effective batch at 256
        assert ov["batch_size"] * ov["grad_accum"] == 256
        assert not ov.get("zero1")  # mutually exclusive (Config.validate)
    # lever overrides must be valid Config fields that validate together
    flagship(**{k: v for k, v in ov.items()}).validate()


def test_no_phantom_grad_accum_when_state_alone_overflows():
    # a budget below even the bf16 state: grad_accum cannot help and must
    # NOT be recorded on the (correctly) non-fitting candidate
    r = planner.plan(flagship(), 8, hbm_gb=0.5)
    dp = next(c for c in r["candidates"] if c["name"] == "DP")
    assert not dp["fits"]
    assert "grad_accum" not in dp["overrides"]


def test_plan_tolerates_pinned_pipeline_cuts():
    # calibrated pipeline_cuts pin one stage count; the PP enumeration
    # must fall back to the MAC plan for other S instead of crashing
    r = planner.plan(flagship(pipeline_cuts="1", pipeline_stages=2), 8)
    pp2 = next(c for c in r["candidates"] if c["name"].startswith("PP2"))
    assert pp2 is not None
    assert any(c["name"].startswith("PP4") for c in r["candidates"])


def test_indivisible_batch_is_reported_not_crashed():
    r = planner.plan(flagship(batch_size=7), 8)
    dp = next(c for c in r["candidates"] if c["name"] == "DP")
    assert not dp["fits"]
    assert "not divisible" in dp["note"]


def test_spatial_candidate_splits_a_single_image():
    # spatial sharding's use case: batch=1 cannot split over the data axis
    # at all (DP reports the divisibility problem), but spatial8 divides the
    # ONE image's activations across all 8 chips
    cfg = flagship(size=1024, batch_size=1)
    r = planner.plan(cfg, 8)
    by_name = {c["name"]: c for c in r["candidates"]}
    assert "not divisible" in by_name["DP"]["note"]
    sp8 = by_name["DP1×spatial8"]
    # candidate GB figures are rounded to 2 decimals in the report
    assert sp8["act_gb"] * 1e9 == pytest.approx(
        planner.act_bytes(cfg, 1, spatial_ways=8), abs=0.006e9
    )
    # on a 4-chip budget the only spatial split of one image is 4-way;
    # doubling the ways halves the per-chip activations
    r4 = planner.plan(cfg, 4)
    sp4 = next(c for c in r4["candidates"] if c["name"] == "DP1×spatial4")
    assert sp8["act_gb"] == pytest.approx(sp4["act_gb"] / 2, abs=0.01)


def test_throughput_model_reproduces_every_grid_point():
    # predict_ips_per_chip must return each measured (size, batch) grid
    # point exactly — the interpolation may not distort the measurements
    for size, ladder in planner.MEASURED_GRID.items():
        for batch, ips_measured in ladder:
            cfg = flagship(
                size=size, octaves=4 if size == 64 else 6, batch_size=batch
            )
            ips = planner.predict_ips_per_chip(cfg, batch)
            assert ips == pytest.approx(ips_measured, rel=1e-6), (size, batch)


def test_batch_padding_model():
    # non-multiple-of-8 per-chip batches run at the padded batch's rate
    # with the padded fraction thrown away (measured: 1024² b12 = b16 rate
    # × 12/16; 256² b36 = b40 rate × 36/40)
    cfg = flagship(size=1024)
    p12 = planner.predict_ips_per_chip(cfg, 12)
    p16 = planner.predict_ips_per_chip(cfg, 16)
    assert p12 == pytest.approx(p16 * 12 / 16, rel=1e-9)
    # aligned batches are unaffected
    assert planner.predict_ips_per_chip(cfg, 16) == pytest.approx(
        dict(planner.MEASURED_GRID[1024])[16], rel=1e-6
    )
    # the DP candidate warns about the padding waste
    r = planner.plan(flagship(batch_size=96), 8)  # 12/chip
    dp = next(c for c in r["candidates"] if c["name"] == "DP")
    assert "pads to" in dp["note"]


def test_knee_batch_saturates_prediction():
    cfg = flagship()
    knee = planner._knee_batch(cfg)
    ceiling = planner.predict_ips_per_chip(cfg, 1 << 20)
    assert planner.predict_ips_per_chip(cfg, knee) >= 0.95 * ceiling
    assert planner.predict_ips_per_chip(cfg, knee // 2) < 0.95 * ceiling


def test_cli_plan_json(capsys):
    from gan_class_transfer2_tpu import cli

    rc = cli.main([
        "plan", "--chips", "8", "--json",
        "--compute-dtype", "bfloat16", "--batch-size", "256",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["chosen"] == "DP"
    assert out["workload"]["params_m"] == pytest.approx(41.7, abs=0.1)
    assert any(c["name"].startswith("PP") for c in out["candidates"])


def test_cli_plan_table(capsys):
    from gan_class_transfer2_tpu import cli

    rc = cli.main(["plan", "--chips", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "recommended:" in out
    assert "strategy" in out


def test_plan_slices_requires_divisibility():
    with pytest.raises(ValueError, match="divisible"):
        planner.plan(flagship(mesh_slice=3), 8)


def test_gan_plan_exact_state_and_pass_count():
    cfg = flagship()
    r = planner.plan(cfg, 8, model="gan")
    # CycleGAN-style: 2 directions × (transfer + cycle + identity) passes
    assert r["workload"]["generator_passes"] == 6
    # two full U-Nets as generators: ~2 × 41.7 M params (+discriminators)
    assert r["workload"]["params_m"] > 2 * 41.0
    dp = r["candidates"][0]
    # state must exceed the diffusion workload's (two Gs + two Ds + 2 opts)
    d_state = next(
        c for c in planner.plan(cfg, 8)["candidates"] if c["name"] == "DP"
    )["state_gb"]
    assert dp["state_gb"] > 2 * d_state
    # disabling cycle+identity elides 4 passes and shrinks activations
    r2 = planner.plan(
        flagship(cycle_weight=0.0, identity_weight=0.0), 8, model="gan"
    )
    assert r2["workload"]["generator_passes"] == 2
    assert r2["candidates"][0]["act_gb"] < dp["act_gb"] / 2.5


def test_cgan_plan_and_levers_under_tight_hbm():
    # b32 on 8 chips: activations are small; a 1.6 GB/chip budget makes the
    # raw fp32 state (0.91 GB) + act overflow, so the state levers must
    # engage (bf16 moments + ZeRO-1) and the plan then fits
    cfg = flagship(num_classes=3, batch_size=32)
    raw = planner.plan(cfg, 8, model="cgan", hbm_gb=2.0)["candidates"][0]
    assert raw["fits"] and "moment_dtype" not in raw["overrides"]
    r = planner.plan(cfg, 8, model="cgan", hbm_gb=1.6)
    dp = r["candidates"][0]
    assert dp["fits"]
    ov = dp["overrides"]
    assert ov.get("moment_dtype") == "bfloat16"
    assert ov.get("zero1") is True
    assert dp["state_gb"] < raw["state_gb"]
    # the overrides must be valid Config fields that validate together
    flagship(num_classes=3, **{
        k: v for k, v in ov.items() if k not in ("mesh_data", "mesh_model")
    }).validate()


def test_cli_plan_gan(capsys):
    from gan_class_transfer2_tpu import cli

    rc = cli.main([
        "plan", "--model", "gan", "--chips", "8", "--json",
        "--compute-dtype", "bfloat16", "--batch-size", "64",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["workload"]["model"] == "gan"
    assert out["chosen"] in ("DP", None)


def test_abstract_params_total_matches_golden_count():
    # the same 41,691,660-param golden the unet tests pin (SURVEY §2.2)
    tree = planner.abstract_params(flagship())
    import jax

    n = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree)
    )
    assert n == 41_691_660


def test_unscored_candidates_surface_when_only_they_fit():
    """VERDICT r4 #6: when every strategy the throughput model can score
    is out of memory, the planner must RECOMMEND a fitting unscored
    strategy (with its explicit no-model note) rather than bury it below
    scored non-fitting ones or return no plan."""
    cfg = Config(size=256, pixel_size=256, max_size=2048, batch_size=8,
                 compute_dtype="bfloat16", checkpoint_dir=None)
    r = planner.plan(cfg, n_chips=8, hbm_gb=3)
    fitting = [c for c in r["candidates"] if c["fits"]]
    assert fitting, "scenario must keep at least one fitting strategy"
    assert all(c["pred_img_s"] is None for c in fitting)
    # ranking: every fitting candidate above every non-fitting one
    names = [c["name"] for c in r["candidates"]]
    last_fit = max(names.index(c["name"]) for c in fitting)
    first_nofit = min(
        names.index(c["name"]) for c in r["candidates"] if not c["fits"]
    )
    assert last_fit < first_nofit
    # the recommendation is the unscored winner, note intact
    assert r["chosen"] == r["candidates"][0]["name"]
    assert r["candidates"][0]["fits"]
    assert r["candidates"][0]["pred_img_s"] is None
    assert "unmeasured" in r["candidates"][0]["note"]
    assert r["overrides"]  # concrete Config overrides still emitted


def test_gan_throughput_model_reproduces_anchors():
    """GAN_STEP_COST is fitted at the three measured 256² b16 anchors
    (BASELINE_MEASURED "GAN-mode step" + elision rows) — the plan must
    reproduce them and scale with the mesh; cgan stays unpredicted."""
    anchors = [
        ((10.0, 5.0), 125.2),   # full cycle GAN
        ((10.0, 0.0), 151.5),   # identity elided
        ((0.0, 0.0), 261.4),    # pure adversarial
    ]
    for (cyc, idt), want in anchors:
        cfg = flagship(batch_size=16, cycle_weight=cyc, identity_weight=idt)
        r = planner.plan(cfg, 1, model="gan")
        got = r["candidates"][0]["pred_img_s"]
        assert got == pytest.approx(want, rel=0.01), (cyc, idt)
        assert "per class" in r["candidates"][0]["note"]
    # mesh scaling: 8 chips at the same per-chip batch → 8× per-class img/s
    r8 = planner.plan(
        flagship(batch_size=128, cycle_weight=10.0, identity_weight=5.0),
        8, model="gan",
    )
    assert r8["candidates"][0]["pred_img_s"] == pytest.approx(
        8 * 125.2, rel=0.01
    )
    # cgan: no measured anchors → still unpredicted
    rc = planner.plan(
        flagship(num_classes=3, batch_size=16), 1, model="cgan"
    )
    assert rc["candidates"][0]["pred_img_s"] is None
