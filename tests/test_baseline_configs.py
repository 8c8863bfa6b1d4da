"""CI-scale smoke of the BASELINE configs 3-5 artifact tool
(tools/run_baseline_configs.py; VERDICT r2 next #5). Tiny step counts —
what is checked is that each named infrastructure path (on-device augment,
full-mesh DP, multi-class conditional + EMA) runs end-to-end and emits the
artifact JSON + grids."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "run_baseline_configs.py")


@pytest.mark.parametrize(
    "config",
    [
        3,
        4,
        pytest.param(
            5,
            marks=pytest.mark.skipif(
                os.environ.get("RUN_SLOW") != "1",
                reason="256^2 conditional on 1 CPU core; RUN_SLOW=1 "
                "(runs in the TPU artifact pass)",
            ),
        ),
    ],
)
def test_baseline_config_runs(config, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, TOOL, "--configs", str(config),
         "--epochs", "1", "--steps-per-epoch", "2",
         "--platform", "cpu", "--workdir", str(tmp_path),
         # NEVER the default docs/baseline_grids: the committed grids are
         # TPU artifact-run outputs; a CI smoke must not overwrite them
         "--grid-dir", str(tmp_path / "grids")],
        capture_output=True, text=True, timeout=540, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:] + out.stdout[-1000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    assert r["config"] == config
    assert r["images_per_sec"] > 0
    traj = r["trajectory"]
    assert any(len(v) > 0 for v in traj.values()), traj
    grids = [r["grid"]] if "grid" in r else r["grids"]
    for g in grids:
        assert os.path.exists(os.path.join(REPO, g)), g
