"""Packaging smoke test (VERDICT r2 next #9): the installed console script
(`gct2`, pyproject.toml [project.scripts]) drives a tiny train → sample
round-trip, and checkpoints carry a format-version stamp."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

TINY = [
    "--size", "16", "--pixel-size", "4", "--max-size", "8",
    "--octaves", "2", "--steps", "4", "--batch-size", "2",
    "--steps-per-epoch", "2", "--epochs", "1", "--warm-up", "2",
    "--test-step", "2", "--fused-diffusion", "false", "--mesh-data", "1",
    "--platform", "cpu",
]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.skipif(
    shutil.which("gct2") is None,
    reason="gct2 console script not installed (pip install -e .)",
)
def test_console_script_train_sample_roundtrip(tmp_path):
    from PIL import Image as PILImage

    rng = np.random.default_rng(0)
    for i in range(4):
        arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        PILImage.fromarray(arr).save(tmp_path / f"img_{i}.png")

    out = subprocess.run(
        ["gct2", "train",
         "--dataset-pattern", str(tmp_path / "*.png"),
         "--log-dir", str(tmp_path / "logs"),
         "--checkpoint-dir", str(tmp_path / "ckpt"),
         "--checkpoint-every", "2", *TINY],
        capture_output=True, text=True, timeout=600, env=_env(),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.isdir(tmp_path / "ckpt" / "step_000000002")

    # format-version stamp for forward compatibility
    with open(tmp_path / "ckpt" / "config.json") as f:
        meta = json.load(f)
    assert meta["checkpoint_format_version"] == 1

    out = subprocess.run(
        ["gct2", "sample",
         "--checkpoint-dir", str(tmp_path / "ckpt"),
         "--out", str(tmp_path / "samples"), "--num", "2",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=600, env=_env(),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert sorted(os.listdir(tmp_path / "samples")) == [
        "sample_0.png", "sample_1.png",
    ]


def test_console_script_entry_point_resolves():
    """The [project.scripts] target must stay importable."""
    import importlib

    mod = importlib.import_module("gan_class_transfer2_tpu.cli")
    assert callable(mod.main)


@pytest.mark.skipif(
    shutil.which("gct2") is None,
    reason="gct2 console script not installed (pip install -e .)",
)
def test_console_script_help():
    out = subprocess.run(
        ["gct2", "--help"], capture_output=True, text=True, timeout=120,
        env=_env(),
    )
    assert out.returncode == 0
    assert "train" in out.stdout and "serve" in out.stdout


def test_wheel_ships_fid_extractor_weights(tmp_path):
    """Non-editable installs must carry the pinned FID extractor weights
    (pyproject [tool.setuptools.package-data]); without them
    fid_extractor='auto' silently degrades to the random-feature embedding
    (different units than docs/FID.md)."""
    import glob
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # setuptools' in-tree bdist writes <repo>/build + <repo>/*.egg-info;
    # leaving them behind duplicates the whole package on disk (it can
    # shadow the real one in odd sys.path setups and inflates LoC audits
    # — VERDICT r4 hygiene). Clean up whatever this build created.
    pre = {p for p in (os.path.join(repo, "build"),
                       os.path.join(repo, "gan_class_transfer2_tpu.egg-info"))
           if os.path.exists(p)}
    try:
        r = subprocess.run(
            [sys.executable, "-m", "pip", "wheel", repo, "--no-deps",
             "--no-build-isolation", "-w", str(tmp_path), "-q"],
            capture_output=True, text=True, timeout=300,
        )
    finally:
        for p in (os.path.join(repo, "build"),
                  os.path.join(repo, "gan_class_transfer2_tpu.egg-info")):
            if p not in pre and os.path.exists(p):
                shutil.rmtree(p, ignore_errors=True)
    assert r.returncode == 0, r.stderr[-2000:]
    (wheel,) = glob.glob(str(tmp_path / "*.whl"))
    names = zipfile.ZipFile(wheel).namelist()
    assert "gan_class_transfer2_tpu/weights/fid_extractor.npz" in names
    # the native loader's source + Makefile ship so non-editable installs
    # build it on first use (native_loader._load runs `make`); without
    # them the loader and the fast CRC path silently fall back
    assert "gan_class_transfer2_tpu/data/native/dataloader.cc" in names
    assert "gan_class_transfer2_tpu/data/native/Makefile" in names
