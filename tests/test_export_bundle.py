"""Compiled model bundles (utils/bundle.py): serialized StableHLO inference
artifacts with embedded weights. The reference has no export surface at all
(reference train.py:498-523 — not even model.save); a production serving
fleet needs a self-contained, version-stable artifact. Tests pin exact value
parity between every bundled program and its live counterpart, batch
polymorphism, the manifest contract, and the CLI round trip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.utils import bundle as bundle_lib


def _noise(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


def test_diffusion_bundle_roundtrip(tmp_path):
    from gan_class_transfer2_tpu.sample import sampler
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    cfg = tiny_test_config()
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    out = str(tmp_path / "bundle")
    manifest = bundle_lib.export_bundle(
        cfg, state, out, platforms=("cpu",)
    )
    assert sorted(manifest["programs"]) == [
        "denoise", "invert", "preview", "sample",
    ]

    bundle = bundle_lib.load_bundle(out)
    # batch-polymorphic: the SAME artifact serves batch 1 and batch 3
    for b in (1, 3):
        x = _noise((b, cfg.size, cfg.size, 3), seed=b)
        got = np.asarray(bundle.call("sample", x))
        want = np.asarray(sampler.sample(cfg, state.params, x).images)
        np.testing.assert_array_equal(got, want)

    t = jnp.full((2,), 3, jnp.int32)
    x = _noise((2, cfg.size, cfg.size, 3), seed=7)
    from gan_class_transfer2_tpu.models import api as model_api

    got = np.asarray(bundle.call("denoise", x, t))
    want = np.asarray(
        model_api.apply_denoiser(
            cfg, state.params, x.astype(jnp.dtype(cfg.compute_dtype)), t
        ).astype(jnp.float32)
    )
    np.testing.assert_array_equal(got, want)

    got_x, got_eps = bundle.call("invert", x)
    want_x, want_eps = sampler.invert(cfg, state.params, x)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(want_x))
    np.testing.assert_array_equal(np.asarray(got_eps), np.asarray(want_eps))

    n = _noise((2, cfg.size, cfg.size, 3), seed=9)
    got = np.asarray(bundle.call("preview", x, n))
    want = np.asarray(sampler.preview(cfg, state.params, x, n)[0])
    # preview's renoise+inverse arithmetic reassociates under compiled
    # fusion vs the eager reference — float-level (1 ulp) tolerance
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_conditional_diffusion_bundle(tmp_path):
    from gan_class_transfer2_tpu.sample import sampler
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    cfg = tiny_test_config(num_classes=3)
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(1))
    out = str(tmp_path / "bundle")
    manifest = bundle_lib.export_bundle(
        cfg, state, out, programs=("sample",), platforms=("cpu",)
    )
    # conditional: the sample program takes (init, class_idx)
    assert len(manifest["programs"]["sample"]["inputs"]) == 2

    bundle = bundle_lib.load_bundle(out)
    x = _noise((2, cfg.size, cfg.size, 3))
    cls = jnp.asarray([0, 2], jnp.int32)
    got = np.asarray(bundle.call("sample", x, cls))
    want = np.asarray(
        sampler.sample(cfg, state.params, x, class_idx=cls).images
    )
    np.testing.assert_array_equal(got, want)


def test_gan_bundle_transfer(tmp_path):
    from gan_class_transfer2_tpu.train import gan as gan_lib

    cfg = tiny_test_config()
    state = gan_lib.init_gan_state(cfg, jax.random.PRNGKey(2))
    out = str(tmp_path / "bundle")
    manifest = bundle_lib.export_bundle(
        cfg, state, out, model="gan", platforms=("cpu",)
    )
    assert sorted(manifest["programs"]) == ["transfer_ab", "transfer_ba"]

    bundle = bundle_lib.load_bundle(out)
    x = _noise((2, cfg.size, cfg.size, 3))
    for d in ("ab", "ba"):
        got = np.asarray(bundle.call(f"transfer_{d}", x))
        want = np.asarray(gan_lib.transfer(cfg, state, x, direction=d))
        np.testing.assert_array_equal(got, want)


def test_cgan_bundle_transfer(tmp_path):
    from gan_class_transfer2_tpu.train import conditional_gan as cgan_lib

    cfg = tiny_test_config(num_classes=3)
    state = cgan_lib.init_conditional_gan_state(cfg, jax.random.PRNGKey(3))
    out = str(tmp_path / "bundle")
    bundle_lib.export_bundle(cfg, state, out, model="cgan", platforms=("cpu",))

    bundle = bundle_lib.load_bundle(out)
    x = _noise((2, cfg.size, cfg.size, 3))
    target = jnp.asarray([1, 2], jnp.int32)
    got = np.asarray(bundle.call("transfer", x, target))
    want = np.asarray(cgan_lib.transfer(cfg, state, x, target))
    np.testing.assert_array_equal(got, want)


def test_bundle_manifest_and_errors(tmp_path):
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    cfg = tiny_test_config()
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))

    with pytest.raises(ValueError, match="unknown programs"):
        bundle_lib.export_bundle(
            cfg, state, str(tmp_path / "x"), programs=("banana",)
        )
    # an explicitly empty selection is an error, not "export everything"
    with pytest.raises(ValueError, match="non-empty"):
        bundle_lib.export_bundle(cfg, state, str(tmp_path / "x"), programs=[])
    with pytest.raises(ValueError, match="unknown model kind"):
        bundle_lib.export_bundle(cfg, state, str(tmp_path / "x"), model="vae")
    with pytest.raises(FileNotFoundError, match="not a model bundle"):
        bundle_lib.load_bundle(str(tmp_path))

    out = str(tmp_path / "bundle")
    manifest = bundle_lib.export_bundle(
        cfg, state, out, programs=("denoise",), platforms=("cpu",)
    )
    # self-description: config + versions + typed signatures
    assert manifest["format_version"] == bundle_lib.FORMAT_VERSION
    assert manifest["config"]["size"] == cfg.size
    assert manifest["model"] == "diffusion"
    assert isinstance(manifest["calling_convention_version"], int)
    sig = manifest["programs"]["denoise"]
    assert sig["inputs"][0]["shape"] == ["b", str(cfg.size), str(cfg.size), "3"]
    assert sig["inputs"][1]["dtype"] == "int32"
    # the on-disk manifest round-trips
    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh) == manifest

    bundle = bundle_lib.load_bundle(out)
    with pytest.raises(KeyError, match="no program 'sample'"):
        bundle.call("sample", _noise((1, cfg.size, cfg.size, 3)))

    # future format versions are refused, not mis-read
    manifest["format_version"] = 999
    with open(os.path.join(out, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    with pytest.raises(ValueError, match="format_version 999"):
        bundle_lib.load_bundle(out)


def test_multiplatform_bundle_runs_on_cpu(tmp_path):
    """The default tpu+cpu lowering must still execute on the CPU backend
    (platform dispatch picks the running platform's module)."""
    from gan_class_transfer2_tpu.sample import sampler
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    cfg = tiny_test_config()
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    out = str(tmp_path / "bundle")
    manifest = bundle_lib.export_bundle(
        cfg, state, out, programs=("sample",), platforms=("tpu", "cpu")
    )
    assert manifest["platforms"] == ["tpu", "cpu"]
    bundle = bundle_lib.load_bundle(out)
    x = _noise((2, cfg.size, cfg.size, 3))
    got = np.asarray(bundle.call("sample", x))
    want = np.asarray(sampler.sample(cfg, state.params, x).images)
    np.testing.assert_array_equal(got, want)


def test_cli_export_model_and_bundle_sample(tmp_path):
    """End-to-end CLI round trip: train → export-model → sample --bundle,
    with the bundle samples IDENTICAL to the checkpoint samples (same seed,
    same noise draw order)."""
    from PIL import Image

    from gan_class_transfer2_tpu import cli
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset
    from gan_class_transfer2_tpu.train.loop import Runner

    cfg = tiny_test_config(
        steps_per_epoch=2, epochs=1,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=2, mesh_data=1,
    )
    images = np.random.default_rng(0).integers(
        0, 256, size=(4, cfg.size, cfg.size, 3), dtype=np.uint8
    )
    runner = Runner(cfg, dataset=ArrayDataset(images, cfg.batch_size, seed=0))
    runner.fit(epochs=1, steps_per_epoch=2, log_samples=False)
    runner.close()

    bundle_dir = str(tmp_path / "bundle")
    rc = cli.main([
        "export-model", "--platform", "cpu",
        "--checkpoint-dir", cfg.checkpoint_dir,
        "--out", bundle_dir, "--programs", "sample",
        "--export-platforms", "cpu",
    ])
    assert rc == 0

    rc = cli.main([
        "sample", "--platform", "cpu", "--bundle", bundle_dir,
        "--out", str(tmp_path / "from_bundle"), "--num", "2",
    ])
    assert rc == 0
    rc = cli.main([
        "sample", "--platform", "cpu",
        "--checkpoint-dir", cfg.checkpoint_dir,
        "--out", str(tmp_path / "from_ckpt"), "--num", "2",
    ])
    assert rc == 0
    for i in range(2):
        a = np.asarray(Image.open(tmp_path / "from_bundle" / f"sample_{i}.png"))
        b = np.asarray(Image.open(tmp_path / "from_ckpt" / f"sample_{i}.png"))
        np.testing.assert_array_equal(a, b)
