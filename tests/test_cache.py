"""Disk dataset cache: native builder + memmap reader + device-augment path.

Beyond-reference capability (the reference re-decodes every epoch; its one
.cache() line is commented out, train.py:317)."""

import numpy as np
import pytest
from PIL import Image

from gan_class_transfer2_tpu.data import cache as cache_lib
from gan_class_transfer2_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader toolchain unavailable"
)


@pytest.fixture
def cache_file(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(6):
        hw = (24 + i, 20 + i)  # varied sizes exercise the resize path
        arr = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
    out = str(tmp_path / "data.gct2cache")
    n = native_loader.build_cache(str(tmp_path / "*.png"), 16, out)
    assert n == 6
    return out


def test_cache_roundtrip(cache_file):
    data, store = cache_lib.read_cache(cache_file)
    assert store == 16
    assert data.shape == (6, 16, 16, 3)
    assert data.dtype == np.uint8
    # records are non-degenerate and distinct
    assert len({bytes(r.tobytes()) for r in data}) == 6


def test_cache_exact_when_no_resize(tmp_path):
    """A store-sized source is stored bit-exactly (no resampling)."""
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    Image.fromarray(arr).save(tmp_path / "exact.png")
    out = str(tmp_path / "c.gct2cache")
    native_loader.build_cache(str(tmp_path / "exact.png"), 16, out)
    data, _ = cache_lib.read_cache(out)
    np.testing.assert_array_equal(np.asarray(data[0]), arr)


def _ref_resize_center_crop(arr: np.ndarray, target: int) -> np.ndarray:
    """NumPy reference of the native point-sampled bilinear (same spec as
    dataloader.cc::resize_center_crop; NOT PIL, whose downscale bilinear
    antialiases)."""
    h, w = arr.shape[:2]
    scale = target / min(h, w)
    rh = max(target, int(h * scale + 0.5))
    rw = max(target, int(w * scale + 0.5))
    off_h, off_w = (rh - target) // 2, (rw - target) // 2
    out = np.empty((target, target, 3), np.uint8)
    for i in range(target):
        sy = (i + off_h + 0.5) * h / rh - 0.5
        y0 = min(max(int(sy), 0), h - 1)
        y1 = min(y0 + 1, h - 1)
        fy = min(max(sy - y0, 0.0), 1.0)
        for j in range(target):
            sx = (j + off_w + 0.5) * w / rw - 0.5
            x0 = min(max(int(sx), 0), w - 1)
            x1 = min(x0 + 1, w - 1)
            fx = min(max(sx - x0, 0.0), 1.0)
            v = (
                arr[y0, x0] * (1 - fy) * (1 - fx)
                + arr[y0, x1] * (1 - fy) * fx
                + arr[y1, x0] * fy * (1 - fx)
                + arr[y1, x1] * fy * fx
            )
            out[i, j] = (v + 0.5).astype(np.uint8)
    return out


def test_cache_resize_matches_reference_spec(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    Image.fromarray(arr).save(tmp_path / "r.png")
    out = str(tmp_path / "c.gct2cache")
    native_loader.build_cache(str(tmp_path / "r.png"), 16, out)
    data, _ = cache_lib.read_cache(out)
    ref = _ref_resize_center_crop(arr, 16)
    diff = np.abs(data[0].astype(int) - ref.astype(int))
    assert diff.max() <= 1  # float rounding only


def test_cached_dataset_epochs_and_state(cache_file):
    ds = cache_lib.CachedDataset(cache_file, batch_size=3, seed=0)
    it = iter(ds)
    epoch = np.concatenate([next(it), next(it)])
    assert epoch.shape == (6, 16, 16, 3)
    # without replacement: all 6 records appear once
    assert len({bytes(r.tobytes()) for r in epoch}) == 6
    state = ds.state_dict()
    want = next(it)
    ds2 = cache_lib.CachedDataset(cache_file, batch_size=3, seed=0)
    ds2.set_state(state)
    np.testing.assert_array_equal(want, next(iter(ds2)))


def test_augmented_cached_dataset(cache_file):
    ds = cache_lib.AugmentedCachedDataset(cache_file, size=8, batch_size=2, seed=0)
    b = np.asarray(next(iter(ds)))
    assert b.shape == (2, 8, 8, 3)
    assert b.dtype == np.float32
    assert b.min() >= -1.0 and b.max() <= 127 / 128


def test_cached_dataset_trains(cache_file):
    """End-to-end: the cache feeds the real Runner."""
    import jax

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train.loop import Runner

    cfg = tiny_test_config(
        size=8, pixel_size=4, max_size=8, octaves=2, steps=3,
        batch_size=2, mesh_data=1, checkpoint_dir=None, donate_state=False,
    )
    ds = cache_lib.AugmentedCachedDataset(cache_file, size=8, batch_size=2)
    runner = Runner(cfg, dataset=ds)
    runner.fit(epochs=1, steps_per_epoch=2, log_samples=False)
    runner.close()


def test_cli_build_cache(tmp_path):
    from gan_class_transfer2_tpu import cli

    rng = np.random.default_rng(3)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        ).save(tmp_path / f"{i}.png")
    out = str(tmp_path / "c.bin")
    rc = cli.main([
        "build-cache", "--platform", "cpu",
        "--dataset-pattern", str(tmp_path / "*.png"),
        "--size", "16", "--octaves", "2", "--store", "18", "--out", out,
    ])
    assert rc == 0
    data, store = cache_lib.read_cache(out)
    assert store == 18 and data.shape[0] == 3
