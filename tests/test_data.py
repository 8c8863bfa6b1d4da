"""Data-pipeline tests: decode/augment semantics (reference train.py:285-321)."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.data import pipeline


@pytest.fixture
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
    # one grayscale image (channel-broadcast path, reference train.py:290)
    gray = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    Image.fromarray(gray, mode="L").save(tmp_path / "gray.png")
    return tmp_path


def test_decode_normalization_range(image_dir):
    rng = np.random.default_rng(0)
    img = pipeline.decode_image(str(image_dir / "img_0.png"), 16, rng)
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.float32
    assert img.min() >= -1.0 and img.max() <= 127 / 128  # uint8/128 - 1


def test_decode_grayscale_broadcast(image_dir):
    rng = np.random.default_rng(0)
    img = pipeline.decode_image(str(image_dir / "gray.png"), 16, rng)
    assert img.shape == (16, 16, 3)
    np.testing.assert_array_equal(img[..., 0], img[..., 1])


def test_decode_no_crop_when_exact_size(image_dir):
    rng = np.random.default_rng(0)
    arr = np.asarray(Image.open(image_dir / "img_0.png").convert("RGB"))
    img = pipeline.decode_image(str(image_dir / "img_0.png"), 24, rng)
    # only flip is possible; check content matches original or its mirror
    a = (arr.astype(np.float32) / 128) - 1
    assert np.allclose(img, a) or np.allclose(img, a[:, ::-1])


def test_image_dataset_batches(image_dir):
    ds = pipeline.ImageDataset(
        str(image_dir / "*.png"), size=16, batch_size=3, num_workers=1, seed=0
    )
    it = iter(ds)
    b1 = next(it)
    b2 = next(it)
    ds.close()
    assert b1.shape == (3, 16, 16, 3)
    assert b1.dtype == np.float32
    assert not np.array_equal(b1, b2)


def test_list_files_missing_raises():
    with pytest.raises(FileNotFoundError):
        pipeline.list_files("/nonexistent/*.png")


def test_array_dataset_iterates():
    images = np.random.default_rng(0).integers(
        0, 256, size=(10, 8, 8, 3), dtype=np.uint8
    )
    ds = pipeline.ArrayDataset(images, batch_size=4, seed=0)
    b = next(iter(ds))
    assert b.shape == (4, 8, 8, 3)
    assert b.max() <= 127 / 128 and b.min() >= -1.0


def test_device_iterator():
    images = np.random.default_rng(0).integers(
        0, 256, size=(10, 8, 8, 3), dtype=np.uint8
    )
    ds = pipeline.ArrayDataset(images, batch_size=2, seed=0)
    it = pipeline.device_iterator(ds)
    b = next(it)
    import jax

    assert isinstance(b, jax.Array)
    assert b.shape == (2, 8, 8, 3)


def test_make_datasets_per_class(image_dir, tmp_path):
    cfg = tiny_test_config(
        classes=(str(image_dir / "img_*.png"), str(image_dir / "gray*.png")),
        batch_size=1,
    )
    dsets = pipeline.make_datasets(cfg, num_workers=1)
    assert len(dsets) == 2
    for ds in dsets:
        ds.close()


def test_pipeline_fails_loudly_when_nothing_decodes(tmp_path):
    """Images all smaller than the crop size must raise, not hang
    (review finding: silent worker spin)."""
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"small_{i}.png")
    ds = pipeline.ImageDataset(
        str(tmp_path / "*.png"), size=16, batch_size=2, num_workers=1, seed=0
    )
    with pytest.raises(RuntimeError, match="consecutive decode failures"):
        next(iter(ds))
    ds.close()


def test_epoch_index_stream_without_replacement():
    """Every element exactly once per epoch (reference shuffle semantics,
    train.py:318), across batch boundaries."""
    from gan_class_transfer2_tpu.data.pipeline import EpochIndexStream

    s = EpochIndexStream(10, 4, seed=3)
    seen = np.concatenate([s.next_indices() for _ in range(5)])  # 2 epochs
    assert sorted(seen[:10]) == list(range(10))
    assert sorted(seen[10:20]) == list(range(10))
    # epochs are differently permuted
    assert not np.array_equal(seen[:10], seen[10:20])


def test_epoch_index_stream_state_roundtrip():
    from gan_class_transfer2_tpu.data.pipeline import EpochIndexStream

    a = EpochIndexStream(7, 3, seed=1)
    for _ in range(4):
        a.next_indices()
    state = a.state_dict()
    want = [a.next_indices() for _ in range(3)]

    b = EpochIndexStream(7, 3, seed=1)
    b.set_state(state)
    got = [b.next_indices() for _ in range(3)]
    np.testing.assert_array_equal(np.concatenate(want), np.concatenate(got))


def test_array_dataset_epoch_and_state():
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset

    images = np.arange(6, dtype=np.float32).reshape(6, 1, 1, 1) * np.ones(
        (6, 2, 2, 3), np.float32
    )
    ds = ArrayDataset(images, batch_size=2, seed=0, flip=False)
    it = iter(ds)
    first_epoch = np.concatenate([next(it) for _ in range(3)])
    # all 6 images exactly once
    vals = sorted(first_epoch[:, 0, 0, 0].tolist())
    assert vals == [0, 1, 2, 3, 4, 5]

    # resume from recorded position reproduces the continuation exactly
    state = ds.state_dict()
    want = [next(it) for _ in range(4)]
    ds2 = ArrayDataset(images, batch_size=2, seed=0, flip=False)
    ds2.set_state(state)
    it2 = iter(ds2)
    got = [next(it2) for _ in range(4)]
    np.testing.assert_array_equal(np.concatenate(want), np.concatenate(got))


def test_decode_image_flip_false_is_deterministic(tmp_path):
    """flip=False decodes (FID reference sets) never mirror the image and
    leave the crop-corner stream unchanged (review r3: the eval decodes
    claimed 'no flip' while flipping half the reference images)."""
    from PIL import Image as PILImage

    from gan_class_transfer2_tpu.data import pipeline

    arr = np.zeros((16, 16, 3), np.uint8)
    arr[:, :8] = 255  # left half white: a flip is detectable
    p = tmp_path / "img.png"
    PILImage.fromarray(arr).save(p)
    for seed in range(6):
        out = pipeline.decode_image(
            str(p), 16, np.random.default_rng(seed), crop=True, flip=False
        )
        assert (out[:, :8] > 0).all() and (out[:, 8:] < 0).all()


def test_decode_eval_set_skips_bad_files(tmp_path):
    """held_out_split reserves files blindly; a reserved file training
    would skip (too small to broadcast, corrupt bytes) must SHRINK the
    eval set, not crash runner construction (review r3e)."""
    from PIL import Image as PILImage

    r = np.random.default_rng(0)
    good = []
    for i in range(3):
        p = tmp_path / f"good_{i}.png"
        PILImage.fromarray(
            r.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        ).save(p)
        good.append(str(p))
    small = tmp_path / "small.png"  # 4x4 < 16: broadcast_to raises
    PILImage.fromarray(
        r.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    ).save(small)
    corrupt = tmp_path / "corrupt.png"
    corrupt.write_bytes(b"not a png at all")

    files = [good[0], str(small), good[1], str(corrupt), good[2]]
    out = pipeline.decode_eval_set(files, 16, seed=0)
    assert out.shape == (3, 16, 16, 3)
    assert out.dtype == np.float32
    # all bad: empty (0, size, size, 3) set, still well-shaped
    empty = pipeline.decode_eval_set([str(small), str(corrupt)], 16)
    assert empty.shape == (0, 16, 16, 3)


def test_epoch_stream_rejects_empty_source():
    """n=0 (e.g. a zero-count cache from an interrupted build) must raise,
    not make next_indices spin forever (review r3e)."""
    with pytest.raises(ValueError, match="empty"):
        pipeline.EpochIndexStream(0, 4)


def test_decode_image_rejects_degenerate_dimensions(tmp_path):
    """A 1-pixel-dimension image (tracking-pixel GIFs in scraped data) must
    be skipped like other too-small images — broadcast_to would otherwise
    stretch it into a constant-color training sample (review r3e)."""
    from PIL import Image as PILImage

    p = tmp_path / "pixel.png"
    PILImage.fromarray(np.zeros((1, 1, 3), np.uint8)).save(p)
    with pytest.raises(ValueError, match="smaller than crop"):
        pipeline.decode_image(str(p), 16, np.random.default_rng(0), crop=True)


def test_device_iterator_consumed_state_excludes_prefetch():
    """The double-buffered iterator pre-pulls one batch, so the dataset's
    own counters run one ahead of training; consumed_state() is the exact
    position a resumed run must continue from (review r4 — persisting the
    raw counter skipped one batch per restart)."""
    import numpy as np

    from gan_class_transfer2_tpu.data import pipeline

    images = np.arange(12 * 4 * 4 * 3, dtype=np.float32).reshape(
        12, 4, 4, 3
    ) / 1000.0
    ds = pipeline.ArrayDataset(images, batch_size=2, seed=0, flip=False)
    it = pipeline.device_iterator(ds)
    assert it.consumed_state() is None  # nothing consumed yet
    next(it)
    assert ds.state_dict()["position"] == 2  # one prefetched ahead
    assert it.consumed_state()["position"] == 1

    # a fresh dataset restored at consumed_state must yield, as its FIRST
    # batch, exactly the batch the original training has NOT yet seen
    ds2 = pipeline.ArrayDataset(images, batch_size=2, seed=0, flip=False)
    ds2.set_state(it.consumed_state())
    resumed = next(pipeline.device_iterator(ds2))
    original = next(it)
    np.testing.assert_array_equal(np.asarray(original), np.asarray(resumed))


def test_device_iterator_yields_final_batch_on_exhaustion():
    """The prefetching iterator must not drop the already-transferred
    pending batch when the source ends (review r4)."""
    import numpy as np

    from gan_class_transfer2_tpu.data import pipeline

    batches = [np.full((2, 4, 4, 3), i, np.float32) for i in range(3)]
    it = pipeline.device_iterator(batches)
    got = [float(np.asarray(b)[0, 0, 0, 0]) for b in it]
    assert got == [0.0, 1.0, 2.0]


def test_image_dataset_rejects_zero_workers(tmp_path):
    import numpy as np
    from PIL import Image

    from gan_class_transfer2_tpu.data import pipeline

    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / "a.png")
    ds = pipeline.ImageDataset(
        str(tmp_path / "*.png"), 8, 1, num_workers=0
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="num_workers"):
        next(iter(ds))


def test_decode_image_center_crop_is_deterministic(tmp_path):
    import numpy as np
    from PIL import Image

    from gan_class_transfer2_tpu.data import pipeline

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    a = pipeline.decode_image(
        str(p), 8, np.random.default_rng(1), flip=False, center=True
    )
    b = pipeline.decode_image(
        str(p), 8, np.random.default_rng(99), flip=False, center=True
    )
    np.testing.assert_array_equal(a, b)  # rng-independent
    want = arr[2:10, 4:12].astype(np.float32) / 128.0 - 1.0
    np.testing.assert_allclose(a, want, atol=1e-6)


def test_data_hbm_validation():
    with pytest.raises(ValueError, match="data_hbm"):
        tiny_test_config(data_hbm=8).validate()  # < size
    tiny_test_config(data_hbm=16).validate()  # == size ok


def test_make_datasets_hbm(image_dir):
    """cfg.data_hbm builds HBM-resident per-class datasets: decode once to
    uint8 center crops, draw + augment on device (r5 — the streaming path's
    per-step host->device transfer leaks its byte size on tunneled
    platforms, tools/probe_transfer_leak.py)."""
    import jax

    from gan_class_transfer2_tpu.data import device_augment

    cfg = tiny_test_config(
        classes=(str(image_dir / "img_*.png"), str(image_dir / "gray*.png")),
        batch_size=2, data_hbm=20, size=16,
    )
    dsets = pipeline.make_datasets(cfg)
    assert len(dsets) == 2
    assert all(isinstance(d, device_augment.HBMDataset) for d in dsets)
    b = next(iter(dsets[0]))
    assert isinstance(b, jax.Array)
    assert b.shape == (2, 16, 16, 3)
    bn = np.asarray(b)
    assert bn.min() >= -1.0 and bn.max() <= 127 / 128
    for d in dsets:
        d.close()


def test_load_hbm_pool_skips_small_files(image_dir, capsys):
    rng = np.random.default_rng(0)
    small = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    Image.fromarray(small).save(image_dir / "tiny.png")
    files = pipeline.list_files(str(image_dir / "*.png"))
    pool = pipeline.load_hbm_pool(files, 20)
    assert pool.shape == (6, 20, 20, 3)  # 5 rgb + 1 gray; tiny skipped
    assert pool.dtype == np.uint8
    assert "skipped" in capsys.readouterr().out


def test_load_hbm_pool_clamps_to_corpus_minimum(image_dir, capsys):
    """Images accepted by the streaming pipeline (>= size) but smaller than
    the requested pool side must CLAMP the side, not be dropped — dropping
    would train on a silently biased subset of the corpus (r5 review)."""
    rng = np.random.default_rng(1)
    mid = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    Image.fromarray(mid).save(image_dir / "mid.png")
    files = pipeline.list_files(str(image_dir / "*.png"))
    pool = pipeline.load_hbm_pool(files, 20, size=12)
    assert pool.shape == (7, 16, 16, 3)  # all 7 accepted at clamped side 16
    assert "clamped 20 -> 16" in capsys.readouterr().out


def test_load_hbm_pool_parallel_matches_serial(image_dir):
    files = pipeline.list_files(str(image_dir / "*.png"))
    serial = pipeline.load_hbm_pool(files, 20, workers=1)
    threaded = pipeline.load_hbm_pool(files, 20, workers=4)
    np.testing.assert_array_equal(serial, threaded)


def test_load_hbm_pool_center_crop_content(image_dir):
    files = [str(image_dir / "img_0.png")]
    pool = pipeline.load_hbm_pool(files, 20)
    full = np.asarray(Image.open(files[0]).convert("RGB"))
    np.testing.assert_array_equal(pool[0], full[2:22, 2:22])
