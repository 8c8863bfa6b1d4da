"""Round-trip tests for the from-scratch TensorBoard event writer
(reference observability surface: train.py:356-361, 489-503)."""

import os
import struct

import numpy as np
import pytest

from gan_class_transfer2_tpu.utils import tensorboard as tb


def test_crc32c_known_vectors():
    # standard CRC-32C test vectors
    assert tb.crc32c(b"") == 0x0
    assert tb.crc32c(b"123456789") == 0xE3069283
    assert tb.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = tb.SummaryWriter(str(tmp_path))
    w.scalar("example loss", 0.125, step=3)
    w.scalar("loss", 0.5, step=4)
    w.close()
    events = list(tb.read_events(w.path))
    kinds = [e[2] for e in events]
    assert kinds[0] == "file_version"
    scalars = [(e[0], e[1], e[3]) for e in events if e[2] == "scalar"]
    assert scalars == [(3, "example loss", 0.125), (4, "loss", 0.5)]


def test_image_roundtrip(tmp_path):
    from PIL import Image
    import io

    w = tb.SummaryWriter(str(tmp_path))
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, size=(2, 8, 8, 3)).astype(np.float32)
    w.image("fake", imgs, step=7, max_outputs=10)
    w.close()
    images = [(e[0], e[1], e[3]) for e in tb.read_events(w.path) if e[2] == "image"]
    assert [t for _, t, _ in images] == ["fake/image/0", "fake/image/1"]
    step, tag, png = images[0]
    assert step == 7
    decoded = np.asarray(Image.open(io.BytesIO(png)))
    np.testing.assert_array_equal(decoded, tb.to_uint8(imgs[0]))


def test_max_outputs_limits(tmp_path):
    w = tb.SummaryWriter(str(tmp_path))
    imgs = np.zeros((6, 4, 4, 3), np.float32)
    w.image("fake", imgs, step=0, max_outputs=3)
    w.close()
    images = [e for e in tb.read_events(w.path) if e[2] == "image"]
    assert len(images) == 3


def test_reference_log_dir_layout(tmp_path):
    d = tb.reference_log_dir(str(tmp_path / "logs"))
    parts = d.split(os.sep)
    assert len(parts[-1]) == 6 and parts[-1].isdigit()  # HHMMSS
    assert len(parts[-2]) == 8 and parts[-2].isdigit()  # YYYYMMDD


@pytest.mark.skipif(
    os.environ.get("RUN_TF_PARITY") != "1",
    reason="slow TF import; opt-in parity check",
)
def test_tf_can_read_our_events(tmp_path):
    w = tb.SummaryWriter(str(tmp_path))
    w.scalar("example loss", 0.25, step=1)
    w.close()
    import tensorflow as tf

    recs = list(tf.data.TFRecordDataset(w.path))
    assert len(recs) == 2
    ev = tf.compat.v1.Event.FromString(recs[1].numpy())
    assert ev.step == 1
    assert ev.summary.value[0].tag == "example loss"
    assert abs(ev.summary.value[0].simple_value - 0.25) < 1e-6


def test_image_accepts_channelless_grayscale_batch(tmp_path):
    """(B, H, W) float batches must be treated as B grayscale images, not
    one HWC image with colorspace=W (review r4)."""
    from gan_class_transfer2_tpu.utils import tensorboard as tb

    w = tb.SummaryWriter(str(tmp_path))
    batch = np.linspace(0, 1, 2 * 8 * 8, dtype=np.float32).reshape(2, 8, 8)
    w.image("gray", batch, step=0, max_outputs=2)
    w.image("single", batch[0], step=0)  # (H, W) single image
    w.close()
    tags = {e[1] for e in tb.read_events(w.path) if e[1]}
    assert "gray/image/0" in tags and "gray/image/1" in tags
    assert "single/image" in tags
