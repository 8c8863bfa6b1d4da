"""Synthetic dataset generator tests."""

import numpy as np

from gan_class_transfer2_tpu.data import synthetic


def test_circles_and_crosses_shapes():
    a = synthetic.circles(4, 32)
    b = synthetic.crosses(4, 32)
    assert a.shape == b.shape == (4, 32, 32, 3)
    assert a.min() >= -1 and a.max() <= 1
    # the two classes differ
    assert not np.allclose(a, b)


def test_colored_pair_statistics():
    a, b = synthetic.colored_pair(8, 16)
    assert a[..., 0].mean() > a[..., 2].mean()  # A red-dominant
    assert b[..., 2].mean() > b[..., 0].mean()  # B blue-dominant


def test_save_as_pngs(tmp_path):
    synthetic.save_as_pngs(synthetic.circles(3, 16), str(tmp_path), "c")
    import os

    assert len(os.listdir(tmp_path)) == 3
