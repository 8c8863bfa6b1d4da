"""Weight export/import round-trip (no TF needed)."""

import jax
import numpy as np

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.models import unet
from gan_class_transfer2_tpu.utils import tf_import


def test_export_import_roundtrip():
    cfg = tiny_test_config()
    p1 = unet.init_unet(jax.random.PRNGKey(0), cfg)
    flat = tf_import.export_flat_weights(cfg, p1)
    p2 = unet.init_unet(jax.random.PRNGKey(7), cfg)  # different init
    p2 = tf_import.import_flat_weights(cfg, p2, flat)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_with_block_depth():
    cfg = tiny_test_config(block_depth=1)
    p1 = unet.init_unet(jax.random.PRNGKey(0), cfg)
    flat = tf_import.export_flat_weights(cfg, p1)
    p2 = tf_import.import_flat_weights(
        cfg, unet.init_unet(jax.random.PRNGKey(3), cfg), flat
    )
    np.testing.assert_array_equal(
        np.asarray(p1["middle"][0]["kernel"]), np.asarray(p2["middle"][0]["kernel"])
    )
