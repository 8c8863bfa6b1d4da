"""Multi-host helpers (degenerate single-process form)."""

import numpy as np

from gan_class_transfer2_tpu.parallel import mesh as mesh_lib
from gan_class_transfer2_tpu.parallel import multihost


def test_initialize_single_host():
    assert multihost.initialize() == 0
    assert multihost.is_coordinator()


def test_host_local_batch_size():
    assert multihost.host_local_batch_size(8) == 8


def test_global_batch_assembly():
    m = mesh_lib.make_mesh(data=8, model=1)
    local = np.zeros((8, 4, 4, 3), np.float32)
    arr = multihost.global_batch_from_host_local(local, mesh_lib.batch_sharding(m))
    assert arr.shape == (8, 4, 4, 3)
