"""Shard-aware fused diffusion (ops/kernels.forward_diffuse_fused_sharded).

Mosaic kernels cannot be GSPMD-partitioned (JAX tpu_custom_call.py raises
"Please wrap the call in a shard_map" whenever the program compiles for >1
device), so on multi-device meshes the fused diffusion kernel runs inside a
shard_map island with per-device decorrelated seeds. The kernel itself only
lowers on TPU; these tests cover the island's plumbing on the virtual CPU
mesh by substituting the kernel with a probe, plus the pure-Python
local-shape/alignment predicates. Hardware execution of the island is
validated separately on TPU (BASELINE_MEASURED.md / commit log).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gan_class_transfer2_tpu.config import Config, tiny_test_config
from gan_class_transfer2_tpu.ops import kernels

# these tests exercise the ISLAND plumbing, which needs >= 4 devices (the
# virtual CPU mesh in the default suite); under GCT2_TEST_PLATFORM=tpu on
# a single-chip host they must skip, not fail on mesh construction
pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs a >=4-device mesh (virtual CPU)"
)


@pytest.fixture
def mesh4():
    return Mesh(np.array(jax.devices()[:4]), ("data",))


def test_local_shape_and_alignment_predicates():
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "spatial"))
    cfg = tiny_test_config()
    assert kernels._local_shape((8, 64, 64, 3), P("data", "spatial"), mesh) == (
        4, 32, 64, 3,
    )
    # tuple entry: both axes shard the batch dim
    assert kernels._local_shape(
        (8, 64, 64, 3), P(("data", "spatial")), mesh
    ) == (2, 64, 64, 3)
    # indivisible batch
    assert kernels._local_shape((5, 64, 64, 3), P("data"), mesh) is None
    # local 32*64*3 = 6144 lanes-aligned
    assert kernels.fused_sharded_ok(cfg, (8, 64, 64, 3), mesh, P("data", "spatial"))
    # local 4*8*3 = 96 < 128 — not aligned
    assert not kernels.fused_sharded_ok(cfg, (8, 8, 8, 3), mesh, P("data", "spatial"))


def test_island_decorrelates_seed_per_device(mesh4, monkeypatch):
    """Each device's shard must get a distinct PRNG seed (the in-kernel fold
    repeats identically per device otherwise). Probe: replace the kernel
    with seed-broadcast and read the per-device values back."""
    captured = kernels.fused_forward_diffuse

    def probe(flat, ss, sn, interpret, seed=0):
        return jnp.full_like(flat, jnp.asarray(seed, jnp.float32))

    monkeypatch.setattr(kernels, "fused_forward_diffuse", probe)
    # bypass the off-TPU fallback: these tests probe the ISLAND plumbing
    monkeypatch.setattr(kernels, "_kernel_available", lambda: True)
    cfg = Config(steps=200)
    b, h, w, c = 8, 16, 8, 1  # local flat 128 per sample
    x = jnp.zeros((b, h, w, c), jnp.float32)
    t = jnp.full((b, 1, 1, 1), 100.0, jnp.float32)
    rng = jax.random.PRNGKey(0)
    out = np.asarray(
        kernels.forward_diffuse_fused_sharded(cfg, x, t, rng, mesh4, P("data"))
    )
    per_device = [out[i * 2 : (i + 1) * 2] for i in range(4)]
    vals = [np.unique(blk) for blk in per_device]
    assert all(len(v) == 1 for v in vals), "seed must be constant per device"
    seeds = [v[0] for v in vals]
    assert len(set(seeds.__iter__())) == len(set(map(float, seeds))) == 4, (
        "every device must receive a distinct seed: %r" % seeds
    )
    # matches the documented hash: seed ^ ((lin+1)·knuth), int32 wraparound
    base = int(jax.random.randint(rng, (), 0, 2**31 - 1, jnp.int32))
    expect = [
        np.float32(np.int32(base) ^ np.int32((lin + 1) * np.int64(-1640531527)))
        for lin in range(4)
    ]
    np.testing.assert_array_equal(sorted(map(float, seeds)), sorted(map(float, expect)))
    assert kernels.fused_forward_diffuse is probe  # monkeypatch active
    monkeypatch.setattr(kernels, "fused_forward_diffuse", captured)


def test_island_shards_scales_with_batch(mesh4, monkeypatch):
    """ss/sn must arrive per-device with the LOCAL batch slice."""
    shapes = []

    def probe(flat, ss, sn, interpret, seed=0):
        shapes.append((flat.shape, ss.shape))
        return flat + ss[:, None]

    monkeypatch.setattr(kernels, "fused_forward_diffuse", probe)
    # bypass the off-TPU fallback: these tests probe the ISLAND plumbing
    monkeypatch.setattr(kernels, "_kernel_available", lambda: True)
    cfg = Config(steps=200)
    x = jnp.zeros((8, 16, 8, 1), jnp.float32)
    t = jnp.reshape(jnp.arange(1, 9, dtype=jnp.float32), (8, 1, 1, 1))
    out = kernels.forward_diffuse_fused_sharded(
        cfg, x, t, jax.random.PRNGKey(1), mesh4, P("data")
    )
    assert out.shape == x.shape
    assert shapes[0] == ((2, 128), (2,))  # local batch 2, flat 128
    # per-sample scale landed on the right sample: out[b] == sqrt(ad(t_b))
    from gan_class_transfer2_tpu.core.schedule import alpha_dash

    want = np.sqrt(np.asarray(alpha_dash(np.arange(1, 9.0), cfg.steps)))
    got = np.asarray(out)[:, 0, 0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_trainer_gates_fused_on_unaligned_local_shape(mesh4):
    """diffusion_loss must fall back to the unfused path when the local
    shard is not lane-aligned (fused_sharded_ok False) — exercised via the
    predicate here; the trainer branch uses exactly this predicate."""
    cfg = tiny_test_config(fused_diffusion=True)
    assert not kernels.fused_sharded_ok(cfg, (8, 8, 8, 3), mesh4, P("data"))
    assert kernels.fused_sharded_ok(cfg, (8, 16, 8, 1), mesh4, P("data"))
