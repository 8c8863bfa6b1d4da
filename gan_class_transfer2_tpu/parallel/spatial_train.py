"""Training with spatially-sharded activations (high-resolution regime).

Two complementary mechanisms exist in this framework:

  * `spatial_unet.py` — explicit shard_map + hand-written halo exchange
    (full control, used when the automatic partitioner falls short);
  * this module — the GSPMD route: jit the *unchanged* training step with the
    batch's height axis sharded over a 'spatial' mesh axis and let XLA's
    spatial partitioner insert the conv halo exchanges itself. Zero model
    changes, works through the backward pass and optimizer update.

Use when a single sample's activations are too large for one chip (the
reference's scaling dimension is resolution — SURVEY §5); for ordinary sizes
prefer plain DP (`mesh.py`).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train import trainer as trainer_lib


def make_spatial_mesh(n: int | None = None, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    n = n or len(devices)
    if n > len(devices):
        # silent truncation would hand back fewer height shards than the
        # caller sized HBM for (make_dp_spatial_mesh already raises)
        raise ValueError(f"spatial mesh needs {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), ("spatial",))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch replicated, height sharded: (B, H/n per device, W, C)."""
    return NamedSharding(mesh, P(None, "spatial"))


def make_dp_spatial_mesh(data: int, spatial: int, devices=None) -> Mesh:
    """2-D mesh combining data parallelism with height sharding — for large
    resolutions where a full batch shard still overflows HBM."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    n = data * spatial
    if n > len(devices):
        raise ValueError(f"mesh {data}x{spatial} needs {n} devices")
    return Mesh(np.asarray(devices[:n]).reshape(data, spatial), ("data", "spatial"))


def dp_spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over 'data', height over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))


def _make_sharded_train_step(cfg, mesh: Mesh, batch_sh: NamedSharding):
    """jit the standard train step with the given batch sharding over the
    mesh (params replicated; XLA inserts the conv halo exchanges for any
    'spatial'-sharded height axis and the gradient reductions for 'data').
    ONE builder for the spatial and DP×spatial variants — they differ only
    in the batch PartitionSpec."""
    if cfg.num_classes > 0:
        # labeled dict batches would broadcast the rank-4 image sharding
        # onto the rank-1 label array and die inside jit with a rank
        # mismatch — reject with a clear message like the pipeline path
        raise ValueError(
            "spatial training supports the unconditional Denoiser only "
            "(num_classes == 0)"
        )
    optimizer = trainer_lib.make_optimizer(cfg)

    def step(state, batch, rng):
        return trainer_lib.train_step(
            cfg,
            optimizer,
            state,
            batch,
            rng,
            mesh_size=mesh.size,
            mesh=mesh,
            batch_spec=batch_sh.spec,
        )

    rep = NamedSharding(mesh, P())
    st_sh = jax.tree_util.tree_map(
        lambda _: rep,
        jax.eval_shape(
            lambda r: trainer_lib.init_state(cfg, r), jax.random.PRNGKey(0)
        ),
    )
    return jax.jit(
        step,
        in_shardings=(st_sh, batch_sh, rep),
        out_shardings=(st_sh, rep),
        donate_argnums=(0,) if cfg.donate_state else (),
    )


def make_dp_spatial_train_step(cfg, mesh: Mesh):
    """jit the standard train step over a (data × spatial) mesh: XLA shards
    the batch across 'data' and every activation's height across 'spatial'
    (inserting conv halo exchanges), with params replicated."""
    return _make_sharded_train_step(cfg, mesh, dp_spatial_batch_sharding(mesh))


def make_spatial_train_step(cfg, mesh: Mesh):
    """jit the standard train step with height-sharded activations."""
    return _make_sharded_train_step(cfg, mesh, spatial_batch_sharding(mesh))
