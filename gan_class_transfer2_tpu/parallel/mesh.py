"""Device mesh, sharding rules, and the multi-chip training step.

The reference is single-process single-GPU with no collectives anywhere
(reference train.py:40; SURVEY §2.3). This layer provides the TPU-native
scaling path required by BASELINE.json: a 2-D ``jax.sharding.Mesh``
(axes ``data`` × ``model``), batch sharded over ``data`` (DP), conv/dense
output channels optionally sharded over ``model`` (TP), with XLA emitting the
gradient ``psum`` / activation collectives over ICI from the sharding
annotations — no hand-written NCCL/MPI analogue.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train import trainer as trainer_lib


def make_mesh(cfg=None, devices=None, data: int = 0, model: int = 1,
              slices: int = 1) -> Mesh:
    """Build a (data, model) mesh — or (slice, data, model) when
    ``slices > 1`` for multi-slice pods. ``data=0`` → all remaining devices.

    The 'slice' axis is the DCN dimension: batches shard over
    ('slice', 'data') so per-slice gradient reduction rides ICI and only the
    cross-slice partial sums cross DCN (XLA's hierarchical all-reduce does
    this automatically from the shardings on real pod topologies); params
    and optimizer state never shard over 'slice'."""
    devices = list(devices if devices is not None else jax.devices())
    if cfg is not None:
        data = cfg.mesh_data
        model = cfg.mesh_model
        slices = getattr(cfg, "mesh_slice", 1)
    model = max(model, 1)
    slices = max(slices, 1)
    if data <= 0:
        data = max(len(devices) // (model * slices), 1)
    n = slices * data * model
    if n > len(devices):
        raise ValueError(
            f"mesh {slices}x{data}x{model} needs {n} devices, have {len(devices)}"
        )
    if slices > 1:
        arr = np.asarray(devices[:n]).reshape(slices, data, model)
        return Mesh(arr, ("slice", "data", "model"))
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    if "slice" in mesh.axis_names:
        return NamedSharding(mesh, P(("slice", "data")))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_spec(leaf, model_size: int) -> P:
    """Tensor-parallel rule: shard the output-channel (last) axis of conv
    kernels over 'model' when it divides evenly; everything else replicated.

    At the reference's 41.7 M params TP is optional (SURVEY §2.3) — rule
    degrades to full replication when mesh_model == 1."""
    if model_size <= 1 or not hasattr(leaf, "ndim"):
        return P()
    if leaf.ndim == 4 and leaf.shape[-1] % model_size == 0 and leaf.shape[-1] >= 2 * model_size:
        return P(None, None, None, "model")
    return P()


def _zero1_spec(leaf, mesh: Mesh) -> P:
    """ZeRO-1 rule for optimizer-state leaves: shard the output-channel
    (last) axis over the 'data' axis (stacked with 'model' for 4-D kernels
    that the TP rule also splits). Each DP rank then stores 1/data of the
    Adam moments; XLA reduce-scatters gradients into the moment shards and
    all-gathers the updates back onto the replicated params."""
    data, model = mesh.shape["data"], mesh.shape["model"]
    if not hasattr(leaf, "ndim") or leaf.ndim == 0 or data <= 1:
        return _leaf_spec(leaf, model)
    last = leaf.shape[-1]
    if leaf.ndim == 4 and model > 1 and last % (data * model) == 0:
        return P(None, None, None, ("data", "model"))
    if last % data == 0 and last >= 2 * data:
        return P(*([None] * (leaf.ndim - 1)), "data")
    return _leaf_spec(leaf, model)


# Registry of optimizer-state fields across the state NamedTuples
# (TrainState.opt_state, GANState.g_opt/d_opt, ConditionalGANState.g_opt/
# d_opt). Exact TOP-LEVEL field-name membership — not a substring test on
# the whole path, which would silently reshard any future field that merely
# contains "opt" (VERDICT r2 weak #5). A new state type with optimizer
# moments must list its field here for ZeRO-1 to shard them.
OPT_STATE_FIELDS = frozenset({"opt_state", "g_opt", "d_opt"})


def _is_opt_state_path(path) -> bool:
    if not path:
        return False
    return getattr(path[0], "name", None) in OPT_STATE_FIELDS


def state_shardings(state: Any, mesh: Mesh, zero1: bool = False):
    """Sharding tree matching a TrainState (params + optimizer state + EMA).

    ``zero1``: apply the ZeRO-1 rule to every leaf under a registered
    optimizer-state field (OPT_STATE_FIELDS), leaving params/EMA on the TP
    rule."""
    model_size = mesh.shape["model"]

    def spec(path, leaf):
        if zero1 and _is_opt_state_path(path):
            return NamedSharding(mesh, _zero1_spec(leaf, mesh))
        return NamedSharding(mesh, _leaf_spec(leaf, model_size))

    return jax.tree_util.tree_map_with_path(spec, state)


def init_sharded_state(cfg, mesh: Mesh, rng) -> trainer_lib.TrainState:
    """Initialise TrainState directly with the mesh shardings (weights are
    created on-device, already placed — no host round-trip)."""
    abstract = jax.eval_shape(lambda r: trainer_lib.init_state(cfg, r), rng)
    shardings = state_shardings(abstract, mesh, zero1=cfg.zero1)
    return jax.jit(
        lambda r: trainer_lib.init_state(cfg, r), out_shardings=shardings
    )(rng)


def warn_misaligned_batch(cfg, mesh: Mesh, backend: str = None) -> None:
    """Warn when the per-chip batch is not a multiple of 8 on TPU.

    Measured (BASELINE_MEASURED.md "Planner calibration grid"): XLA pads
    the batch dim to the next sublane multiple and the padded fraction is
    wasted work — 1024² b12 runs at the b16 rate × 12/16 (−27%), 256² b36
    at the b40 rate × 36/40 (−10%). Called once per step construction."""
    import sys

    if backend is None:
        backend = jax.default_backend()
    n = data_axis_size(mesh)
    per_chip, rem = divmod(cfg.batch_size, n)
    if backend != "tpu" or rem:  # indivisible batches error elsewhere
        return
    if per_chip >= 1 and per_chip % 8:
        pad = -(-per_chip // 8) * 8
        print(
            f"warning: per-chip batch {per_chip} is not a multiple of 8 — "
            f"the TPU pads it to {pad} ({1 - per_chip / pad:.0%} of each "
            f"step is wasted padding); consider a global batch of "
            f"{pad * n}",
            file=sys.stderr,
        )


def make_parallel_train_step(cfg, mesh: Mesh, example_state=None):
    """jit-compile the training step over the mesh.

    Batch: P('data'); state: TP rule above; rng replicated. XLA inserts the
    DP gradient all-reduce and any TP collectives automatically."""
    warn_misaligned_batch(cfg, mesh)
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
            batch_spec=batch_sharding(mesh).spec,
        )

    if example_state is None:
        example_state = jax.eval_shape(
            lambda r: trainer_lib.init_state(cfg, r), jax.random.PRNGKey(0)
        )
    st_sh = state_shardings(example_state, mesh, zero1=cfg.zero1)
    b_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(st_sh, b_sh, rep),
        out_shardings=(st_sh, rep),
        donate_argnums=(0,) if cfg.donate_state else (),
    )


def make_parallel_gan_train_step(cfg, mesh: Mesh, example_state=None):
    """jit the GAN cycle step over the mesh: both class batches sharded on
    'data', G/D params under the TP rule, metrics replicated."""
    from ..train import gan as gan_lib

    warn_misaligned_batch(cfg, mesh)
    g_opt = gan_lib.make_optimizer(cfg)
    d_opt = gan_lib._d_optimizer(cfg)

    def step(state, batch_a, batch_b, rng):
        return gan_lib.gan_train_step(cfg, g_opt, d_opt, state, batch_a, batch_b, rng)

    if example_state is None:
        example_state = jax.eval_shape(
            lambda r: gan_lib.init_gan_state(cfg, r), jax.random.PRNGKey(0)
        )
    st_sh = state_shardings(example_state, mesh, zero1=cfg.zero1)
    b_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    # `rep` as a PREFIX sharding for the whole metrics dict — the key set
    # varies with cfg (e.g. "r1" appears when r1_weight > 0), and every
    # metric is a replicated scalar
    return jax.jit(
        step,
        in_shardings=(st_sh, b_sh, b_sh, rep),
        out_shardings=(st_sh, rep),
        donate_argnums=(0,) if cfg.donate_state else (),
    )


def init_sharded_gan_state(cfg, mesh: Mesh, rng):
    from ..train import gan as gan_lib

    abstract = jax.eval_shape(lambda r: gan_lib.init_gan_state(cfg, r), rng)
    shardings = state_shardings(abstract, mesh, zero1=cfg.zero1)
    return jax.jit(
        lambda r: gan_lib.init_gan_state(cfg, r), out_shardings=shardings
    )(rng)


def init_sharded_conditional_gan_state(cfg, mesh: Mesh, rng):
    from ..train import conditional_gan as cgan_lib

    abstract = jax.eval_shape(
        lambda r: cgan_lib.init_conditional_gan_state(cfg, r), rng
    )
    shardings = state_shardings(abstract, mesh, zero1=cfg.zero1)
    return jax.jit(
        lambda r: cgan_lib.init_conditional_gan_state(cfg, r),
        out_shardings=shardings,
    )(rng)


def make_parallel_conditional_gan_train_step(cfg, mesh: Mesh, example_state=None):
    """jit the StarGAN-style conditional step over the mesh (labeled batch
    dict sharded on 'data', params under the TP rule)."""
    from ..train import conditional_gan as cgan_lib
    from ..train import gan as gan_lib

    warn_misaligned_batch(cfg, mesh)
    g_opt = trainer_lib.make_optimizer(cfg)
    d_opt = gan_lib._d_optimizer(cfg)  # honors cfg.d_learning_rate

    def step(state, batch, rng):
        return cgan_lib.conditional_gan_train_step(
            cfg, g_opt, d_opt, state, batch, rng
        )

    if example_state is None:
        example_state = jax.eval_shape(
            lambda r: cgan_lib.init_conditional_gan_state(cfg, r),
            jax.random.PRNGKey(0),
        )
    st_sh = state_shardings(example_state, mesh, zero1=cfg.zero1)
    b_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    # prefix sharding for the metrics dict (key set varies with cfg)
    return jax.jit(
        step,
        in_shardings=(st_sh, b_sh, rep),
        out_shardings=(st_sh, rep),
        donate_argnums=(0,) if cfg.donate_state else (),
    )


def data_axis_size(mesh: Mesh) -> int:
    """Total data-parallel extent of the mesh (slice × data on pods)."""
    n = mesh.shape["data"]
    if "slice" in mesh.axis_names:
        n *= mesh.shape["slice"]
    return n


def shard_sample_batch(batch, mesh: Mesh):
    """Pad a sampler batch to the mesh's data extent and constrain it to the
    data axis, so the T-step reverse-diffusion scan runs data-parallel
    instead of replicated (VERDICT r2 next #3 — the 401-call eval program
    and the serving sampler are the second hot loop, SURVEY §3.4).

    Returns (sharded_batch, real_count); callers slice outputs back to
    ``real_count``. Zero-padding is sound: padded lanes run the same program
    on junk data and are sliced away."""
    import jax.numpy as jnp

    n = batch.shape[0]
    if mesh is None or mesh.size <= 1 or "data" not in mesh.axis_names:
        return batch, n
    d = data_axis_size(mesh)
    pad = (-n) % d
    if pad:
        batch = jnp.concatenate(
            [batch, jnp.zeros((pad,) + batch.shape[1:], batch.dtype)], 0
        )
    spec = P(("slice", "data")) if "slice" in mesh.axis_names else P("data")
    return jax.lax.with_sharding_constraint(
        batch, NamedSharding(mesh, spec)
    ), n


def make_data_parallel_apply(mesh, fn):
    """jit ``fn(params, batch, *extras)`` so the leading-axis batch runs
    data-parallel over the mesh: the batch (and every extra whose leading
    dim matches it, e.g. a per-sample class vector) is zero-padded to the
    data extent and constrained to the data axis; padding rows are sliced
    off the result. Params keep their own (TP/replicated) sharding.

    This is the one-forward-pass sibling of ``shard_sample_batch``'s use in
    the T-step sampler programs — it covers the GAN transfer evals and the
    serving denoise/transfer endpoints, which are single U-Net forwards
    (reference train.py:333-337 analogue). On a trivial mesh it is a plain
    jit (still a win over the per-op eager dispatch it replaces)."""
    if mesh is None or mesh.size <= 1 or "data" not in mesh.axis_names:
        return jax.jit(fn)
    rep = replicated_sharding(mesh)

    def wrapped(params, batch, *extras):
        n = batch.shape[0]
        b, real = shard_sample_batch(batch, mesh)
        ex = tuple(
            shard_sample_batch(e, mesh)[0]
            if hasattr(e, "ndim") and e.ndim >= 1 and e.shape[0] == n
            else e
            for e in extras
        )
        return fn(params, b, *ex)[:real]

    # outputs replicated: callers device_get them (TensorBoard/HTTP), which
    # on a pod requires fully-addressable arrays on every host
    return jax.jit(wrapped, out_shardings=rep)


def make_parallel_eval_fn(cfg, mesh: Mesh):
    """Eval/sampler program jitted over the mesh. The single-image stages
    (preview, inversion) are replicated (TP-sharded params still parallelise
    their convs); the (2 + 4·B)-image sampler stage — 200 of the 401
    denoiser calls — is padded to the data axis and runs data-parallel."""
    rep = NamedSharding(mesh, P())
    # outputs replicated: the caller device_gets them for TensorBoard, which
    # on a pod requires fully-addressable (replicated) arrays on every host
    return jax.jit(
        sampler_eval(cfg, mesh),
        in_shardings=(None, rep, rep, rep),
        out_shardings=rep,
    )


def sampler_eval(cfg, mesh: Mesh | None = None):
    from ..sample import sampler

    def eval_fn(params, example_image, noise_bank, dictionary):
        denoised, rmse = sampler.preview(cfg, params, example_image, noise_bank[:1])
        x_theta, epsilon_theta = sampler.invert(cfg, params, example_image)
        batch = sampler.edit_noise(cfg, epsilon_theta, dictionary, noise_bank)
        batch, n = shard_sample_batch(batch, mesh)
        result = sampler.sample(cfg, params, batch)
        return {
            "denoised": denoised,
            "example_loss": rmse,
            "fake": result.images[:n],
            "step_1": result.snapshots[0][:n],
            "step_0.75": result.snapshots[1][:n],
            "step_0.5": result.snapshots[2][:n],
            "step_0.25": result.snapshots[3][:n],
        }

    return eval_fn
