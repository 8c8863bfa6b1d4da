"""Pallas TPU kernels for the hot elementwise paths.

The diffusion algebra (reference train.py:231-234) is pure elementwise work
bracketing the U-Net: ``noised = x·√ᾱ + ε·√(1−ᾱ)`` with ``ε ~ N(0,1)``.
Done naively, XLA materialises ε in HBM (generate → write → read). Under the
default ``predict_x`` parameterization ε is never needed again
(target = x, train.py:243-244), so the fused kernel below generates ε
*inside* the kernel with the on-core PRNG (Box–Muller over
``pltpu.prng_random_bits``) and writes only ``noised`` — one HBM read (x) and
one write (noised) instead of read+2·write+read.

Backward is trivial (d noised / dx = √ᾱ) via custom VJP — no recompute, no
stored residuals beyond the per-sample scale.

Used when ``cfg.fused_diffusion`` and parameterization == 'x' on TPU;
`interpret=True` path keeps it testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _normal_from_bits(bits_a, bits_b, dtype):
    """Box–Muller: two uint32 arrays -> one standard-normal array."""
    # uniform in (0, 1): top 24 bits scaled, offset to avoid log(0).
    # Mosaic can't cast uint32->f32 directly; >>8 clears the sign bit so a
    # bitcast to int32 is value-preserving and int32->f32 is supported.
    a24 = pltpu.bitcast(bits_a >> 8, jnp.int32)
    b24 = pltpu.bitcast(bits_b >> 8, jnp.int32)
    u1 = a24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
    u2 = b24.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return (r * jnp.cos(_TWO_PI * u2)).astype(dtype)


def _diffuse_kernel(seed_ref, ss_ref, sn_ref, x_ref, out_ref):
    b = pl.program_id(0)
    n = pl.program_id(1)
    # decorrelate the PRNG stream per (sample, block); Mosaic caps prng_seed
    # at 2 components, so fold (b, n) into one
    pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + n)
    bits_a = pltpu.prng_random_bits(x_ref.shape)
    bits_b = pltpu.prng_random_bits(x_ref.shape)
    eps = _normal_from_bits(
        pltpu.bitcast(bits_a, jnp.uint32),
        pltpu.bitcast(bits_b, jnp.uint32),
        x_ref.dtype,
    )
    ss = ss_ref[b, 0]  # √ᾱ(t_b)
    sn = sn_ref[b, 0]  # √(1−ᾱ(t_b))
    out_ref[:] = x_ref[:] * ss.astype(x_ref.dtype) + eps * sn.astype(x_ref.dtype)


def _pick_rows(rows: int, sublane: int = 8) -> int:
    """Largest row-block ≤512 that divides rows and is a multiple of the
    dtype's Mosaic sublane tile (8 for fp32, 16 for bf16 — a partial block
    is only legal when it is the whole array); falls back to the whole
    array (always legal)."""
    for blk in (512, 256, 128, 64, 32, 16, 8):
        if blk % sublane == 0 and rows % blk == 0:
            return blk
    return rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_forward_diffuse(x, scale_signal, scale_noise, interpret=False, seed=0):
    """``x·scale_signal[b] + ε·scale_noise[b]`` with in-kernel ε ~ N(0,1).

    x: (B, N) — flattened per-sample pixels, N a multiple of 128.
    scale_signal/scale_noise: (B,) fp32. seed: python/int32 scalar.
    """
    return _fused_fwd_impl(x, scale_signal, scale_noise, interpret, seed)


def _fused_fwd_impl(x, scale_signal, scale_noise, interpret, seed):
    b, n = x.shape
    assert n % 128 == 0, f"flattened sample size {n} must be a multiple of 128"
    rows = n // 128
    rblk = _pick_rows(rows, 16 if x.dtype == jnp.bfloat16 else 8)
    grid = (b, rows // rblk)
    seed_arr = jnp.asarray([seed], jnp.int32)
    ss2 = scale_signal.reshape(b, 1)
    sn2 = scale_noise.reshape(b, 1)
    x3 = x.reshape(b, rows, 128)
    out = pl.pallas_call(
        _diffuse_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # full (B,1) scale tables resident in SMEM, indexed by sample
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, rblk, 128), lambda i, j, *_: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, rblk, 128), lambda i, j, *_: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
        interpret=interpret,
    )(seed_arr, ss2, sn2, x3)
    return out.reshape(b, n)


def _fused_fwd(x, scale_signal, scale_noise, interpret, seed=0):
    out = _fused_fwd_impl(x, scale_signal, scale_noise, interpret, seed)
    return out, (scale_signal, x.shape)


def _fused_bwd(interpret, residuals, g):
    scale_signal, _ = residuals
    dx = g * scale_signal[:, None].astype(g.dtype)
    return dx, None, None, None


fused_forward_diffuse.defvjp(_fused_fwd, _fused_bwd)


def _kernel_available() -> bool:
    """Whether the Mosaic kernel can actually run here (tests monkeypatch
    this to exercise the island plumbing on the virtual CPU mesh)."""
    return jax.default_backend() == "tpu"


def forward_diffuse_fused(cfg, x, t, rng, interpret: bool | None = None):
    """Drop-in fused version of core.diffusion.forward_diffuse for the
    predict_x path. x: (B,H,W,C); t: (B,1,1,1) float. Returns noised.

    Off-TPU this falls back to the plain jnp path (statistically identical,
    different noise stream): Pallas interpret mode stubs prng_random_bits
    to zeros on some builds — Box-Muller of zero bits is a CONSTANT ε
    (silently wrong statistics) — and raises NotImplementedError on others
    (review r4). Pass ``interpret=True`` explicitly to debug the kernel in
    interpret mode regardless."""
    from ..core.schedule import alpha_dash

    if interpret is None:
        if not _kernel_available():
            from ..core import diffusion

            eps = jax.random.normal(rng, x.shape, jnp.float32)
            return diffusion.forward_diffuse(
                cfg, x.astype(jnp.float32), eps, t
            ).astype(x.dtype)
        interpret = False
    b = x.shape[0]
    n = x.shape[1] * x.shape[2] * x.shape[3]
    ad = alpha_dash(t[:, 0, 0, 0], cfg.steps, cfg.schedule).astype(jnp.float32)
    # the schedule is non-differentiable THROUGH THE FUSED PATH by contract:
    # _fused_bwd only propagates to x (ε is never materialised, so the
    # scale cotangents would need an ε-regeneration pass nobody uses — the
    # schedule is reference-pinned, not learned). stop_gradient makes that
    # explicit instead of silently returning zero cotangents.
    ss = jax.lax.stop_gradient(jnp.sqrt(ad))
    sn = jax.lax.stop_gradient(jnp.sqrt(1.0 - ad))
    seed = jax.random.randint(rng, (), 0, 2**31 - 1, jnp.int32)
    flat = x.reshape(b, n)
    out = fused_forward_diffuse(flat, ss, sn, interpret, seed=seed)
    return out.reshape(x.shape)


# ------------------------------------------------------- multi-chip variant


def _spec_entry(spec, i):
    """i-th PartitionSpec entry (specs are implicitly None-padded)."""
    return spec[i] if i < len(spec) else None


def _entry_axes(entry):
    if entry is None:
        return []
    if isinstance(entry, (tuple, list)):
        return list(entry)
    return [entry]


def _local_shape(shape, spec, mesh):
    """Per-device block shape of a global array under ``spec``; None when
    some dimension is not divisible by its mesh-axis product."""
    local = []
    for i, dim in enumerate(shape):
        k = 1
        for ax in _entry_axes(_spec_entry(spec, i)):
            k *= mesh.shape[ax]
        if dim % k != 0:
            return None
        local.append(dim // k)
    return tuple(local)


def fused_sharded_ok(cfg, x_shape, mesh, batch_spec) -> bool:
    """Whether the shard_map fused-diffusion island applies: every sharded
    dim divides evenly and the per-device flattened sample stays
    lane-aligned (the kernel's %128 requirement on LOCAL shapes)."""
    local = _local_shape(x_shape, batch_spec, mesh)
    if local is None:
        return False
    return (local[1] * local[2] * local[3]) % 128 == 0


def forward_diffuse_fused_sharded(cfg, x, t, rng, mesh, batch_spec):
    """Fused forward diffusion on a multi-device mesh.

    Mosaic kernels cannot be auto-partitioned by GSPMD (JAX raises
    "Please wrap the call in a shard_map", jax/_src/tpu_custom_call.py) —
    so on a >1-device mesh the kernel runs inside a shard_map island: each
    device diffuses its local (batch × height) block, with the PRNG stream
    decorrelated per device by folding the linearised mesh position into
    the seed (the in-kernel fold only decorrelates per LOCAL
    (sample, block), which repeats identically on every device).

    ``batch_spec`` is the PartitionSpec of ``x`` (e.g. P('data'),
    P(('slice','data')), P(None,'spatial'), P('data','spatial')). The
    per-sample ᾱ scales shard with the batch dimension only.
    """
    from jax.sharding import PartitionSpec as P

    from ..core.schedule import alpha_dash

    if not _kernel_available():
        # same off-TPU fallback as forward_diffuse_fused: the Mosaic kernel
        # can neither lower nor interpret correctly off-TPU (review r4);
        # the plain jnp path shards fine under GSPMD
        from ..core import diffusion

        eps = jax.random.normal(rng, x.shape, jnp.float32)
        return diffusion.forward_diffuse(
            cfg, x.astype(jnp.float32), eps, t
        ).astype(x.dtype)

    ad = alpha_dash(t[:, 0, 0, 0], cfg.steps, cfg.schedule).astype(jnp.float32)
    # same non-differentiable-schedule contract as the single-device
    # wrapper (its stop_gradient cleanup missed this path — review r4)
    ss = jax.lax.stop_gradient(jnp.sqrt(ad))
    sn = jax.lax.stop_gradient(jnp.sqrt(1.0 - ad))
    seed = jax.random.randint(rng, (), 0, 2**31 - 1, jnp.int32)

    axes = []
    for i in range(4):
        axes.extend(_entry_axes(_spec_entry(batch_spec, i)))
    sample_spec = P(_spec_entry(batch_spec, 0))

    def local(x_l, ss_l, sn_l, seed_l):
        lin = jnp.int32(0)
        for ax in axes:
            lin = lin * jnp.int32(mesh.shape[ax]) + jax.lax.axis_index(ax)
        # Knuth multiplicative hash of (device position + 1), int32 wraparound
        s = seed_l ^ ((lin + jnp.int32(1)) * jnp.int32(-1640531527))
        b_l = x_l.shape[0]
        n_l = x_l.shape[1] * x_l.shape[2] * x_l.shape[3]
        out = fused_forward_diffuse(
            x_l.reshape(b_l, n_l), ss_l, sn_l, False, seed=s
        )
        return out.reshape(x_l.shape)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(batch_spec, sample_spec, sample_spec, P()),
        out_specs=batch_spec,
        check_vma=False,
    )
    return fn(x, ss, sn, seed)
