"""Fused Adam update as a Pallas TPU kernel.

The Adam step at the 41.7 M-param flagship point is pure HBM-bandwidth:
read grads+params+m+v (4×167 MB fp32) and write params+m+v (3×167 MB)
≈ 1.17 GB/step ≈ 1.4 ms at v5e bandwidth (NEXT.md "Performance"). The
kernel below does the whole update — moment EMAs, bias correction, the
parameter write — in ONE pass per leaf with input/output buffer aliasing,
and optionally stores the moments in bfloat16 (``Config.moment_dtype``),
cutting the moment traffic and resident optimizer memory in half (math is
always fp32).

Update math is the exact Keras/TF Adam formulation (reference train.py:75;
see train/trainer._scale_by_adam_tf): the bias correction folds into a
per-step scalar ``step_size = lr·√(1-β₂ᵗ)/(1-β₁ᵗ)`` computed outside the
kernel, so the kernel body is::

    m' = β₁·m + (1-β₁)·g
    v' = β₂·v + (1-β₂)·g²
    p' = p - step_size · m' / (√v' + ε)

Engaged from train/trainer.train_step when ``optimizer="adam_fused"`` on a
single-device TPU config (the optax fallback with identical math covers
CPU, meshes, and chained transforms). Leaves whose flattened size is not a
multiple of 128 lanes take the XLA fallback — at the flagship config that
is only the handful of small bias/head leaves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _adam_kernel(step_ref, p_ref, m_ref, v_ref, g_ref, po_ref, mo_ref, vo_ref,
                 *, b1, b2, eps):
    g = g_ref[:].astype(jnp.float32)
    m = b1 * m_ref[:].astype(jnp.float32) + (1.0 - b1) * g
    v = b2 * v_ref[:].astype(jnp.float32) + (1.0 - b2) * g * g
    upd = step_ref[0] * m / (jnp.sqrt(v) + eps)
    po_ref[:] = (p_ref[:].astype(jnp.float32) - upd).astype(po_ref.dtype)
    mo_ref[:] = m.astype(mo_ref.dtype)
    vo_ref[:] = v.astype(vo_ref.dtype)


def _leaf_update_pallas(p, m, v, g, step_size, b1, b2, eps, interpret):
    from .kernels import _pick_rows

    n = p.size
    rows = n // 128
    # bf16 moments pack in (16,128) tiles; blocks must honour the widest
    # sublane requirement among the refs actually PASSED to the kernel —
    # g is cast to fp32 below, so its pre-cast dtype must not force the
    # coarser 16-row tiling on an all-fp32 invocation (review r4)
    sublane = 16 if any(
        a.dtype == jnp.bfloat16 for a in (p, m, v)
    ) else 8
    rblk = _pick_rows(rows, sublane)
    shape2 = (rows, 128)
    kern = functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps)
    spec = pl.BlockSpec((rblk, 128), lambda i: (i, 0))
    po, mo, vo = pl.pallas_call(
        kern,
        grid=(rows // rblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(shape2, p.dtype),
            jax.ShapeDtypeStruct(shape2, m.dtype),
            jax.ShapeDtypeStruct(shape2, v.dtype),
        ],
        # one-pass in-place semantics: p/m/v buffers are reused for outputs
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(
        step_size.reshape(1),
        p.reshape(shape2),
        m.reshape(shape2),
        v.reshape(shape2),
        g.reshape(shape2).astype(jnp.float32)
        if g.dtype != jnp.float32 else g.reshape(shape2),
    )
    return po.reshape(p.shape), mo.reshape(m.shape), vo.reshape(v.shape)


def _leaf_update_xla(p, m, v, g, step_size, b1, b2, eps):
    g32 = g.astype(jnp.float32)
    m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
    v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
    upd = step_size * m32 / (jnp.sqrt(v32) + eps)
    return (
        (p.astype(jnp.float32) - upd).astype(p.dtype),
        m32.astype(m.dtype),
        v32.astype(v.dtype),
    )


def fused_adam_ok(cfg, mesh_size: int = 1) -> bool:
    """True when train_step may engage the kernel path: plain Adam (no
    chained clip/decay transforms, no dynamic loss scale) on a
    single-device mesh (pallas_call is not GSPMD-partitionable over a
    multi-device mesh; the step builder passes the actual mesh size)."""
    return (
        cfg.optimizer == "adam_fused"
        and cfg.grad_clip_norm <= 0
        and cfg.weight_decay <= 0
        and getattr(cfg, "grad_accum", 1) == 1  # MultiSteps wraps opt_state
        and not cfg.dynamic_loss_scale
        and not cfg.zero1
        and mesh_size == 1
    )


def fused_adam_apply(cfg, params, opt_state, grads, interpret=None):
    """One fused Adam step over a parameter pytree.

    ``opt_state`` is the 2-tuple optax.chain state built by
    make_optimizer(cfg) for adam_fused/adam_tf:
    (ScaleByAdamState(count, mu, nu), ScaleByScheduleState(count)).
    Returns (new_params, new_opt_state) with identical structure.
    """
    from ..core.schedule import make_lr_schedule

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    adam_st, sched_st = opt_state
    b1, b2, eps = 0.9, 0.999, cfg.adam_eps
    t = (adam_st.count + 1).astype(jnp.float32)
    lr = make_lr_schedule(cfg)(sched_st.count).astype(jnp.float32)
    alpha = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
    step_size = (lr * alpha).astype(jnp.float32)

    leaves_p, treedef = jax.tree_util.tree_flatten(params)
    leaves_m = treedef.flatten_up_to(adam_st.mu)
    leaves_v = treedef.flatten_up_to(adam_st.nu)
    leaves_g = treedef.flatten_up_to(grads)

    new_p, new_m, new_v = [], [], []
    for p, m, v, g in zip(leaves_p, leaves_m, leaves_v, leaves_g):
        if p.size % 128 == 0 and p.size >= 128:
            po, mo, vo = _leaf_update_pallas(
                p, m, v, g, step_size, b1, b2, eps, interpret
            )
        else:
            po, mo, vo = _leaf_update_xla(p, m, v, g, step_size, b1, b2, eps)
        new_p.append(po)
        new_m.append(mo)
        new_v.append(vo)

    unflatten = jax.tree_util.tree_unflatten
    new_adam = optax.ScaleByAdamState(
        count=adam_st.count + 1,
        mu=unflatten(treedef, new_m),
        nu=unflatten(treedef, new_v),
    )
    new_sched = optax.ScaleByScheduleState(count=sched_st.count + 1)
    return unflatten(treedef, new_p), (new_adam, new_sched)
