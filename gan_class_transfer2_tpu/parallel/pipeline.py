"""Pipeline parallelism (PP) over the U-Net's octave structure.

The reference is single-device (reference train.py:40) and the 41.7 M-param
default fits one chip, so PP — like TP (SURVEY §2.3) — is a scaling
capability the TPU framework adds for configurations that do NOT fit:
deep/wide U-Nets (``max_size``/``octaves`` up) or high resolutions where
even remat + ZeRO-1 exhaust a chip's HBM.

Design — *nested* stage partitioning of the V:

The U-Net is a palindrome: down₀ … downₙ middle upₙ … up₀ with a skip from
each downᵢ's input to upᵢ's merge (models/unet.py). Stages own contiguous
*octave bands*, so every skip connection stays **stage-local** — the only
inter-stage traffic is the boundary activation at the band's resolution
(spatially downsampled 2^band per crossing, i.e. cheap), not the
full-resolution skips a sequential split would ship:

    stage 0: pre_block · octaves [0, k₁) · post_block · head · loss
    stage s: octaves [kₛ, kₛ₊₁)
    stage S-1: its band + middle

One microbatch therefore visits 0 → 1 → … → S-1 → … → 1 → 0 (2S-1 virtual
stages on S devices). Microbatches are dispatched back-to-back; JAX's
asynchronous dispatch overlaps them across devices (GPipe fill-drain without
a hand-written schedule — stage s's program for microbatch m+1 runs while
m's is downstream). The backward pass recomputes each stage's forward
inside its VJP (GPipe-style remat), so only the stage *inputs* and the
stage-local skips are stashed per microbatch.

Semantics: exactly the single-device ``train_step`` at the same global
batch. The (t, ε) draws are made once for the full batch with the same
fold/split order as ``trainer.diffusion_loss``, microbatch losses are
equally-weighted means, gradients accumulate with cotangent 1/M, and the
optimizer applies once per step — the grad-accum ≡ big-batch equivalence
already validated for MultiSteps (tests/test_trainer.py).

Checkpoint compatibility: the pipeline state IS a plain ``TrainState`` —
the same pytree the single-device and mesh paths checkpoint — whose leaves
are *placed* per stage (``place_state``). Pipeline runs restore
single-device checkpoints and vice versa; optimizer state is re-placed by
structural reflection (any params-shaped subtree of the optax state, e.g.
Adam's mu/nu, follows its parameters' stage).

Stage balance: analytic per-octave MACs (the conv shapes are static,
utils/benchmark.model_flops_per_image) drive a min-max contiguous
partition; the outer block/head cost is pinned to stage 0 and the middle
block to the last stage.

PP × DP composition: ``mesh_data > 1`` gives every stage its own
``mesh_data``-device data mesh (device grid = stages × data). Activations
cross stage boundaries batch-sharded over 'data' (cross-mesh device_put
rides ICI), params replicate within each stage, and GSPMD inserts the
per-stage gradient all-reduce inside the stage VJP programs — no explicit
collectives. Semantics stay identical to the single-device step (parity
tested at stages=2 × data=2).
"""

from __future__ import annotations

import itertools
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import unet
from ..train import trainer as trainer_lib

# --------------------------------------------------------------------- plan


def octave_costs(cfg, in_channels: int = 3) -> Tuple[int, List[int], int]:
    """(outer_macs, per_octave_macs, middle_macs) — MACs per image.

    Same walk as utils/benchmark.model_flops_per_image, attributed per
    octave: octave i owns its down conv + block_in + block_out + up conv
    (+ residual-mode skip dense); 'outer' owns pre/post blocks + head."""

    def block(spatial, cin, filters, depth):
        m, c = 0, cin
        for _ in range(depth):
            m += spatial * spatial * 9 * c * filters
            c = filters
        return m, c

    outer, c = block(cfg.size, in_channels, cfg.pixel_size, cfg.block_depth)
    per = [0] * cfg.octaves
    skip = []
    for i in range(cfg.octaves):
        f = cfg.octave_filters(i)
        skip.append(c)
        s_half = cfg.size >> (i + 1)
        per[i] += s_half * s_half * 16 * c * f  # down 4×4/s2
        m, c = block(s_half, f, f, cfg.block_depth)
        per[i] += m
    mid, c = block(cfg.size >> cfg.octaves, c, cfg.middle_filters(), cfg.block_depth)
    for i in reversed(range(cfg.octaves)):
        f = cfg.octave_filters(i)
        u = cfg.octave_up_filters(i)
        s_half = cfg.size >> (i + 1)
        m, c = block(s_half, c, f, cfg.block_depth)
        per[i] += m
        per[i] += s_half * s_half * 16 * c * u  # up convT 4×4/s2
        c = u
        if cfg.skip_mode == "concat":
            c += skip[i]
        elif cfg.skip_mode == "residual":
            per[i] += (cfg.size >> i) ** 2 * c * skip[i]
            c = skip[i]
    m, c = block(cfg.size, c, cfg.pixel_size, cfg.block_depth)
    outer += m
    outer += cfg.size * cfg.size * c * cfg.out_channels()  # head dense
    return outer, per, mid


def plan_stages(cfg, n_stages: int) -> Tuple[Tuple[int, int], ...]:
    """Contiguous octave bands minimising the max per-stage MACs.

    Returns ((0, k₁), (k₁, k₂), …, (k_{S-1}, octaves)). Brute force over the
    C(octaves-1, S-1) cut placements — octaves is single digits.

    ``cfg.pipeline_cuts`` overrides the analytic plan with explicit cut
    positions: the MAC objective misjudges wall-clock balance on the MXU
    (the low-channel outer convs run ~1.7× slower per MAC,
    BASELINE_MEASURED.md r4); ``tools/pp_analysis.py --calibrate`` measures
    every candidate plan on hardware and reports the cuts to pin."""
    if not 1 <= n_stages <= cfg.octaves:
        raise ValueError(
            f"pipeline_stages={n_stages} needs 1 <= stages <= octaves={cfg.octaves}"
        )
    if cfg.pipeline_cuts:
        cuts = tuple(int(c) for c in cfg.pipeline_cuts.split(","))
        if len(cuts) != n_stages - 1:
            raise ValueError(
                f"pipeline_cuts={cfg.pipeline_cuts!r} has {len(cuts)} cuts; "
                f"{n_stages} stages need {n_stages - 1}"
            )
        bounds = (0,) + cuts + (cfg.octaves,)
        return tuple((bounds[s], bounds[s + 1]) for s in range(n_stages))
    outer, per, mid = octave_costs(cfg)
    best, best_cost = None, None
    for cuts in itertools.combinations(range(1, cfg.octaves), n_stages - 1):
        bounds = (0,) + cuts + (cfg.octaves,)
        cost = 0
        for s in range(n_stages):
            c = sum(per[bounds[s] : bounds[s + 1]])
            if s == 0:
                c += outer
            if s == n_stages - 1:
                c += mid
            cost = max(cost, c)
        if best_cost is None or cost < best_cost:
            best, best_cost = bounds, cost
    return tuple((best[s], best[s + 1]) for s in range(n_stages))


# ------------------------------------------------------ stage views of trees


def tree_stage_view(plan, tree, s: int):
    """The stage-s subtree of any params-structured tree (params, EMA, Adam
    mu/nu share the structure). Leaves are referenced, not copied."""
    lo, hi = plan[s]
    out: dict = {"octaves": list(tree["octaves"][lo:hi])}
    if s == 0:
        out["pre_block"] = tree["pre_block"]
        out["post_block"] = tree["post_block"]
        out["head"] = tree["head"]
    if s == len(plan) - 1:
        out["middle"] = tree["middle"]
    return out


def tree_stage_merge(plan, full, s: int, sub):
    """Inverse of tree_stage_view: a new full tree with stage s's leaves
    replaced by ``sub``'s."""
    lo, hi = plan[s]
    out = dict(full)
    octs = list(full["octaves"])
    octs[lo:hi] = list(sub["octaves"])
    out["octaves"] = octs
    if s == 0:
        out["pre_block"] = sub["pre_block"]
        out["post_block"] = sub["post_block"]
        out["head"] = sub["head"]
    if s == len(plan) - 1:
        out["middle"] = sub["middle"]
    return out


def _params_structured(obj, params_treedef) -> bool:
    try:
        return jax.tree_util.tree_structure(obj) == params_treedef
    except Exception:
        return False


def _rewrite_state(obj, params_treedef, subtree_fn, leaf_fn):
    """Walk an optax state pytree; apply ``subtree_fn`` to every
    params-structured subtree (Adam mu/nu, momentum trace, MultiSteps acc …)
    and ``leaf_fn`` to every other leaf (step counts, scales)."""
    if _params_structured(obj, params_treedef):
        return subtree_fn(obj)
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple
        return type(obj)(
            *[_rewrite_state(v, params_treedef, subtree_fn, leaf_fn) for v in obj]
        )
    if isinstance(obj, (tuple, list)):
        return type(obj)(
            _rewrite_state(v, params_treedef, subtree_fn, leaf_fn) for v in obj
        )
    if isinstance(obj, dict):
        return {
            k: _rewrite_state(v, params_treedef, subtree_fn, leaf_fn)
            for k, v in obj.items()
        }
    return leaf_fn(obj)


# ----------------------------------------------------------- stage programs


def _stage_down_fn(cfg, plan, s: int):
    """(stage_params, h_in) -> (h_out, skips). Stage 0 also casts to the
    compute dtype and applies pre_block (models/unet.unet_apply head)."""
    first = s == 0

    def f(sp, h):
        if first:
            h = h.astype(jnp.dtype(cfg.compute_dtype))
            h = unet._apply_block(sp["pre_block"], h)
        skips = []
        for level in sp["octaves"]:
            h, inp = unet.octave_down(cfg, level, h)
            skips.append(inp)
        return h, tuple(skips)

    return f


def _stage_mid_fn(cfg, plan):
    """Last stage: its band's downs + middle + its band's ups in one program
    (matches unet_apply's recursion at i+1 == octaves)."""

    def f(sp, h):
        skips = []
        for level in sp["octaves"]:
            h, inp = unet.octave_down(cfg, level, h)
            skips.append(inp)
        h = unet._apply_block(sp["middle"], h)
        for level, inp in zip(reversed(sp["octaves"]), reversed(skips)):
            h = unet.octave_up(cfg, level, h, inp)
        return h

    return f


def _stage_up_fn(cfg, plan, s: int):
    """(stage_params, h_in, skips) -> h_out for middle stages (0 < s < S-1)."""

    def f(sp, h, skips):
        for level, inp in zip(reversed(sp["octaves"]), reversed(skips)):
            h = unet.octave_up(cfg, level, h, inp)
        return h

    return f


def _stage_loss_fn(cfg, plan):
    """Stage 0's ascent + head + loss: (p0, h, skips, target, pred_scale, t)
    -> scalar fp32 loss (mean over the microbatch) — the exact tail of
    trainer.diffusion_loss."""

    def f(sp, h, skips, target, pred_scale, t_b):
        for level, inp in zip(reversed(sp["octaves"]), reversed(skips)):
            h = unet.octave_up(cfg, level, h, inp)
        pred = unet.unet_head(cfg, sp, h, t_b)
        prediction = pred.astype(jnp.float32) * pred_scale
        return trainer_lib.compute_loss(cfg, target, prediction)

    return f


# ------------------------------------------------------------------- trainer


def _validate(cfg) -> None:
    if cfg.pipeline_stages < 2:
        raise ValueError("PipelineTrainer needs pipeline_stages >= 2")
    if jax.process_count() > 1:
        # the stage meshes address devices directly; on a pod the global
        # device list passes the count check but cross-stage device_puts
        # then crash mid-step on non-addressable devices — reject up front
        # like every other unsupported composition here
        raise ValueError(
            "pipeline parallelism is single-process (stage meshes need "
            "locally addressable devices); use DP/ZeRO-1 across hosts"
        )
    if cfg.num_classes > 0:
        raise ValueError("pipeline parallelism supports the unconditional "
                         "Denoiser only (num_classes == 0)")
    if cfg.mesh_model != 1 or cfg.mesh_slice != 1:
        raise ValueError("pipeline_stages > 1 composes with neither TP nor "
                         "multi-slice meshes (mesh_model = mesh_slice = 1)")
    if cfg.zero1:
        raise ValueError("pipeline_stages > 1 already partitions optimizer "
                         "state by stage; zero1 is unsupported")
    if cfg.grad_accum > 1:
        raise ValueError("pipeline microbatching IS gradient accumulation; "
                         "use pipeline_microbatches, not grad_accum")
    if cfg.dynamic_loss_scale or cfg.loss_scale > 0:
        raise ValueError("loss scaling is unsupported on the pipeline path "
                         "(bf16 on TPU needs none)")
    m = cfg.pipeline_microbatches or cfg.pipeline_stages
    if cfg.batch_size % m != 0:
        raise ValueError(
            f"batch_size={cfg.batch_size} not divisible by "
            f"pipeline_microbatches={m}"
        )
    dp = max(cfg.mesh_data, 1)
    if dp > 1 and (cfg.batch_size // m) % dp != 0:
        raise ValueError(
            f"PP x DP needs the microbatch (batch_size={cfg.batch_size} / "
            f"microbatches={m} = {cfg.batch_size // m}) divisible by "
            f"mesh_data={dp}"
        )


class PipelineTrainer:
    """Owns the stage plan, per-stage jitted programs, and devices.

    ``step(state, batch, rng) -> (state, loss)`` with the single-device
    train-step semantics; ``state`` is a standard TrainState whose leaves
    live on the stage devices (use :meth:`place_state` after a restore and
    :meth:`gather_params` before feeding params to an eval/sampler jit)."""

    def __init__(self, cfg, devices: Sequence[Any] | None = None):
        cfg.validate()
        _validate(cfg)
        self.cfg = cfg
        self.n_stages = cfg.pipeline_stages
        self.n_micro = cfg.pipeline_microbatches or cfg.pipeline_stages
        self.plan = plan_stages(cfg, self.n_stages)
        devices = list(devices if devices is not None else jax.devices())
        # PP x DP: mesh_data > 1 gives every stage its own `dp`-device data
        # mesh — activations shard over 'data' between stages (cross-mesh
        # device_put), params replicate per stage, and GSPMD all-reduces the
        # per-stage grads over the data axis inside the stage VJP programs.
        # mesh_data <= 1 keeps one device per stage (pure PP).
        self.dp = max(cfg.mesh_data, 1)
        need = self.n_stages * self.dp
        if len(devices) < need:
            raise ValueError(
                f"pipeline_stages={self.n_stages} x mesh_data={self.dp} "
                f"needs {need} devices, have {len(devices)}"
            )
        rows = [
            np.asarray(devices[s * self.dp : (s + 1) * self.dp])
            for s in range(self.n_stages)
        ]
        self.stage_meshes = [Mesh(r, ("data",)) for r in rows]
        # first device of each stage: scalar anchors + eval-gather target
        self.devices = [r[0] for r in rows]
        self.optimizer = trainer_lib.make_optimizer(cfg)
        self._params_treedef = jax.tree_util.tree_structure(
            jax.eval_shape(lambda r: trainer_lib.init_state(cfg, r),
                           jax.random.PRNGKey(0)).params
        )

        S = self.n_stages
        self._prep = jax.jit(self._prep_fn)
        self._down = [jax.jit(_stage_down_fn(cfg, self.plan, s))
                      for s in range(S - 1)]
        self._mid = jax.jit(_stage_mid_fn(cfg, self.plan))
        self._up = [jax.jit(_stage_up_fn(cfg, self.plan, s))
                    for s in range(S - 1)]  # index 0 unused (loss fn instead)
        loss_f = _stage_loss_fn(cfg, self.plan)

        def bwd_loss(sp, h, skips, target, pred_scale, t_b, ct):
            # the primal IS the microbatch loss — returning it (instead of a
            # separate forward-loop loss program) saves one full stage-0
            # tail forward per microbatch
            loss, vjp = jax.vjp(
                lambda p, hh, ss: loss_f(p, hh, ss, target, pred_scale, t_b),
                sp, h, skips,
            )
            return (loss,) + vjp(ct)

        self._bwd_loss = jax.jit(bwd_loss)

        def make_bwd_up(s):
            f = _stage_up_fn(cfg, self.plan, s)

            def bwd(sp, h, skips, ct):
                _, vjp = jax.vjp(f, sp, h, skips)
                return vjp(ct)

            return jax.jit(bwd)

        self._bwd_up = [make_bwd_up(s) if s > 0 else None for s in range(S - 1)]

        mid_f = _stage_mid_fn(cfg, self.plan)

        def bwd_mid(sp, h, ct):
            _, vjp = jax.vjp(mid_f, sp, h)
            return vjp(ct)

        self._bwd_mid = jax.jit(bwd_mid)

        def make_bwd_down(s):
            f = _stage_down_fn(cfg, self.plan, s)

            def bwd(sp, x, ct_h, ct_skips):
                _, vjp = jax.vjp(f, sp, x)
                return vjp((ct_h, ct_skips))

            return jax.jit(bwd)

        self._bwd_down = [make_bwd_down(s) for s in range(S - 1)]

        # cfg.donate_state: the pipeline path exists for models that do NOT
        # fit a chip, so old/new double-buffering of params, Adam moments,
        # EMA, and grad accumulators is exactly the headroom it cannot
        # afford — donate the consumed argument of every update-side
        # program. (Stage views are disjoint, each consumed exactly once;
        # the one aliasing hazard — stage 0's opt scalar leaves, which
        # device_put would pass through by reference — is copied at the
        # rewrite site below.)
        # donate the accumulator only: both args share the output's shapes
        # and each output buffer can alias ONE donated input — donating
        # both just warns "donated buffer not usable" for the loser
        self._acc = jax.jit(
            lambda a, b: jax.tree_util.tree_map(jnp.add, a, b),
            donate_argnums=(0,) if cfg.donate_state else (),
        )

        # global-norm clipping must see the GLOBAL norm, not each stage's
        # own (the per-stage optimizer's internal clip_by_global_norm would
        # otherwise clip each sub-tree independently, breaking single-device
        # parity). Pre-scale all stages by clip/max(global_norm, clip) —
        # optax's exact factor — after which the per-stage clip is a no-op
        # (every stage's norm is then <= the clip threshold).
        clip = cfg.grad_clip_norm
        self._sqnorm = jax.jit(
            lambda t: sum(
                jnp.sum(jnp.square(x))
                for x in jax.tree_util.tree_leaves(t)
            )
        )
        self._clip_factor = jax.jit(
            lambda sq: jnp.asarray(clip, jnp.float32)
            / jnp.maximum(jnp.sqrt(sum(sq)), clip)
        )
        self._scale_tree = jax.jit(
            lambda t, f: jax.tree_util.tree_map(
                lambda x: x * f.astype(x.dtype), t
            ),
            donate_argnums=(0,) if cfg.donate_state else (),
        )

        def update(p, o, g):
            updates, new_o = self.optimizer.update(g, o, p)
            import optax

            return optax.apply_updates(p, updates), new_o

        # donate p and o only: g has the SAME shapes as p, and outputs can
        # alias one donated input each — donating g too just produces
        # "donated buffer not usable" warnings (grads free when their
        # Python refs drop after the call)
        self._update = jax.jit(
            update,
            donate_argnums=(0, 1) if cfg.donate_state else (),
        )
        d = cfg.ema_decay
        # donate the OLD ema view only — new_p is still referenced by the
        # merged params tree
        self._ema_blend = jax.jit(
            lambda e, p: jax.tree_util.tree_map(
                lambda ee, pp: ee * d + pp * (1.0 - d), e, p
            ),
            donate_argnums=(0,) if cfg.donate_state else (),
        )

    # ------------------------------------------------------------- placement
    def _rep(self, s: int):
        """Replicated sharding over stage s's data mesh (params, scalars)."""
        return NamedSharding(self.stage_meshes[s], P())

    def _sharded(self, s: int):
        """Batch-dim sharding over stage s's data mesh (activations)."""
        return NamedSharding(self.stage_meshes[s], P("data"))

    def _leaf_device(self):
        """octave index -> owning stage, for place_params_like."""
        plan = self.plan

        def stage_of_octave(i):
            for s, (lo, hi) in enumerate(plan):
                if lo <= i < hi:
                    return s
            raise AssertionError(i)

        return stage_of_octave

    def place_params_like(self, tree):
        """Place a params-structured tree's leaves onto their stage meshes
        (replicated over each stage's data axis)."""
        out = dict(tree)
        stage_of = self._leaf_device()
        out["pre_block"] = jax.device_put(tree["pre_block"], self._rep(0))
        out["post_block"] = jax.device_put(tree["post_block"], self._rep(0))
        out["head"] = jax.device_put(tree["head"], self._rep(0))
        out["middle"] = jax.device_put(tree["middle"], self._rep(-1))
        out["octaves"] = [
            jax.device_put(lvl, self._rep(stage_of(i)))
            for i, lvl in enumerate(tree["octaves"])
        ]
        return out

    def place_state(self, state: trainer_lib.TrainState) -> trainer_lib.TrainState:
        """Place every TrainState leaf on its owning stage mesh — params,
        EMA, and each params-structured subtree of the optax state; scalars
        (step, Adam count) replicate over stage 0's mesh."""
        rep0 = self._rep(0)
        opt = _rewrite_state(
            state.opt_state,
            self._params_treedef,
            self.place_params_like,
            lambda leaf: jax.device_put(leaf, rep0),
        )
        ema = (
            self.place_params_like(state.ema_params)
            if state.ema_params is not None
            else None
        )
        return trainer_lib.TrainState(
            jax.device_put(state.step, rep0),
            self.place_params_like(state.params),
            opt,
            ema,
            state.scale_state,
        )

    def init_state(self, rng) -> trainer_lib.TrainState:
        return self.place_state(trainer_lib.init_state(self.cfg, rng))

    def gather_params(self, tree, device=None):
        """Copy a params-structured tree onto one device — or any
        jax.sharding.Sharding (e.g. replicated over an eval mesh) — for
        eval/sampler jits, which need co-located inputs."""
        return jax.device_put(tree, device or self.devices[0])

    # ------------------------------------------------------------------ prep
    def _prep_fn(self, batch, rng, step):
        """Full-batch (t, ε) draws + forward diffusion + target, via the
        SAME helpers the single-device step uses (trainer.fold_and_augment +
        trainer.draw_and_diffuse) — sharing them, rather than copying the
        fold/split order and fused-kernel gating, is what keeps the pipeline
        step value-identical to the single-device step by construction."""
        cfg = self.cfg
        batch, rng = trainer_lib.fold_and_augment(cfg, batch, rng, step)
        # mesh/batch_spec MUST be threaded when dp > 1: the Mosaic
        # fused-diffusion kernel cannot be GSPMD-partitioned, so on a
        # multi-device stage mesh draw_and_diffuse has to route it through
        # the shard_map island (or fall back) exactly like
        # mesh.make_parallel_train_step does — without this, the first
        # PP x DP step on TPU fails to compile under the default
        # fused_diffusion=True config.
        mesh0 = self.stage_meshes[0] if self.dp > 1 else None
        noised, target, pred_scale, t_int = trainer_lib.draw_and_diffuse(
            cfg, batch, rng,
            mesh=mesh0,
            batch_spec=P("data") if mesh0 is not None else None,
        )
        return (
            noised,
            target.astype(jnp.float32),
            jnp.asarray(pred_scale, jnp.float32),
            t_int[:, 0, 0, 0],
        )

    # ------------------------------------------------------------------ step
    def step(self, state: trainer_lib.TrainState, batch, rng):
        cfg = self.cfg
        S, M = self.n_stages, self.n_micro
        plan = self.plan
        if isinstance(batch, dict):
            batch = batch["image"]
        # normalise input placement: callers may hand a mesh-sharded or
        # differently-placed batch; the prep program runs on stage 0's data
        # mesh with the batch dim sharded over it
        batch = jax.device_put(batch, self._sharded(0))

        p = [tree_stage_view(plan, state.params, s) for s in range(S)]

        noised, target, pred_scale, t_b = self._prep(batch, rng, state.step)
        if noised.shape[0] == 0 or noised.shape[0] % M:
            # _validate checked cfg.batch_size, but step() is public API —
            # a non-divisible runtime batch would silently drop the tail
            # samples from the loss and gradients (review r4)
            raise ValueError(
                f"pipeline step needs the batch ({noised.shape[0]}) "
                f"divisible by pipeline_microbatches={M}"
            )
        mb = noised.shape[0] // M

        def sl(x, m):
            return x[m * mb : (m + 1) * mb] if x.ndim >= 1 else x

        # ---- forward: dispatch every microbatch's chain back-to-back; the
        # async runtime overlaps stage s of microbatch m with stage s+1 of
        # microbatch m-1 (fill-drain pipelining without an explicit schedule)
        x_in = [[None] * S for _ in range(M)]   # down-stage inputs (stashed)
        skips = [[None] * S for _ in range(M)]  # stage-local skips (stashed)
        h_up_in = [[None] * S for _ in range(M)]  # up-stage inputs (stashed)
        losses = []
        for m in range(M):
            h = sl(noised, m)
            for s in range(S - 1):
                x_in[m][s] = h
                h, sk = self._down[s](p[s], h)
                skips[m][s] = sk
                h = jax.device_put(h, self._sharded(s + 1))
            x_in[m][S - 1] = h
            h = self._mid(p[S - 1], h)
            for s in range(S - 2, 0, -1):
                h = jax.device_put(h, self._sharded(s))
                h_up_in[m][s] = h
                h = self._up[s](p[s], h, skips[m][s])
            h = jax.device_put(h, self._sharded(0))
            h_up_in[m][0] = h

        # ---- backward (reverse microbatch order drains the pipeline);
        # each stage recomputes its forward inside the jitted VJP. The
        # microbatch losses fall out of _bwd_loss's primal (sum order is
        # irrelevant: the step loss is their mean).
        # hoisted: the cotangent is the same constant for every microbatch
        ct = jax.device_put(jnp.full((), 1.0 / M, jnp.float32), self._rep(0))
        g = [None] * S
        for m in range(M - 1, -1, -1):
            loss_m, pg, h_ct, sk_ct = self._bwd_loss(
                p[0], h_up_in[m][0], skips[m][0], sl(target, m),
                sl(pred_scale, m), sl(t_b, m), ct,
            )
            losses.append(loss_m)
            g[0] = pg if g[0] is None else self._acc(g[0], pg)
            skips_ct = [None] * S
            skips_ct[0] = sk_ct
            for s in range(1, S - 1):
                h_ct = jax.device_put(h_ct, self._sharded(s))
                pg, h_ct, sk_ct = self._bwd_up[s](
                    p[s], h_up_in[m][s], skips[m][s], h_ct
                )
                g[s] = pg if g[s] is None else self._acc(g[s], pg)
                skips_ct[s] = sk_ct
            h_ct = jax.device_put(h_ct, self._sharded(S - 1))
            pg, h_ct = self._bwd_mid(p[S - 1], x_in[m][S - 1], h_ct)
            g[S - 1] = pg if g[S - 1] is None else self._acc(g[S - 1], pg)
            for s in range(S - 2, -1, -1):
                h_ct = jax.device_put(h_ct, self._sharded(s))
                pg, h_ct = self._bwd_down[s](
                    p[s], x_in[m][s], h_ct, skips_ct[s]
                )
                g[s] = self._acc(g[s], pg)
            # this microbatch's stashed activations are dead once its
            # backward has drained — drop the references so HBM frees
            # per-microbatch instead of at step() return (the stash is the
            # pipeline path's dominant live memory)
            x_in[m] = skips[m] = h_up_in[m] = None

        # ---- global-norm clip across stages (see __init__ note)
        if cfg.grad_clip_norm > 0:
            sq = [
                jax.device_put(self._sqnorm(g[s]), self._rep(0))
                for s in range(S)
            ]
            factor = self._clip_factor(sq)
            g = [
                self._scale_tree(g[s], jax.device_put(factor, self._rep(s)))
                for s in range(S)
            ]

        # ---- per-stage optimizer update (scalar opt leaves hop to the stage)
        new_params_full = state.params
        new_opt_full = state.opt_state
        ema_full = state.ema_params
        for s in range(S):
            # scalar leaves: stage 0's device_put would pass the LIVE state
            # scalar through by reference (same sharding) and _update then
            # donates it — copy so the donated buffer is never the caller's
            opt_s = _rewrite_state(
                state.opt_state,
                self._params_treedef,
                lambda tr, s=s: tree_stage_view(plan, tr, s),
                lambda leaf, s=s: (
                    jnp.copy(leaf) if s == 0
                    else jax.device_put(leaf, self._rep(s))
                ),
            )
            new_p, new_o = self._update(p[s], opt_s, g[s])
            new_params_full = tree_stage_merge(plan, new_params_full, s, new_p)
            # write back: params-shaped subtrees take the stage's leaves;
            # scalar leaves (counts) advanced identically on every stage —
            # keep stage 0's copy (it lives on the state's scalar device)
            new_opt_full = _merge_opt(
                new_opt_full, new_o, plan, s, self._params_treedef,
                take_scalar=(s == 0),
            )
            if ema_full is not None:
                e_s = tree_stage_view(plan, ema_full, s)
                e_new = self._ema_blend(e_s, new_p)
                ema_full = tree_stage_merge(plan, ema_full, s, e_new)

        loss = losses[0]
        for l in losses[1:]:
            loss = loss + l
        loss = loss / M
        new_state = trainer_lib.TrainState(
            state.step + 1, new_params_full, new_opt_full, ema_full, None
        )
        return new_state, loss


def _merge_opt(full, stage, plan, s, params_treedef, take_scalar):
    """Merge a stage's updated optax state back into the full state: every
    params-structured subtree gets the stage's leaves via tree_stage_merge;
    scalar leaves (step counts) are taken from stage 0 only (all stages
    advance them identically)."""
    if _params_structured(full, params_treedef):
        # `stage` here is the matching stage-view subtree
        return tree_stage_merge(plan, full, s, stage)
    if isinstance(full, tuple) and hasattr(full, "_fields"):
        return type(full)(
            *[
                _merge_opt(f, g, plan, s, params_treedef, take_scalar)
                for f, g in zip(full, stage)
            ]
        )
    if isinstance(full, (tuple, list)):
        return type(full)(
            _merge_opt(f, g, plan, s, params_treedef, take_scalar)
            for f, g in zip(full, stage)
        )
    if isinstance(full, dict):
        return {
            k: _merge_opt(full[k], stage[k], plan, s, params_treedef, take_scalar)
            for k in full
        }
    return stage if take_scalar else full
