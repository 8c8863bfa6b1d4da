"""Experiment configuration.

The reference keeps ~20 module-level constants (reference train.py:5-45) plus a
graveyard of commented-out alternatives (optimizers train.py:67-78, noise
schedules train.py:88-92, losses train.py:265-280, regularizer train.py:80).
Here every knob — including each commented alternative — is a first-class field
of one frozen dataclass, serializable to/from JSON and exposed on the CLI.

TPU-specific additions (mesh shape, compute dtype, conv implementation, remat,
EMA, checkpointing) have no reference counterpart and are documented as such.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # ------------------------------------------------------------------ data
    # reference train.py:5-15 — one glob per class; `classes` list at :299-301.
    dataset_pattern: str = "data/train/*.png"
    example_image_path: Optional[str] = None
    classes: Tuple[str, ...] = ()  # empty -> (dataset_pattern,)
    shuffle_buffer: int = 1000  # reference train.py:318
    cache: bool = False  # reference train.py:317 (commented disk cache)
    # Use the native C++ loader (data/native/dataloader.cc) when its
    # toolchain is available; falls back to the Python/PIL pipeline.
    native_loader: bool = True
    data_workers: int = 2
    # HBM-resident input (data/device_augment.HBMDataset): decode every
    # training file ONCE at startup to a deterministic center crop of this
    # side length (>= size; equal to size = flip/normalize only), park the
    # uint8 tensor in HBM, and draw + crop/flip/normalize batches fully on
    # device. 0 = off (streamed host decode). For corpora that fit HBM this
    # is the fastest input path (BASELINE_MEASURED: 97% of synthetic peak at
    # the flagship point) and the only leak-free one on tunneled platforms,
    # where every per-step host->device transfer pins its full byte size in
    # host RSS (tools/probe_transfer_leak.py). Trade-off vs streaming: the
    # random crop jitters inside the stored center crop, not the full
    # native image. Single-process runs only.
    data_hbm: int = 0

    # ----------------------------------------------------------------- model
    size: int = 256  # reference train.py:17
    pixel_size: int = 128  # reference train.py:18
    max_size: int = 512  # reference train.py:19
    block_depth: int = 0  # reference train.py:20
    octaves: int = 6  # reference train.py:21 (bottleneck 4x4)
    # reference train.py:26-27: `residual` / `concat` flags on Residual.
    skip_mode: str = "concat"  # concat | residual | none
    # reference train.py:199,203,211-214 — vestigial per-timestep output head
    # (Dense(3*steps) + gather on t) kept as an option.
    per_step_output: bool = False

    # ------------------------------------------------------------- diffusion
    steps: int = 200  # diffusion T, reference train.py:24
    # Multi-class conditioning (BASELINE config 5): 0 = unconditional (the
    # reference behavior); >0 = class-embedding conditioning, with one class
    # per entry of `classes` (reference scaffolding train.py:299-301).
    num_classes: int = 0
    class_embed_dim: int = 8
    # reference train.py:85-93: active quadratic plus 4 commented alternatives.
    schedule: str = "quadratic"  # quadratic|exponential|rational_exponential|geometric|cosine2|quartic
    # reference train.py:29-32 parameterization quadruple.
    parameterization: str = "x"  # x | epsilon | scaled_epsilon | ode
    prediction_weighting: bool = False  # reference train.py:31
    test_step: int = 25  # reference train.py:95
    bits_per_pixel: int = 3  # VQ codebook bits, reference train.py:308
    # DDIM-style subset sampling for the reverse-diffusion sampler: visit
    # every stride-th timestep (T, T−s, …). 1 = the exact reference loop
    # (train.py:439-479); >1 trades sampler quality for 1/s the denoiser
    # calls (TPU addition — serving/eval knob, never affects training).
    sample_stride: int = 1

    # ------------------------------------------------------------------ loss
    # reference train.py:272 (mse, active), :254-260 (dct), :267-270 (l1),
    # :274-280 (multiscale, unreachable).
    loss: str = "mse"  # mse | l1 | dct | mse_multiscale

    # ------------------------------------------------------------- optimizer
    # reference train.py:67-78: Adam active, SGD/momentum/sign-SGD/RMSprop
    # preserved as options.
    optimizer: str = "adam"  # adam | adam_tf | adam_fused | sgd | momentum | sign_sgd | rmsprop
    # Moment storage dtype for adam_tf/adam_fused (math is always fp32);
    # "bfloat16" halves optimizer HBM (ops/adam_kernel.py).
    moment_dtype: str = "float32"
    learning_rate: float = 2e-5  # reference train.py:75
    # Warmup length (reference train.py:36). Under grad_accum > 1 this
    # counts APPLIED optimizer updates, not micro-steps — so grad_accum=N
    # with the same warm_up matches one N×-batch step exactly (see
    # core/schedule.make_lr_schedule for the full unit convention).
    warm_up: int = 2_000
    lr_schedule: str = "warmup"  # warmup | inverse_time_decay | constant | cosine
    inverse_time_decay_steps: int = 10_000  # reference train.py:69
    adam_eps: float = 1e-7  # TF Adam default epsilon (reference semantics)
    momentum: float = 0.5  # reference train.py:67
    nesterov: bool = True  # reference train.py:67
    weight_decay: float = 0.0  # reference train.py:80 (commented l2(1e-6))
    ema_decay: float = 0.0  # TPU addition (north star: EMA sampling)
    grad_clip_norm: float = 0.0  # TPU addition
    # Gradient accumulation: apply the optimizer every N micro-batches with
    # the mean of the accumulated grads — an effective batch of
    # N×batch_size when the real batch no longer fits HBM (TPU addition;
    # optax.MultiSteps). 1 = off.
    grad_accum: int = 1

    # ------------------------------------------------------------- precision
    # reference train.py:34,43-45,82-83: fp16 + loss scaling, off by default.
    # TPU-native equivalent is bf16 compute with fp32 params/loss; no loss
    # scaling needed, but static scaling kept for fp16 semantic parity.
    compute_dtype: str = "float32"  # float32 | bfloat16 | float16
    loss_scale: float = 0.0  # 0 = off; with dynamic_loss_scale: initial scale (0 → 2**15)
    # The reference's LossScaleOptimizer (train.py:82-83) is *dynamic* by
    # default: scale halves on overflow, doubles after growth_interval clean
    # steps (TF defaults: initial 2**15, interval 2000, multiplier 2).
    dynamic_loss_scale: bool = False
    loss_scale_growth_interval: int = 2000

    # --------------------------------------------------------- optimizer ZeRO
    # ZeRO-1: shard Adam moments over the data axis (1/data per rank); XLA
    # reduce-scatters grads into the shards and all-gathers updates. Frees
    # ~2x params x 4 B of HBM per rank at >=512^2 scale (SURVEY §2.3 was
    # "not needed" at 41.7 M params on one chip; this is the big-run knob).
    zero1: bool = False

    # -------------------------------------------------------------- training
    batch_size: int = 1  # reference train.py:23 (global batch)
    steps_per_epoch: int = 1000  # reference train.py:517
    epochs: int = 1000  # reference train.py:517
    seed: int = 0

    # ------------------------------------------------------------- GAN mode
    # The reference repo's name and BASELINE.json's configs speak of G/D
    # class-transfer training (adversarial + reconstruction + cycle/identity
    # losses); the reference code itself contains no discriminator
    # (SURVEY §7 "GAN-mode capabilities"). These knobs drive train/gan.py.
    gan_loss: str = "nonsaturating"  # nonsaturating | lsgan | hinge
    adversarial_weight: float = 1.0
    cycle_weight: float = 10.0
    identity_weight: float = 0.5
    reconstruction_weight: float = 0.0
    d_learning_rate: float = 0.0  # 0 -> use learning_rate
    d_pixel_size: int = 0  # 0 -> pixel_size
    d_octaves: int = 0  # 0 -> octaves
    patch_discriminator: bool = True  # PatchGAN logits vs single logit
    # normalization (GAN-mode; the reference model has NONE — parity default
    # keeps both off): none | instance (Pallas-fused on TPU) | batch
    d_norm: str = "none"
    g_norm: str = "none"
    # R1 gradient penalty on the discriminators' real inputs
    # (0.5 · r1_weight · E‖∇ₓD(x)‖² per discriminator; 0 = off) — the
    # standard GAN regulariser for limited-data stability
    r1_weight: float = 0.0
    # differentiable augmentation of every discriminator input (DiffAugment
    # policy; comma list from color,translation,cutout; "" = off). Both real
    # and fake batches are augmented inside the D and G adversarial terms,
    # so no augmentation leaks into the generator outputs themselves.
    diffaug: str = ""
    # Linear annealing of the cycle/identity weights: each ramps from its
    # base value to *_final over the first loss_anneal_steps train-step
    # calls (micro-steps when grad_accum > 1), then holds (-1 final = that
    # term stays constant; 0 steps = feature off, the parity default). Mechanism-targeted knob: the
    # config-5 analysis (BASELINE_MEASURED "Config 5 at 60 epochs") pinned
    # a persistent identity-map attractor — both pulls are pixel-global
    # and keep the identity basin attractive long after the adversarial
    # signal has found genuine transfer; decaying them after warm-up is
    # the standard CycleGAN counter-move, here measurable on-chip.
    cycle_weight_final: float = -1.0
    identity_weight_final: float = -1.0
    loss_anneal_steps: int = 0

    # ----------------------------------------------------- TPU / performance
    conv_impl: str = "auto"  # lax | shuffle | pallas | auto (see ops/conv.py)
    # Never materialise concat-skip buffers: consumers split their kernels
    # along input channels instead (value-identical; saves ~GBs/step of HBM
    # traffic at large batch — models/unet.py).
    concat_elision: bool = True
    fused_diffusion: bool = True  # Pallas fused forward-diffusion kernel
    remat: bool = False  # jax.checkpoint over octaves
    donate_state: bool = True
    # Bounded in-flight dispatch: every N steps the epoch loop fetches one
    # accumulated device scalar, so the host can never run more than N steps
    # ahead of the device. JAX dispatch is asynchronous and applies NO
    # backpressure — on a remote/tunneled device a stalled executor lets the
    # producer loop pin one host batch buffer PER QUEUED STEP (measured:
    # 130 GB host RSS -> OOM kill at 256²/b64 within 3000 steps, r5). When
    # the device keeps pace the fetch is one ready-value round-trip
    # (~tens of ms per N steps, <0.5% at the flagship point). 0 disables
    # (the pre-r5 behavior: one sync per epoch).
    host_sync_every: int = 64

    # ------------------------------------------------------------- parallelism
    # Mesh axis sizes; 0 = use all remaining devices on that axis.
    mesh_data: int = 0
    mesh_model: int = 1
    mesh_slice: int = 1  # >1: multi-slice pod (DCN axis; see parallel/mesh.py)
    # Pipeline parallelism (parallel/pipeline.py): partition the U-Net's
    # octave V into nested stage bands on separate devices, GPipe-style
    # microbatching with recompute-backward. For models that do NOT fit one
    # chip. 1 = off. Composes with neither TP nor multi-slice.
    pipeline_stages: int = 1
    # Microbatches per step (0 -> pipeline_stages). batch_size must divide.
    pipeline_microbatches: int = 0
    # Explicit octave cut positions ("" = analytic min-max-MAC plan). The
    # MAC plan is wall-clock misbalanced on the MXU (low-channel outer convs
    # run ~1.7x slower per MAC — BASELINE_MEASURED.md r4); calibrate with
    # tools/pp_analysis.py --calibrate and pin the winner here, e.g. "3" for
    # 2 stages cut at octave 3, "2,4" for 3 stages.
    pipeline_cuts: str = ""

    # -------------------------------------------------------------------- io
    log_dir: str = "logs"  # reference train.py:499-503 layout logs/<day>/<time>
    checkpoint_dir: Optional[str] = "checkpoints"
    checkpoint_every: int = 1000  # steps between saves; 0 = never mid-run
    # Retention: keep only the newest N step_* checkpoints (0 = keep all).
    checkpoint_keep: int = 0
    # Overlap checkpoint disk writes with training (utils/checkpoint.
    # AsyncSaver): the train loop stalls only for the device->host fetch;
    # orbax serialisation, the atomic rename, and retention run on a
    # background thread. Saves still commit in order; runners flush at the
    # end of fit and before any restore.
    checkpoint_async: bool = False
    # Track the run's primary quality metric at every logged eval and keep
    # the best state under <checkpoint_dir>/best (a normal self-contained
    # checkpoint dir — point sample/serve/eval at it). Lower is better
    # (FID; GAN runners track the mean of their per-pair transfer FIDs).
    # Motivation: cycle-GAN transfer FID is non-monotone late in training
    # (BASELINE_MEASURED "Config 5 at 60 epochs" — phase oscillation around
    # the identity attractor), so the FINAL checkpoint can be far worse
    # than the best seen. Requires fid_samples > 0 to have any effect.
    keep_best: bool = False
    log_images_every: int = 1  # epochs between log_sample calls; 0 = never
    # FID-style sample-quality tracking (BASELINE "steps-to-fixed-FID"):
    # 0 = off; N = compute FID between N generated samples and N data images
    # at every log_sample (utils/metrics.py).
    fid_samples: int = 0
    # Feature embedding for FID: "trained" = the pinned committed classifier
    # (utils/fid_extractor.py), "random" = fixed-seed random-conv projection,
    # "auto" = trained when its weights exist (the default),
    # "inception:<path>" = true InceptionV3 pool3 from a standard state-dict
    # file (.pth/.npz; utils/inception.py) — publication-comparable FID.
    fid_extractor: str = "auto"
    # Serving load shed: max images queued per request batcher before the
    # HTTP frontends answer 503 + Retry-After (serve/server.ServerBusy).
    # 0 = unbounded (requests queue without limit under overload).
    serve_max_queue: int = 512
    # Request-coalescing window (ms) for the serving batchers: how long the
    # collector waits for more requests before launching a device batch.
    # 10 ms suits open-loop traffic; closed-loop clients re-requesting
    # after multi-second reverse diffusions need a window ≥ their arrival
    # skew or stragglers miss the batch and pow2 padding wastes device
    # time (tools/bench_serving.py r5: 10 → 250 ms recovered the gap
    # between e2e and raw-sampler throughput at stride 1, b128).
    serve_batch_wait_ms: float = 10.0
    # Max CONCURRENT /sample streams (each holds a full un-coalesced
    # reverse-diffusion trajectory behind the device lock — streams bypass
    # the batchers, so they need their own shed). 0 = unbounded.
    serve_max_streams: int = 4

    # ------------------------------------------------------------ derived ---
    def class_patterns(self) -> Tuple[str, ...]:
        return self.classes if self.classes else (self.dataset_pattern,)

    def octave_filters(self, i: int) -> int:
        """Channel width at octave i (reference train.py:181)."""
        return min(self.pixel_size * 2**i, self.max_size)

    def octave_up_filters(self, i: int) -> int:
        """UpShuffle output width at octave i (reference train.py:188)."""
        return min(self.pixel_size * 2**i // 2, self.max_size)

    def middle_filters(self) -> int:
        return min(self.pixel_size * 2**self.octaves, self.max_size)

    def out_channels(self) -> int:
        return 3 * self.steps if self.per_step_output else 3

    def validate(self) -> "Config":
        if self.size % (2**self.octaves) != 0:
            raise ValueError(
                f"size={self.size} not divisible by 2**octaves={2**self.octaves}"
            )
        if self.skip_mode not in ("concat", "residual", "none"):
            raise ValueError(f"unknown skip_mode {self.skip_mode!r}")
        if self.parameterization not in ("x", "epsilon", "scaled_epsilon", "ode"):
            raise ValueError(f"unknown parameterization {self.parameterization!r}")
        if self.schedule not in (
            "quadratic", "exponential", "rational_exponential", "geometric",
            "cosine2", "quartic",
        ):
            raise ValueError(f"unknown schedule {self.schedule!r}")
        if self.loss not in ("mse", "l1", "dct", "mse_multiscale"):
            raise ValueError(f"unknown loss {self.loss!r}")
        for knob in (self.d_norm, self.g_norm):
            if knob not in ("none", "instance", "batch"):
                raise ValueError(f"unknown norm {knob!r}")
        for aug in filter(None, self.diffaug.split(",")):
            if aug not in ("color", "translation", "cutout"):
                raise ValueError(
                    f"unknown diffaug policy {aug!r} "
                    "(comma list from color,translation,cutout)"
                )
        if self.r1_weight < 0:
            raise ValueError(f"r1_weight must be >= 0, got {self.r1_weight}")
        if self.loss_anneal_steps < 0:
            raise ValueError(
                f"loss_anneal_steps must be >= 0, got {self.loss_anneal_steps}"
            )
        for name, final in (
            ("cycle_weight_final", self.cycle_weight_final),
            ("identity_weight_final", self.identity_weight_final),
        ):
            if final < 0 and final != -1.0:
                raise ValueError(
                    f"{name} must be -1 (no anneal) or >= 0, got {final}"
                )
            if final >= 0 and self.loss_anneal_steps == 0:
                raise ValueError(
                    f"{name}={final} needs loss_anneal_steps > 0 "
                    "(the ramp length)"
                )
        if self.serve_batch_wait_ms < 0:
            raise ValueError(
                f"serve_batch_wait_ms must be >= 0, "
                f"got {self.serve_batch_wait_ms}"
            )
        if self.serve_max_queue < 0:
            raise ValueError(
                f"serve_max_queue must be >= 0 (0 = unbounded), "
                f"got {self.serve_max_queue}"
            )
        if self.data_hbm < 0 or (self.data_hbm and self.data_hbm < self.size):
            raise ValueError(
                f"data_hbm must be 0 (off) or >= size={self.size} (the "
                f"stored center-crop side), got {self.data_hbm}"
            )
        if self.host_sync_every < 0:
            raise ValueError(
                f"host_sync_every must be >= 0 (0 = one sync per epoch), "
                f"got {self.host_sync_every}"
            )
        if self.fid_extractor not in ("auto", "trained", "random") and not (
            self.fid_extractor.startswith("inception:")
            or self.fid_extractor.startswith("inception-tv:")
        ):
            raise ValueError(
                f"unknown fid_extractor {self.fid_extractor!r} "
                "(auto | trained | random | inception:<path> | "
                "inception-tv:<path>)"
            )
        if self.moment_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"unknown moment_dtype {self.moment_dtype!r} "
                "(float32 | bfloat16)"
            )
        if self.grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {self.grad_accum}")
        if not 1 <= self.sample_stride <= self.steps:
            raise ValueError(
                f"sample_stride must be in [1, steps], got {self.sample_stride}"
            )
        if self.grad_accum > 1 and self.zero1:
            # the MultiSteps accumulator tree is params-shaped but lives in
            # opt_state; the ZeRO-1 sharding rule would shard it like a
            # moment, which is wrong for an accumulator that must mirror the
            # (replicated) grads. Explicitly unsupported.
            raise ValueError("grad_accum > 1 is not supported with zero1")
        if self.grad_accum > 1 and self.dynamic_loss_scale:
            raise ValueError(
                "grad_accum > 1 is not supported with dynamic_loss_scale"
            )
        if self.pipeline_stages < 1:
            raise ValueError(
                f"pipeline_stages must be >= 1, got {self.pipeline_stages}"
            )
        if self.pipeline_microbatches < 0:
            raise ValueError(
                "pipeline_microbatches must be >= 0 (0 = pipeline_stages), "
                f"got {self.pipeline_microbatches}"
            )
        if self.pipeline_cuts:
            try:
                cuts = [int(c) for c in self.pipeline_cuts.split(",")]
            except ValueError:
                raise ValueError(
                    f"pipeline_cuts must be comma-separated ints, got "
                    f"{self.pipeline_cuts!r}"
                ) from None
            if cuts != sorted(set(cuts)) or not all(
                0 < c < self.octaves for c in cuts
            ):
                raise ValueError(
                    f"pipeline_cuts must be strictly increasing octave "
                    f"positions in (0, {self.octaves}), got {cuts}"
                )
            if self.pipeline_stages > 1 and len(cuts) != self.pipeline_stages - 1:
                raise ValueError(
                    f"pipeline_cuts needs pipeline_stages-1="
                    f"{self.pipeline_stages - 1} cuts, got {len(cuts)}"
                )
        if self.pipeline_stages > 1:
            # the full compatibility matrix is enforced by
            # parallel/pipeline._validate at trainer construction
            if self.pipeline_stages > self.octaves:
                raise ValueError(
                    f"pipeline_stages={self.pipeline_stages} cannot exceed "
                    f"octaves={self.octaves} (stages own octave bands)"
                )
        return self

    # --------------------------------------------------------- serialization
    @property
    def cycle_term_active(self) -> bool:
        """Whether the cycle term is part of the compiled program: nonzero
        at SOME point of training (base now, or annealing toward a nonzero
        final). Gates the two extra generator forwards in train/gan.py and
        the planner's GAN step-cost model."""
        return self.cycle_weight > 0 or (
            self.loss_anneal_steps > 0 and self.cycle_weight_final > 0
        )

    @property
    def identity_term_active(self) -> bool:
        return self.identity_weight > 0 or (
            self.loss_anneal_steps > 0 and self.identity_weight_final > 0
        )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)
        raw = {k: v for k, v in raw.items() if k in _FIELD_NAMES}
        for k in ("classes",):
            if k in raw and isinstance(raw[k], list):
                raw[k] = tuple(raw[k])
        return cls(**raw).validate()

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_FIELD_NAMES = {f.name for f in dataclasses.fields(Config)}


def tiny_test_config(**overrides) -> Config:
    """A minimal config for fast CPU tests (BASELINE.json config-1 scale)."""
    base = dict(
        size=16,
        pixel_size=4,
        max_size=8,
        octaves=2,
        steps=10,
        batch_size=2,
        warm_up=2,
        test_step=2,
        steps_per_epoch=2,
        epochs=1,
        fused_diffusion=False,
        compute_dtype="float32",
    )
    base.update(overrides)
    return Config(**base).validate()
