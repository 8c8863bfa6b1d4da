"""Command-line interface.

The reference has no CLI — its config surface is module constants
(reference train.py:5-45). BASELINE.json names "train.py CLI flags" as public
surface, so every Config field is exposed as ``--flag``:

    python -m gan_class_transfer2_tpu.cli train --dataset-pattern 'data/*.png' \
        --size 256 --batch-size 8 --compute-dtype bfloat16

    python -m gan_class_transfer2_tpu.cli sample --checkpoint-dir ckpt --out samples/

    python -m gan_class_transfer2_tpu.cli bench --size 64 --batch-size 8
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

from .config import Config


def _add_config_args(p: argparse.ArgumentParser):
    for f in dataclasses.fields(Config):
        name = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(
                name,
                type=lambda s: s.lower() in ("1", "true", "yes"),
                default=None,
                metavar="BOOL",
            )
        elif isinstance(f.default, int) and not isinstance(f.default, bool):
            p.add_argument(name, type=int, default=None)
        elif isinstance(f.default, float):
            p.add_argument(name, type=float, default=None)
        elif f.name == "classes":
            p.add_argument(name, type=str, nargs="*", default=None)
        else:
            p.add_argument(name, type=str, default=None)


def _explicit_overrides(args) -> dict:
    """The Config fields the user explicitly set on the command line."""
    overrides = {}
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name, None)
        if v is not None:
            overrides[f.name] = tuple(v) if f.name == "classes" else v
    return overrides


def config_from_args(args, checkpoint_config: bool = False) -> Config:
    """Resolve the effective Config: explicit CLI flags > --config JSON >
    (for checkpoint-reading commands) the config.json the train command
    saved next to the checkpoints > dataclass defaults.

    ``checkpoint_config`` matters for restore correctness: sample/edit/serve
    must rebuild the exact TrainState *structure* the checkpoint was written
    with (e.g. ``optimizer="adam_tf"`` has a different opt-state tree than
    "adam"), so the saved train-time config — not the defaults — is the
    right base when the user doesn't pass every flag."""
    import os

    overrides = _explicit_overrides(args)
    default_ckpt_dir = next(
        f.default for f in dataclasses.fields(Config)
        if f.name == "checkpoint_dir"
    )
    base = None
    if getattr(args, "config", None):
        with open(args.config) as fh:
            base = Config.from_json(fh.read())
    elif checkpoint_config:
        # the DEFAULT checkpoint dir counts too: sample/serve with no flags
        # must still rebuild the train-time state structure
        ckpt_dir = overrides.get("checkpoint_dir", default_ckpt_dir)
        if ckpt_dir and os.path.exists(os.path.join(ckpt_dir, "config.json")):
            from .utils.checkpoint import load_config

            # the saved config may carry the TRAIN-time checkpoint path
            # (e.g. the run was copied elsewhere) — restore from the dir
            # the config was actually found in
            base = load_config(ckpt_dir).replace(checkpoint_dir=ckpt_dir)
    if base is not None:
        return base.replace(**overrides).validate()
    return Config(**overrides).validate()


def _setup_compilation_cache(flag_value):
    """Enable JAX's persistent compilation cache for every CLI command.

    The reference pays a fresh trace+compile on every ``python train.py``
    launch (reference train.py:505-514 rebuilds and re-traces the model each
    run); on this framework's target — a remote/tunneled TPU where each
    compile is an RPC taking minutes at the flagship config — an on-disk
    executable cache turns restart/resume/serve cold-starts into
    seconds-long warm starts. jax keys the cache on program + flags +
    platform, so it is always safe to share one directory.
    """
    import os

    path = flag_value
    if path is None:
        path = os.environ.get(
            "GCT2_COMPILATION_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache",
                "gan_class_transfer2_tpu", "xla-cache",
            ),
        )
    if not path or path.lower() in ("none", "off"):
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — older jax without the knobs
        pass


def main(argv=None):
    parser = argparse.ArgumentParser(prog="gan_class_transfer2_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    for cmd in ("train", "gan-train", "cgan-train", "sample", "edit", "bench",
                "serve", "build-cache", "export-weights", "export-model",
                "eval", "profile", "distill", "plan"):
        p = sub.add_parser(cmd)
        p.add_argument("--config", type=str, default=None, help="config JSON")
        p.add_argument(
            "--platform",
            type=str,
            default=None,
            choices=("tpu", "cpu"),
            help="force the JAX backend (the JAX_PLATFORMS env var is "
            "overridden by TPU plugins in some environments; this flag "
            "always wins)",
        )
        p.add_argument(
            "--compilation-cache", type=str, default=None, metavar="DIR",
            help="persistent XLA compilation cache directory. Default: "
            "$GCT2_COMPILATION_CACHE or ~/.cache/gan_class_transfer2_tpu/"
            "xla-cache — on by default because on a remote/tunneled TPU the "
            "first compile of the flagship step takes minutes and is "
            "identical across restarts. Pass 'none' to disable.",
        )
        _add_config_args(p)
        if cmd in ("train", "gan-train", "cgan-train"):
            p.add_argument(
                "--resilient", type=int, default=0, metavar="N",
                help="restart up to N times from the last checkpoint on a "
                "step failure (requires --checkpoint-dir)",
            )
            # multi-host (pod) launch: one process per host, all pointing at
            # the same coordinator. initialize() runs BEFORE any backend
            # touch; the mesh then spans every host's devices, input files
            # shard per host, and only process 0 writes artifacts.
            p.add_argument(
                "--coordinator", type=str, default=None, metavar="HOST:PORT",
                help="jax.distributed coordinator address (multi-host runs)",
            )
            p.add_argument("--num-processes", type=int, default=None)
            p.add_argument("--process-id", type=int, default=None)
        if cmd == "sample":
            p.add_argument("--out", type=str, default="samples")
            p.add_argument("--num", type=int, default=6)
            p.add_argument(
                "--class-idx", type=int, default=None,
                help="class to sample from (conditional checkpoints, "
                "num_classes > 0)",
            )
            p.add_argument(
                "--bundle", type=str, default=None, metavar="DIR",
                help="sample from a compiled model bundle (export-model) "
                "instead of a checkpoint — no model build, no re-trace",
            )
        if cmd == "edit":
            p.add_argument("--input", type=str, required=True, help="image path")
            p.add_argument("--out", type=str, default="edited")
            p.add_argument(
                "--class-idx", type=int, default=None,
                help="class of the input image (conditional checkpoints)",
            )
            p.add_argument(
                "--edits", type=str, nargs="*",
                default=["pixelate", "shift", "quantise"],
            )
        if cmd == "bench":
            p.add_argument("--bench-steps", type=int, default=30)
        if cmd == "build-cache":
            p.add_argument("--out", type=str, required=True,
                           help="cache file path")
            p.add_argument("--store", type=int, default=0,
                           help="stored image side (default: size + size/8)")
        if cmd == "export-weights":
            p.add_argument(
                "--out", type=str, default="weights.npz",
                help="output npz of flat weights in Keras build order "
                "(load with tf_import docs or model.set_weights)",
            )
        if cmd == "export-model":
            p.add_argument(
                "--out", type=str, required=True,
                help="output bundle directory (manifest.json + one "
                "serialized StableHLO program per inference surface)",
            )
            p.add_argument(
                "--model", type=str, default="diffusion",
                choices=("diffusion", "gan", "cgan"),
                help="which checkpoint kind to export",
            )
            p.add_argument(
                "--programs", type=str, nargs="*", default=None,
                help="subset of programs to export (default: all — "
                "diffusion: denoise/sample/invert; gan: transfer_ab/"
                "transfer_ba; cgan: transfer)",
            )
            p.add_argument(
                "--export-platforms", type=str, default="tpu,cpu",
                help="comma-separated lowering targets baked into the "
                "bundle (default tpu,cpu: one artifact for dev and prod)",
            )
        if cmd == "eval":
            p.add_argument(
                "--model", type=str, default="diffusion",
                choices=("diffusion", "gan", "cgan"),
                help="which runner's quality metric to score (held-out FID "
                "for diffusion, transfer-FID pairs for gan/cgan)",
            )
        if cmd == "profile":
            p.add_argument(
                "--model", type=str, default="diffusion",
                choices=("diffusion", "gan", "cgan"),
                help="which training step to trace",
            )
            p.add_argument("--profile-steps", type=int, default=3)
            p.add_argument("--top", type=int, default=25,
                           help="op rows to print from the device plane")
            p.add_argument(
                "--trace-dir", type=str, default=None,
                help="where the raw trace lands (kept for TensorBoard/"
                "Perfetto/XProf; default: a fresh temp dir)",
            )
        if cmd == "distill":
            p.add_argument(
                "--out", type=str, required=True,
                help="directory for the distilled student checkpoint "
                "(its config.json carries the doubled sample_stride, so "
                "sample/serve/eval pick the fast schedule up automatically)",
            )
            p.add_argument(
                "--target-stride", type=int, default=None,
                help="final sample_stride (teacher stride · 2^k); default: "
                "one halving round, 2 · the teacher's stride",
            )
            p.add_argument(
                "--distill-steps", type=int, default=2000,
                help="optimizer steps per halving round",
            )
        if cmd == "plan":
            p.add_argument(
                "--model", type=str, default="diffusion",
                choices=("diffusion", "gan", "cgan"),
                help="workload kind: diffusion gets the full strategy "
                "enumeration; gan/cgan get DP planning over their exact "
                "state trees",
            )
            p.add_argument(
                "--chips", type=int, default=8,
                help="TPU chip budget to plan for (default: the BASELINE "
                "north-star v5e-8)",
            )
            p.add_argument(
                "--hbm-gb", type=float, default=16.0,
                help="HBM per chip in GB (default 16 = v5e)",
            )
            p.add_argument(
                "--budget-frac", type=float, default=0.75,
                help="fraction of HBM to plan to (headroom for XLA "
                "workspaces/fragmentation)",
            )
            p.add_argument(
                "--json", action="store_true",
                help="emit the full machine-readable plan instead of the "
                "table",
            )
        if cmd == "serve":
            p.add_argument("--host", type=str, default="127.0.0.1")
            p.add_argument("--port", type=int, default=8080)
            p.add_argument(
                "--model", type=str, default="diffusion",
                choices=("diffusion", "gan", "cgan"),
            )
            p.add_argument(
                "--frontend", type=str, default="threaded",
                choices=("threaded", "aio"),
                help="threaded = http.server thread-per-connection; aio = "
                "asyncio event loop (scales to many slow/idle clients; "
                "device batching identical)",
            )
            p.add_argument(
                "--bundle", type=str, default=None, metavar="DIR",
                help="serve a compiled model bundle (export-model) instead "
                "of a checkpoint: config + weights come from the artifact; "
                "sample/denoise/transfer per its programs (edit/stream/"
                "reload stay checkpoint-only)",
            )

    args = parser.parse_args(argv)
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    _setup_compilation_cache(getattr(args, "compilation_cache", None))
    if getattr(args, "coordinator", None):
        # MUST precede any backend touch (multihost.initialize docstring);
        # jax.config.update above is config-only and safe before this
        from .parallel import multihost

        kw = {}
        if args.num_processes is not None:
            kw["num_processes"] = args.num_processes
        if args.process_id is not None:
            kw["process_id"] = args.process_id
        multihost.initialize(args.coordinator, **kw)
    elif getattr(args, "num_processes", None) is not None or getattr(
        args, "process_id", None
    ) is not None:
        # without a coordinator every process would silently train an
        # INDEPENDENT single-host job and race-write the shared output
        # dirs — exactly the hazard multihost.initialize exists to prevent
        parser.error(
            "--num-processes/--process-id require --coordinator "
            "(otherwise each process runs an independent single-host job)"
        )
    cfg = config_from_args(
        args,
        checkpoint_config=args.command
        in ("sample", "edit", "serve", "export-weights", "export-model",
            "eval", "distill"),
    )

    if args.command == "train":
        from .train.loop import Runner

        runner = Runner(cfg)
        try:
            if getattr(args, "resilient", 0) > 0:
                runner.fit_resilient(max_restarts=args.resilient)
            else:
                runner.fit()
        finally:
            runner.close()
        return 0

    if args.command == "gan-train":
        from .train.gan_loop import GANRunner

        runner = GANRunner(cfg)
        try:
            if getattr(args, "resilient", 0) > 0:
                runner.fit_resilient(max_restarts=args.resilient)
            else:
                runner.fit()
        finally:
            runner.close()
        return 0

    if args.command == "cgan-train":
        from .train.conditional_gan_loop import ConditionalGANRunner

        runner = ConditionalGANRunner(cfg)
        try:
            if getattr(args, "resilient", 0) > 0:
                runner.fit_resilient(max_restarts=args.resilient)
            else:
                runner.fit()
        finally:
            runner.close()
        return 0

    if args.command == "sample":
        return _sample(cfg, args)

    if args.command == "distill":
        return _distill(cfg, args)

    if args.command == "edit":
        return _edit(cfg, args)

    if args.command == "eval":
        return _eval(cfg, args)

    if args.command == "profile":
        return _profile(cfg, args)

    if args.command == "bench":
        from .utils.benchmark import run_benchmark

        result = run_benchmark(cfg, steps=args.bench_steps)
        print(result.to_json())
        return 0

    if args.command == "build-cache":
        from .data import native_loader

        store = args.store or cfg.size + cfg.size // 8
        n = native_loader.build_cache(cfg.dataset_pattern, store, args.out)
        print(f"wrote {n} records ({store}x{store}x3 uint8) to {args.out}")
        return 0

    if args.command == "export-weights":
        # migration in the export direction (docs/MIGRATION.md): flat
        # weights in Keras build order, loadable via model.set_weights
        import jax
        import numpy as np

        from .train import trainer as trainer_lib
        from .utils import checkpoint as ckpt_lib
        from .utils import tf_import

        if not (
            cfg.checkpoint_dir
            and ckpt_lib.latest_step(cfg.checkpoint_dir) is not None
        ):
            raise SystemExit(
                f"no checkpoint found in {cfg.checkpoint_dir!r} "
                "(export needs trained weights)"
            )
        state = trainer_lib.init_state(cfg, jax.random.PRNGKey(cfg.seed))
        state = ckpt_lib.restore(cfg.checkpoint_dir, state)
        params = (
            state.ema_params if state.ema_params is not None else state.params
        )
        flat = tf_import.export_flat_weights(cfg, params)
        # 5-digit pad keeps sorted(data.files) == build order for any
        # realistic weight count (3 digits breaks at 1000 arrays)
        np.savez(args.out, **{f"w_{i:05d}": w for i, w in enumerate(flat)})
        print(
            f"wrote {len(flat)} weights (step {int(state.step)}, Keras "
            f"build order) to {args.out}"
        )
        return 0

    if args.command == "export-model":
        return _export_model(cfg, args)

    if args.command == "plan":
        return _plan(cfg, args)

    if args.command == "serve":
        if args.bundle:
            from .serve.server import serve_from_bundle

            serve_from_bundle(
                args.bundle,
                host=args.host,
                port=args.port,
                frontend=args.frontend,
                # serving knobs (shedding caps, sample_stride, seed …) stay
                # user-settable; the model shape is sealed in the artifact
                overrides=_explicit_overrides(args),
            )
            return 0
        from .serve.server import serve_from_checkpoint

        serve_from_checkpoint(
            cfg,
            host=args.host,
            port=args.port,
            model=args.model,
            frontend=args.frontend,
        )
        return 0

    return 1


def _plan(cfg: Config, args) -> int:
    """Recommend a parallelism strategy for this workload and chip budget
    (parallel/planner.py). The reference is single-device by construction
    (reference train.py:40); on TPU the scaling recipe is pick-a-mesh →
    annotate shardings → let XLA insert collectives, and this command
    automates the pick. Entirely analytic — no devices touched, works with
    the TPU tunnel down."""
    import json as json_lib

    from .parallel import planner

    result = planner.plan(
        cfg, args.chips, hbm_gb=args.hbm_gb, budget_frac=args.budget_frac,
        model=args.model,
    )
    if args.json:
        print(json_lib.dumps(result))
    else:
        print(planner.format_plan(result))
    return 0


def _export_model(cfg: Config, args) -> int:
    """Export trained weights as a compiled model bundle (utils/bundle.py):
    batch-polymorphic, multi-platform StableHLO programs with the weights
    embedded — the deployment artifact the reference cannot produce at all
    (reference train.py has no save/export surface)."""
    import jax

    from .utils import bundle as bundle_lib
    from .utils import checkpoint as ckpt_lib

    if not (
        cfg.checkpoint_dir
        and ckpt_lib.latest_step(cfg.checkpoint_dir) is not None
    ):
        raise SystemExit(
            f"no checkpoint found in {cfg.checkpoint_dir!r} "
            "(export needs trained weights)"
        )
    key = jax.random.PRNGKey(cfg.seed)
    if args.model == "diffusion":
        from .train import trainer as trainer_lib

        state = trainer_lib.init_state(cfg, key)
    elif args.model == "gan":
        from .train import gan as gan_lib

        state = gan_lib.init_gan_state(cfg, key)
    else:
        from .train import conditional_gan as cgan_lib

        state = cgan_lib.init_conditional_gan_state(cfg, key)
    state = ckpt_lib.restore(cfg.checkpoint_dir, state)

    platforms = tuple(
        p.strip() for p in args.export_platforms.split(",") if p.strip()
    )
    manifest = bundle_lib.export_bundle(
        cfg, state, args.out,
        model=args.model, programs=args.programs, platforms=platforms,
    )
    names = ", ".join(sorted(manifest["programs"]))
    print(
        f"wrote bundle to {args.out}: programs [{names}] "
        f"(step {manifest['step']}, platforms {manifest['platforms']})"
    )
    return 0


def _sample_from_bundle(args) -> int:
    """Sample from a compiled bundle: the config (size, classes, stride) and
    the weights both live inside the artifact — nothing is rebuilt."""
    import jax.numpy as jnp
    import numpy as np

    from .utils import bundle as bundle_lib

    bundle = bundle_lib.load_bundle(args.bundle)
    m = bundle.manifest
    if "sample" not in m["programs"]:
        raise SystemExit(
            f"bundle {args.bundle!r} has no 'sample' program "
            f"(model={m['model']}, programs={bundle.programs})"
        )
    bcfg = m["config"]
    # --seed is a live sampling knob (fresh noise draws); everything else
    # about the model is sealed in the artifact
    seed = args.seed if args.seed is not None else bcfg.get("seed", 0)
    size = bcfg["size"]
    rng = np.random.default_rng(seed)
    batch = jnp.asarray(
        rng.normal(size=(args.num, size, size, 3)).astype(np.float32)
    )
    call_args = [batch]
    conditional = len(m["programs"]["sample"]["inputs"]) > 1
    if conditional:
        num_classes = bcfg.get("num_classes", 0)
        cls = args.class_idx if args.class_idx is not None else 0
        if not 0 <= cls < num_classes:
            raise SystemExit(f"--class-idx must be in [0, {num_classes})")
        call_args.append(jnp.full((args.num,), cls, jnp.int32))
    elif args.class_idx is not None:
        raise SystemExit("--class-idx: bundle is unconditional")
    images = np.asarray(bundle.call("sample", *call_args))
    _write_sample_pngs(images, args.out)
    print(
        f"wrote {len(images)} samples to {args.out} "
        f"(bundle step {m['step']})"
    )
    return 0


def _write_sample_pngs(images, out_dir: str) -> None:
    """ONE encoder for both sample paths — bundle-vs-checkpoint byte parity
    is a tested contract (test_cli_export_model_and_bundle_sample)."""
    import os

    import numpy as np
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    for i, img in enumerate(images):
        arr = np.clip((img * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(out_dir, f"sample_{i}.png"))


def _sample(cfg: Config, args) -> int:
    import jax
    import numpy as np

    from .sample import sampler
    from .train import trainer as trainer_lib
    from .utils import checkpoint as ckpt_lib

    if getattr(args, "bundle", None):
        return _sample_from_bundle(args)

    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(cfg.seed))
    if cfg.checkpoint_dir and ckpt_lib.latest_step(cfg.checkpoint_dir) is not None:
        state = ckpt_lib.restore(cfg.checkpoint_dir, state)
    else:
        print(
            f"warning: no checkpoint found in {cfg.checkpoint_dir!r}; "
            "sampling from randomly initialised weights",
            file=sys.stderr,
        )
    params = state.ema_params if state.ema_params is not None else state.params

    rng = np.random.default_rng(cfg.seed)
    batch = jax.numpy.asarray(
        rng.normal(size=(args.num, cfg.size, cfg.size, 3)).astype(np.float32)
    )
    class_idx = None
    if getattr(args, "class_idx", None) is not None:
        if cfg.num_classes <= 0:
            raise SystemExit(
                "--class-idx requires a conditional checkpoint (num_classes > 0)"
            )
        if not 0 <= args.class_idx < cfg.num_classes:
            raise SystemExit(
                f"--class-idx must be in [0, {cfg.num_classes})"
            )
        class_idx = jax.numpy.full((args.num,), args.class_idx, jax.numpy.int32)
    result = jax.jit(
        lambda p, b, c: sampler.sample(cfg, p, b, class_idx=c, snapshots=False)
    )(params, batch, class_idx)
    images = np.asarray(result.images)
    _write_sample_pngs(images, args.out)
    print(f"wrote {len(images)} samples to {args.out}")
    return 0


def _log_distill_grids(cfg: Config, teacher, student, stride: int, writer):
    """TensorBoard artifact of the trade: the same 6 noise draws sampled by
    the teacher at its stride and by the student at the distilled stride —
    matched quality should make the grids near-identical at 1/2^k the
    denoiser calls."""
    import jax
    import numpy as np

    from .sample import sampler

    init = jax.random.normal(
        jax.random.PRNGKey(cfg.seed + 7), (6, cfg.size, cfg.size, 3)
    )
    t_imgs = np.asarray(
        sampler.sample(cfg, teacher, init, snapshots=False).images
    )
    s_imgs = np.asarray(
        sampler.sample(
            cfg.replace(sample_stride=stride), student, init, snapshots=False
        ).images
    )
    writer.image("distill/teacher_samples", t_imgs * 0.5 + 0.5, stride, 6)
    writer.image("distill/student_samples", s_imgs * 0.5 + 0.5, stride, 6)


def _distill(cfg: Config, args) -> int:
    """Progressive sampler distillation (train/distill.py): halve the
    reverse-diffusion step count per round and write a drop-in student
    checkpoint whose config.json carries the final sample_stride."""
    import jax

    from .data import pipeline as data_pipeline
    from .train import distill as distill_lib
    from .train import trainer as trainer_lib
    from .utils import checkpoint as ckpt_lib

    if not (
        cfg.checkpoint_dir
        and ckpt_lib.latest_step(cfg.checkpoint_dir) is not None
    ):
        raise SystemExit(
            f"no checkpoint found in {cfg.checkpoint_dir!r} "
            "(distillation needs a trained teacher)"
        )
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(cfg.seed))
    state = ckpt_lib.restore(cfg.checkpoint_dir, state)
    teacher = state.ema_params if state.ema_params is not None else state.params

    target = args.target_stride or 2 * max(cfg.sample_stride, 1)
    # FID hygiene, exactly as the training Runner (train/loop.py): reserve
    # the fid_samples held-out files per class so a later `gct2 eval` of the
    # student never scores against images the distillation iterator trained on
    files_per_class = None
    if cfg.fid_samples > 0:
        try:
            files_per_class = [
                data_pipeline.held_out_split(p, cfg.fid_samples, seed=cfg.seed + i)[0]
                for i, p in enumerate(cfg.class_patterns())
            ]
        except FileNotFoundError:
            files_per_class = None  # non-file dataset; make_datasets will raise
    dsets = data_pipeline.make_datasets(cfg, files_per_class=files_per_class)
    from .utils import tensorboard as tb

    writer = tb.SummaryWriter(tb.reference_log_dir(cfg.log_dir))
    try:
        # class-conditional checkpoints distill on labeled round-robin
        # batches, mirroring the training Runner (train/loop.py)
        dataset = (
            data_pipeline.LabeledDataset(dsets)
            if cfg.num_classes > 0 else dsets[0]
        )
        # distillation scales over the local mesh exactly like training:
        # batches staged sharded on 'data', student state/teacher params
        # placed by distill_round
        from .parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(cfg)
        # batches shard over ('slice','data') on multi-slice meshes, so the
        # divisibility check must use the full data extent, not the 'data'
        # axis alone
        use_mesh = (
            mesh.size > 1
            and cfg.batch_size % mesh_lib.data_axis_size(mesh) == 0
        )
        data_iter = data_pipeline.device_iterator(
            dataset, mesh_lib.batch_sharding(mesh) if use_mesh else None,
        )
        params, stride = distill_lib.progressive_distill(
            cfg, teacher, data_iter, target, args.distill_steps,
            on_loss=lambda s, i, loss: writer.scalar(
                f"distill_loss/stride_{s}", loss, i
            ),
            mesh=mesh if use_mesh else None,
        )
        _log_distill_grids(cfg, teacher, params, stride, writer)
    finally:
        writer.close()
        for d in dsets:
            if hasattr(d, "close"):
                d.close()

    student_cfg = cfg.replace(sample_stride=stride, checkpoint_dir=args.out)
    out_state = state._replace(
        params=params,
        ema_params=params if state.ema_params is not None else None,
    )
    path = ckpt_lib.save(args.out, out_state, student_cfg)
    print(
        f"wrote distilled student (sample_stride={stride}, "
        f"{len(distill_lib.student_grid(student_cfg, stride))} sampler steps "
        f"vs the teacher's "
        f"{len(distill_lib.student_grid(cfg, max(cfg.sample_stride, 1)))}) "
        f"to {path}"
    )
    return 0


def _eval(cfg: Config, args) -> int:
    """Score a checkpoint's quality metric without training: held-out FID
    for diffusion checkpoints, the transfer-FID pairs for gan/cgan ones
    (BASELINE.json's steps-to-fixed-FID metric, on demand). Prints one
    JSON line. Uses the runners' own held-out file reservation, so the
    scores match what training logs to TensorBoard."""
    import json as json_lib
    import tempfile

    from .utils import checkpoint as ckpt_lib

    if cfg.fid_samples <= 0:
        raise SystemExit("eval requires fid_samples > 0")
    if not (
        cfg.checkpoint_dir
        and ckpt_lib.latest_step(cfg.checkpoint_dir) is not None
    ):
        print(
            f"warning: no checkpoint found in {cfg.checkpoint_dir!r}; "
            "scoring randomly initialised weights",
            file=sys.stderr,
        )
    out = {"command": "eval", "model": args.model,
           "fid_extractor": cfg.fid_extractor}
    # runners create event writers on construction; keep eval side-effect
    # free by pointing them at a throwaway dir (removed on the way out)
    scratch = tempfile.mkdtemp(prefix="gct2_eval_logs_")
    try:
        _eval_into(cfg, args, out, scratch)
    finally:
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)
    print(json_lib.dumps(out))
    return 0


def _eval_into(cfg: Config, args, out: dict, scratch: str) -> None:
    if args.model == "diffusion":
        from .train.loop import Runner

        runner = Runner(cfg, log_dir=scratch)
        try:
            out["step"] = int(runner.state.step)
            scores = runner.quality_scores()
            # None = degenerate eval set (< 2 images): emit nulls, not crash
            out["fid"] = None if scores is None else float(scores["fid"])
            out["kid"] = None if scores is None else float(scores["kid"])
        finally:
            runner.close()
    elif args.model == "gan":
        from .train.gan_loop import GANRunner

        runner = GANRunner(cfg, log_dir=scratch)
        try:
            out["step"] = int(runner.state.step)
            for d in ("ab", "ba"):
                scores = runner.transfer_scores(d)
                if scores is not None:  # None = degenerate eval set
                    out[f"transfer_fid_{d}"] = float(scores["fid"])
                    out[f"transfer_kid_{d}"] = float(scores["kid"])
        finally:
            runner.close()
    else:
        from .train.conditional_gan_loop import ConditionalGANRunner

        runner = ConditionalGANRunner(cfg, log_dir=scratch)
        try:
            out["step"] = int(runner.state.step)
            for s in range(cfg.num_classes):
                for t in range(cfg.num_classes):
                    if s == t:
                        continue
                    scores = runner.transfer_scores(s, t)
                    if scores is not None:
                        out[f"transfer_fid_{s}_to_{t}"] = float(scores["fid"])
                        out[f"transfer_kid_{s}_to_{t}"] = float(scores["kid"])
        finally:
            runner.close()


def _profile(cfg: Config, args) -> int:
    """Trace N training steps and print the device-plane op-time breakdown
    (the user surface over utils/profiler; raw trace kept for TensorBoard/
    Perfetto/XProf). The reference has no profiling at all (SURVEY §5)."""
    import json as json_lib
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .utils import profiler

    rng = np.random.default_rng(cfg.seed)

    def batch():
        return jnp.asarray(
            rng.uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)),
            jnp.float32,
        )

    key = jax.random.PRNGKey(cfg.seed)
    if args.model == "diffusion":
        from .train import trainer as trainer_lib

        state = trainer_lib.init_state(cfg, key)
        step = trainer_lib.make_train_step(cfg)
        run = lambda s: step(s, batch(), jax.random.PRNGKey(1))
        sync = lambda out: float(out[1])  # loss
    elif args.model == "gan":
        from .train import gan

        state = gan.init_gan_state(cfg, key)
        step = gan.make_gan_train_step(cfg)
        run = lambda s: step(s, batch(), batch(), jax.random.PRNGKey(1))
        sync = lambda out: float(out[1]["g_loss"])
    else:
        from .train import conditional_gan as cgan_lib

        state = cgan_lib.init_conditional_gan_state(cfg, key)
        step = cgan_lib.make_conditional_gan_train_step(cfg)
        labels = jnp.zeros((cfg.batch_size,), jnp.int32)
        run = lambda s: step(
            s, {"image": batch(), "label": labels}, jax.random.PRNGKey(1)
        )
        sync = lambda out: float(out[1]["g_loss"])

    # compile + one warm step, synced by value fetch (block_until_ready
    # returns early on the tunneled TPU platform — StepTimer docstring)
    out = run(state)
    sync(out)
    state2 = out[0]
    out = run(state2)
    sync(out)
    state2 = out[0]

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="gct2_profile_")
    timer = profiler.StepTimer()
    with profiler.trace(trace_dir):
        timer.start()
        for _ in range(max(args.profile_steps, 1)):
            out = run(state2)
            state2 = out[0]
        timer.lap(sync(out))
    rows = profiler.parse_xplane_device_ops(trace_dir, top=args.top)
    for r in rows:
        r["ms_per_step"] = round(r.pop("ms") / max(args.profile_steps, 1), 3)
        print(json_lib.dumps(r))
    wall = timer.times[0] / max(args.profile_steps, 1)
    print(json_lib.dumps({
        "command": "profile", "model": args.model,
        "steps": int(args.profile_steps),
        "wall_ms_per_step": round(wall * 1000, 2),
        "images_per_sec": round(cfg.batch_size / wall, 2),
        "trace_dir": trace_dir,
        "device_rows": len(rows),
        "note": (None if rows else
                 "no device plane parsed (CPU backend or xplane proto "
                 "unavailable); raw trace kept at trace_dir"),
    }))
    return 0


def _edit(cfg: Config, args) -> int:
    """Invert → edit-noise → decode on one image (the reference's signature
    class/style-transfer workflow, train.py:364-496)."""
    import os

    import jax
    import numpy as np
    from PIL import Image

    from .data import pipeline as data_pipeline
    from .sample import sampler
    from .train import trainer as trainer_lib
    from .utils import checkpoint as ckpt_lib

    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(cfg.seed))
    if cfg.checkpoint_dir and ckpt_lib.latest_step(cfg.checkpoint_dir) is not None:
        state = ckpt_lib.restore(cfg.checkpoint_dir, state)
    else:
        print(
            f"warning: no checkpoint found in {cfg.checkpoint_dir!r}; "
            "editing with randomly initialised weights",
            file=sys.stderr,
        )
    params = state.ema_params if state.ema_params is not None else state.params

    class_idx = None
    if getattr(args, "class_idx", None) is not None:
        if cfg.num_classes <= 0:
            raise SystemExit(
                "--class-idx requires a conditional checkpoint (num_classes > 0)"
            )
        if not 0 <= args.class_idx < cfg.num_classes:
            raise SystemExit(f"--class-idx must be in [0, {cfg.num_classes})")
        class_idx = jax.numpy.full((1,), args.class_idx, jax.numpy.int32)

    rng = np.random.default_rng(cfg.seed)
    # deterministic decode: the user edits the image they supplied — a
    # random crop corner or a seed-dependent mirror of it would be a
    # different picture (review r4)
    img = data_pipeline.decode_image(
        args.input, cfg.size, rng, crop=True, flip=False, center=True
    )
    image = jax.numpy.asarray(img)[None]
    results = jax.jit(
        lambda p, x, c: sampler.edit_image(
            cfg, p, x, tuple(args.edits), class_idx=c
        )
    )(params, image, class_idx)
    os.makedirs(args.out, exist_ok=True)
    for name, out in results.items():
        arr = np.clip((np.asarray(out)[0] * 0.5 + 0.5) * 255, 0, 255).astype(
            np.uint8
        )
        Image.fromarray(arr).save(os.path.join(args.out, f"{name}.png"))
    print(f"wrote {len(results)} edits to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
