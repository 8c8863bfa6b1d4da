"""Run driver — the framework equivalent of the reference's ``__main__``
block (reference train.py:498-523): build writer → warm-up/compile → fit with
the per-epoch sampling callback — plus the capabilities the reference lacks:
checkpoint/resume, multi-chip meshes, profiling hooks, throughput metrics.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import pipeline
from ..parallel import mesh as mesh_lib
from ..parallel import multihost
from ..utils import checkpoint as ckpt_lib
from ..utils import tensorboard as tb
from . import trainer as trainer_lib
from .resilience import ResilientRunnerMixin


class Runner(ResilientRunnerMixin):
    """Owns mesh, state, data, logging, and the epoch loop."""

    def __init__(self, cfg: Config, dataset=None, log_dir: Optional[str] = None):
        self.cfg = cfg.validate()
        # pipeline parallelism (parallel/pipeline.py): stage devices are
        # owned by the PipelineTrainer; the eval/sampler mesh is stage 0's
        # data row — PP x DP (mesh_data > 1) scales it, pure PP collapses
        # it to stage-0's device
        self._pipeline = None
        if cfg.pipeline_stages > 1:
            from ..parallel import pipeline as pipeline_lib

            self._pipeline = pipeline_lib.PipelineTrainer(cfg)
            self.mesh = mesh_lib.make_mesh(
                devices=list(self._pipeline.stage_meshes[0].devices.flat),
                data=self._pipeline.dp, model=1,
            )
        else:
            self.mesh = mesh_lib.make_mesh(cfg)
        # pod runs: every process computes (collectives must stay aligned),
        # but exactly ONE writes checkpoints/events/config.json
        self._is_coordinator = multihost.is_coordinator()
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(self.rng)
        if self._pipeline is not None:
            self.state = self._pipeline.init_state(init_rng)
        else:
            self.state = mesh_lib.init_sharded_state(cfg, self.mesh, init_rng)
        # resume if a checkpoint exists (new capability vs reference)
        if cfg.checkpoint_dir and ckpt_lib.latest_step(cfg.checkpoint_dir) is not None:
            self.state = ckpt_lib.restore(cfg.checkpoint_dir, self.state)
            if self._pipeline is not None:
                # restored leaves land on the default device; re-place them
                # onto their stage devices (checkpoints are interchangeable
                # between the pipeline and single-device paths)
                self.state = self._pipeline.place_state(self.state)
        self.train_step = (
            self._pipeline.step
            if self._pipeline is not None
            else mesh_lib.make_parallel_train_step(cfg, self.mesh)
        )
        self.eval_fn = mesh_lib.make_parallel_eval_fn(cfg, self.mesh)

        # held-out eval split (FID hygiene, same as GANRunner): when the
        # datasets are built here from the class patterns and FID tracking is
        # on, fid_samples files per class are RESERVED for the metric and
        # never reach the training iterators — a metric computed on training
        # images has train/eval leakage
        self._eval_files = None
        self._fid_reference = None
        if dataset is None:
            files_per_class = None
            if cfg.fid_samples > 0:
                patterns = cfg.class_patterns()
                try:
                    splits = [
                        pipeline.held_out_split(p, cfg.fid_samples, seed=cfg.seed + i)
                        for i, p in enumerate(patterns)
                    ]
                except FileNotFoundError:
                    splits = None  # non-file dataset (make_datasets will raise)
                if splits is not None:
                    files_per_class = [tr for tr, _ in splits]
                    # CLASS-0 eval files only: on conditional models
                    # compute_fid samples class 0 (apply_denoiser's
                    # class_idx=None default), so the reference set must be
                    # pure class 0 — a flattened all-class list would spill
                    # into other classes whenever class 0's glob has fewer
                    # than fid_samples+1 files (silently biased metric)
                    self._eval_files = list(splits[0][1])
            dsets = pipeline.make_datasets(
                cfg, files_per_class=files_per_class,
                sharding=mesh_lib.batch_sharding(self.mesh),
            )
            # class-conditional training gets labeled round-robin batches
            dataset = (
                pipeline.LabeledDataset(dsets) if cfg.num_classes > 0 else dsets[0]
            )
        self.dataset = dataset
        self._restore_data_state()  # resume stream position (sidecar)
        self.data_iter = pipeline.device_iterator(
            self.dataset, mesh_lib.batch_sharding(self.mesh)
        )

        if self._is_coordinator:
            self.log_dir = log_dir or tb.reference_log_dir(cfg.log_dir)
            self.writer = tb.SummaryWriter(self.log_dir)
            with open(os.path.join(self.log_dir, "config.json"), "w") as f:
                f.write(cfg.to_json())  # run metadata artifact
        else:
            self.log_dir = None
            self.writer = tb.NullWriter()

        # eval fixtures (reference train.py:305-311)
        fr = np.random.default_rng(cfg.seed + 1)
        self.noise_bank = jnp.asarray(
            fr.normal(size=(2, cfg.size, cfg.size, 3)), jnp.float32
        )
        self.dictionary = jnp.asarray(
            fr.normal(size=(cfg.size, cfg.size, 2**cfg.bits_per_pixel, 3)),
            jnp.float32,
        )
        if cfg.example_image_path:
            r = np.random.default_rng(0)
            # random crop + flip ON PURPOSE: the reference decodes its eval
            # fixture through the training augmentations (train.py:305
            # load_file -> decode_file(crop=True)), so the logged example
            # is a randomly cropped/flipped view of the file
            img = pipeline.decode_image(cfg.example_image_path, cfg.size, r, crop=True)
            self.example_image = jnp.asarray(img)[None]
        else:
            self.example_image = jnp.asarray(
                fr.uniform(-1, 1, (1, cfg.size, cfg.size, 3)), jnp.float32
            )

    # ------------------------------------------------------------------ eval
    def log_sample(self, epoch: int):
        """Per-epoch eval: preview + inversion + edits + sampling, logged with
        the reference's TensorBoard tags (reference train.py:323-496)."""
        params = (
            self.state.ema_params
            if self.state.ema_params is not None
            else self.state.params
        )
        if self._pipeline is not None:
            # stage-scattered leaves -> replicated over the eval mesh
            params = self._pipeline.gather_params(
                params, mesh_lib.replicated_sharding(self.mesh)
            )
        out = self.eval_fn(
            params, self.example_image, self.noise_bank, self.dictionary
        )
        out = jax.device_get(out)
        self.writer.image("denoised", out["denoised"] * 0.5 + 0.5, epoch)
        self.writer.scalar("example loss", float(out["example_loss"]), epoch)
        for tag in ("step_1", "step_0.25", "step_0.5", "step_0.75"):
            self.writer.image(tag, out[tag] * 0.5 + 0.5, epoch, max_outputs=10)
        self.writer.image("fake", out["fake"] * 0.5 + 0.5, epoch, max_outputs=10)
        if self.cfg.fid_samples > 0:
            scores = self.quality_scores(params)
            if scores is not None:  # degenerate eval set: metric skipped
                self.writer.scalar("fid", scores["fid"], epoch)
                self.writer.scalar("kid", scores["kid"], epoch)
                self._maybe_keep_best(scores["fid"], epoch, "fid")

    def compute_fid(self, params=None):
        """FID of fresh reverse-diffusion samples vs the held-out set
        (BASELINE 'steps-to-fixed-FID'); None when the eval set is
        degenerate (< 2 images — see quality_scores)."""
        scores = self.quality_scores(params)
        return None if scores is None else scores["fid"]

    def quality_scores(self, params=None) -> dict:
        """{"fid", "kid"} of ONE fresh sample batch vs the held-out set.

        FID is the BASELINE-named metric; KID (unbiased MMD², metrics.kid)
        rides along because the FID estimator's finite-sample bias makes
        absolute FID values incomparable across eval-set sizes
        (docs/FID.md)."""
        from ..utils import metrics

        cfg = self.cfg
        n = cfg.fid_samples
        if params is None:
            params = (
                self.state.ema_params
                if self.state.ema_params is not None
                else self.state.params
            )
        if self._pipeline is not None:
            params = self._pipeline.gather_params(
                params, mesh_lib.replicated_sharding(self.mesh)
            )
        ref = self._fid_reference_set(n)
        if n < 2 or len(ref) < 2:
            # FID/KID need >= 2 images per set (metrics.fid_and_kid raises);
            # a degenerate eval set skips the metric instead of aborting
            # training mid-run
            print(f"quality_scores skipped: need >= 2 samples and reference "
                  f"images (fid_samples={n}, reference={len(ref)})")
            return None
        self.rng, sub = jax.random.split(self.rng)
        init = jax.random.normal(sub, (n, cfg.size, cfg.size, 3), jnp.float32)
        samples = np.asarray(self._metric_sample(params, init))
        x = metrics.get_extractor(cfg.fid_extractor)
        if getattr(self, "_ref_features", None) is None:
            # the reference set is fixed (cached) — extract its features once
            self._ref_features = metrics.extract_features(ref, extractor=x)
        return metrics.fid_and_kid(
            samples, ref, extractor=x, features_b=self._ref_features
        )

    def _metric_sample(self, params, init):
        """The T-step sampler for the FID/KID batch, data-parallel over the
        mesh (padded to the data extent, padding sliced back) — the metric
        batch is fid_samples reverse diffusions, the costliest eval work."""
        if getattr(self, "_metric_sampler_fn", None) is None:
            from ..sample import sampler

            cfg = self.cfg
            self._metric_sampler_fn = mesh_lib.make_data_parallel_apply(
                self.mesh,
                lambda p, b: sampler.sample(
                    cfg, p, b, snapshots=False
                ).images,
            )
        return self._metric_sampler_fn(params, init)

    def _fid_reference_set(self, n: int) -> np.ndarray:
        """Fixed comparison set for FID, disjoint from training data.

        Preferred source: the held-out files reserved at construction
        (decoded deterministically, fixed crop stream, no flip). When the
        caller supplied a prebuilt dataset (no file list to split), falls
        back to a fixed set drawn ONCE from the training stream — fixed
        across evals, though disjointness can then not be guaranteed."""
        if self._fid_reference is not None:
            return self._fid_reference
        if self._eval_files:
            # only decode what is used; fewer than n held-out files (or
            # undecodable ones, skipped like training skips them) means a
            # smaller (noisier but unbiased) reference set
            out = pipeline.decode_eval_set(
                self._eval_files[:n], self.cfg.size, seed=0
            )
        else:
            data = []
            while sum(len(d) for d in data) < n:
                # host_fetch: pod-safe for cross-process-sharded batches
                batch = multihost.host_fetch(next(self.data_iter))
                if isinstance(batch, dict):  # labeled batches
                    batch = batch["image"]
                data.append(np.asarray(batch))
            out = np.concatenate(data, 0)[:n]
        self._fid_reference = out
        return out

    # ----------------------------------------------------------------- train
    def fit(
        self,
        epochs: Optional[int] = None,
        steps_per_epoch: Optional[int] = None,
        on_epoch_begin: Optional[Callable[[int], None]] = None,
        log_samples: bool = True,
    ):
        cfg = self.cfg
        # epochs=None means "the configured run budget": after a restore,
        # already-completed work counts against it, so re-running the same
        # command finishes the ORIGINAL budget instead of extending it.
        # Explicit epochs=k stays incremental (the FID/eval harnesses train
        # in small explicit increments). See ResilientRunnerMixin._epoch_plan.
        budget = epochs is None
        epochs = cfg.epochs if epochs is None else epochs
        steps_per_epoch = (
            cfg.steps_per_epoch if steps_per_epoch is None else steps_per_epoch
        )
        start_epoch, origin = self._epoch_plan(epochs, steps_per_epoch, budget)
        step_rng = jax.random.fold_in(self.rng, 17)
        return self._fit_interruptible(
            self._fit_epochs,
            epochs, steps_per_epoch, on_epoch_begin, log_samples, step_rng,
            start_epoch, origin,
        )

    def _fit_epochs(self, epochs, steps_per_epoch, on_epoch_begin, log_samples,
                    step_rng, start_epoch=0, origin=None):
        def step_fn(state, batch, rng):
            state, loss = self.train_step(state, batch, rng)
            return state, {"loss": loss}

        return self._run_epochs(
            epochs=epochs, steps_per_epoch=steps_per_epoch,
            log_samples=log_samples, start_epoch=start_epoch, origin=origin,
            rng=step_rng,
            next_batch=lambda: (next(self.data_iter),),
            step_fn=step_fn,
            summarize=lambda epoch, vals, ips: print(
                f"epoch {epoch}: loss={vals['loss']:.5f} "
                f"{ips:.1f} images/s",
                flush=True,
            ),
            on_epoch_begin=on_epoch_begin,
        )

    def _data_sources(self) -> dict:
        return {"dataset": self.dataset}

    def _data_iterators(self) -> dict:
        return {"dataset": self.data_iter}

    # fit_resilient comes from ResilientRunnerMixin (SURVEY §5: the reference
    # has no recovery at all — a crash loses the run)

    def close(self):
        self._checkpoint_flush()
        self.writer.close()
        if hasattr(self.dataset, "close"):
            self.dataset.close()
