"""Run driver for multi-class conditional transfer (BASELINE config 5).

One dataset per entry of ``Config.classes``; batches are labeled by class
index (data/pipeline.LabeledDataset) and the StarGAN-style step
(train/conditional_gan.py) draws random target classes in-step. Per-epoch
logging writes a transfer grid for every (fixed batch → target class) pair.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import pipeline
from ..parallel import mesh as mesh_lib
from ..parallel import multihost
from ..utils import checkpoint as ckpt_lib
from ..utils import tensorboard as tb
from . import conditional_gan as cgan
from .resilience import ResilientRunnerMixin


class ConditionalGANRunner(ResilientRunnerMixin):
    def __init__(self, cfg: Config, datasets=None, log_dir=None, eval_sets=None):
        """``eval_sets``: optional list of per-class held-out image arrays
        for the FID metric (used when ``datasets`` are passed in directly;
        when built from ``cfg.classes`` patterns, ``cfg.fid_samples`` files
        per class are reserved automatically and never reach training)."""
        cfg.validate()
        # class count comes from explicit datasets when given, else patterns
        n_sources = len(datasets) if datasets is not None else len(cfg.class_patterns())
        if cfg.num_classes == 0:
            cfg = cfg.replace(num_classes=n_sources)
        if cfg.num_classes != n_sources:
            raise ValueError(
                f"num_classes={cfg.num_classes} but {n_sources} class data "
                "sources were provided (labels would gather out of range)"
            )
        if cfg.num_classes < 2:
            raise ValueError("conditional transfer needs >= 2 classes")
        self.cfg = cfg
        self.mesh = mesh_lib.make_mesh(cfg)
        rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.state = mesh_lib.init_sharded_conditional_gan_state(
            cfg, self.mesh, init_rng
        )
        if cfg.checkpoint_dir and ckpt_lib.latest_step(cfg.checkpoint_dir) is not None:
            self.state = ckpt_lib.restore(cfg.checkpoint_dir, self.state)
        self.train_step = mesh_lib.make_parallel_conditional_gan_train_step(
            cfg, self.mesh
        )
        # eval/metric transfers: one jitted forward, data-parallel over the
        # mesh (replaces per-op eager dispatch replicated on every device)
        self._transfer_fn = cgan.make_transfer_fn(cfg, self.mesh)

        self._eval_sets = list(eval_sets) if eval_sets is not None else None
        if datasets is None:
            # reserve fid_samples held-out files per class (FID hygiene)
            files, eval_files = [], []
            for i, p in enumerate(cfg.class_patterns()):
                tr, ev = pipeline.held_out_split(
                    p, cfg.fid_samples, seed=cfg.seed + i
                )
                files.append(tr)
                eval_files.append(ev)
            datasets = pipeline.make_datasets(
                cfg, files_per_class=files,
                sharding=mesh_lib.batch_sharding(self.mesh),
            )
            if self._eval_sets is None and cfg.fid_samples > 0:
                # undecodable reserved files are skipped, like training does
                self._eval_sets = [
                    pipeline.decode_eval_set(ev, cfg.size, seed=0)
                    if ev else None
                    for ev in eval_files
                ]
        self.labeled = pipeline.LabeledDataset(datasets)
        self._restore_data_state()  # resume stream position (sidecar)
        self.data_iter = pipeline.device_iterator(
            self.labeled, mesh_lib.batch_sharding(self.mesh)
        )
        if multihost.is_coordinator():
            self.log_dir = log_dir or tb.reference_log_dir(cfg.log_dir)
            self.writer = tb.SummaryWriter(self.log_dir)
        else:  # pod: compute everywhere, write on the coordinator only
            self.log_dir = None
            self.writer = tb.NullWriter()
        self._fixed = None

    def log_sample(self, epoch: int):
        if self._fixed is None:
            # pod-safe fetch: the data iterator yields cross-process-sharded
            # batches on multi-host runs (collective; aligned on all hosts)
            self._fixed = multihost.host_fetch(next(self.data_iter))["image"]
        for target in range(self.cfg.num_classes):
            out = self._transfer(self._fixed, target)
            self.writer.image(
                f"transfer_to_{target}", np.asarray(out) * 0.5 + 0.5, epoch, 10
            )
        if self.cfg.fid_samples > 0 and self._eval_sets:
            fids = []
            for src in range(self.cfg.num_classes):
                for tgt in range(self.cfg.num_classes):
                    if src == tgt:
                        continue
                    scores = self.transfer_scores(src, tgt)
                    if scores is not None:
                        self.writer.scalar(
                            f"transfer_fid_{src}_to_{tgt}", scores["fid"], epoch
                        )
                        self.writer.scalar(
                            f"transfer_kid_{src}_to_{tgt}", scores["kid"], epoch
                        )
                        fids.append(scores["fid"])
            if fids:
                # mean over the class-pair grid (BASELINE_MEASURED r5:
                # the per-pair FIDs oscillate out of phase late in
                # training — the mean tracks the whole-model optimum)
                self._maybe_keep_best(
                    sum(fids) / len(fids), epoch, "transfer_fid_mean"
                )

    def transfer_fid(self, src: int, tgt: int):
        """FID of held-out class-``src`` images transferred to class ``tgt``
        against the held-out ``tgt`` set (None when eval sets are missing).
        Same hygiene as GANRunner.transfer_fid: eval images never feed the
        training iterators."""
        scores = self.transfer_scores(src, tgt)
        return None if scores is None else scores["fid"]

    def transfer_scores(self, src: int, tgt: int):
        """{"fid", "kid"} for one (src → tgt) transfer of the held-out
        sets, or None when eval sets are missing (KID = unbiased MMD²,
        comparable across eval-set sizes — docs/FID.md)."""
        from ..utils import metrics

        if not self._eval_sets:
            return None
        src_imgs = self._eval_sets[src]
        tgt_imgs = self._eval_sets[tgt]
        if src_imgs is None or tgt_imgs is None:
            return None
        if len(src_imgs) < 2 or len(tgt_imgs) < 2:
            # metrics.fid_and_kid needs >= 2 images per set; a 2-file class
            # must skip its pairs, not abort training
            return None
        fake = np.asarray(self._transfer(src_imgs, tgt))
        x = metrics.get_extractor(self.cfg.fid_extractor)
        if not hasattr(self, "_eval_feat_cache"):
            self._eval_feat_cache = {}
        if tgt not in self._eval_feat_cache:
            # the per-class eval sets are fixed: extract each ONCE (the
            # per-epoch logger scores C*(C-1) pairs every epoch)
            self._eval_feat_cache[tgt] = metrics.extract_features(
                np.asarray(tgt_imgs), extractor=x
            )
        return metrics.fid_and_kid(
            fake, np.asarray(tgt_imgs), extractor=x,
            features_b=self._eval_feat_cache[tgt],
        )

    def _transfer(self, images, target: int):
        """Mesh-parallel transfer with the runner's (EMA-preferring) params —
        value-identical to ``cgan.transfer`` on the same weights."""
        images = jnp.asarray(images)
        tvec = jnp.full((images.shape[0],), target, jnp.int32)
        return self._transfer_fn(cgan.select_generator(self.state), images, tvec)

    def _data_sources(self) -> dict:
        return {"labeled": self.labeled}

    def _data_iterators(self) -> dict:
        return {"labeled": self.data_iter}

    def fit(self, epochs: Optional[int] = None, steps_per_epoch: Optional[int] = None,
            log_samples: bool = True):
        cfg = self.cfg
        # epochs=None = the configured run budget: completed epochs from a
        # restored checkpoint count against it (see train/loop.Runner.fit)
        budget = epochs is None
        epochs = cfg.epochs if epochs is None else epochs
        steps_per_epoch = cfg.steps_per_epoch if steps_per_epoch is None else steps_per_epoch
        start_epoch, origin = self._epoch_plan(epochs, steps_per_epoch, budget)
        return self._fit_interruptible(
            self._fit_epochs, epochs, steps_per_epoch, log_samples,
            start_epoch, origin,
        )

    def _fit_epochs(self, epochs, steps_per_epoch, log_samples, start_epoch=0,
                    origin=None):
        return self._run_epochs(
            epochs=epochs, steps_per_epoch=steps_per_epoch,
            log_samples=log_samples, start_epoch=start_epoch, origin=origin,
            rng=jax.random.fold_in(self.rng, 31),
            next_batch=lambda: (next(self.data_iter),),
            step_fn=self.train_step,
            summarize=lambda epoch, vals, ips: print(
                f"epoch {epoch}: g={vals['g_loss']:.4f} d={vals['d_loss']:.4f} "
                f"cycle={vals['cycle']:.4f} {ips:.1f} img/s",
                flush=True,
            ),
        )

    def close(self):
        self._checkpoint_flush()
        self.writer.close()
        self.labeled.close()
