"""GAN-mode run driver: two class datasets (A, B), cycle-transfer training,
TensorBoard logging of transferred samples, checkpoint/resume.

Counterpart of train/loop.Runner for the GAN configs in BASELINE.json.
Requires ``Config.classes`` to name exactly two glob patterns (the reference's
``classes`` scaffolding, train.py:299-301, finally put to work).
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
from . import gan
from .resilience import ResilientRunnerMixin


class GANRunner(ResilientRunnerMixin):
    def __init__(self, cfg: Config, dataset_a=None, dataset_b=None, log_dir=None,
                 eval_a=None, eval_b=None):
        """``eval_a``/``eval_b``: optional explicit held-out eval image arrays
        (N, size, size, 3) for the FID metric — use when datasets are passed
        in directly and the file-split reservation below cannot apply."""
        cfg.validate()
        if dataset_a is None or dataset_b is None:
            patterns = cfg.class_patterns()
            if len(patterns) != 2:
                raise ValueError(
                    "GAN class transfer needs exactly 2 class patterns "
                    f"(got {len(patterns)}); set Config.classes"
                )
        self.cfg = cfg
        self.mesh = mesh_lib.make_mesh(cfg)
        rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.state = mesh_lib.init_sharded_gan_state(cfg, self.mesh, init_rng)
        if cfg.checkpoint_dir and ckpt_lib.latest_step(cfg.checkpoint_dir) is not None:
            self.state = ckpt_lib.restore(cfg.checkpoint_dir, self.state)
        self.train_step = mesh_lib.make_parallel_gan_train_step(cfg, self.mesh)
        # eval/metric transfers: one jitted forward, data-parallel over the
        # mesh (replaces per-op eager dispatch replicated on every device)
        self._transfer_fn = gan.make_transfer_fn(cfg, self.mesh)

        # held-out eval split: when datasets are built here from the class
        # patterns, fid_samples files per class are RESERVED for the FID
        # metric and never reach the training iterators (train/eval leakage
        # otherwise — the metric must score generalisation, not memorisation)
        self._eval_files = {"a": None, "b": None}
        if dataset_a is None or dataset_b is None:
            patterns = cfg.class_patterns()
            files, eval_files = [], []
            for i, p in enumerate(patterns):
                tr, ev = pipeline.held_out_split(
                    p, cfg.fid_samples, seed=cfg.seed + i
                )
                files.append(tr)
                eval_files.append(ev)
            built = pipeline.make_datasets(
                cfg, files_per_class=files,
                sharding=mesh_lib.batch_sharding(self.mesh),
            )
            dataset_a = dataset_a if dataset_a is not None else built[0]
            dataset_b = dataset_b if dataset_b is not None else built[1]
            self._eval_files = {"a": eval_files[0], "b": eval_files[1]}
        self.dataset_a = dataset_a
        self.dataset_b = dataset_b
        self._restore_data_state()  # resume stream position (sidecar)
        sharding = mesh_lib.batch_sharding(self.mesh)
        self.iter_a = pipeline.device_iterator(self.dataset_a, sharding)
        self.iter_b = pipeline.device_iterator(self.dataset_b, sharding)

        if multihost.is_coordinator():
            self.log_dir = log_dir or tb.reference_log_dir(cfg.log_dir)
            self.writer = tb.SummaryWriter(self.log_dir)
        else:  # pod: compute everywhere, write on the coordinator only
            self.log_dir = None
            self.writer = tb.NullWriter()
        self._fixed_a = None
        self._fixed_b = None
        self._eval_cache = {}
        if eval_a is not None:
            self._eval_cache["a"] = np.asarray(eval_a, np.float32)
        if eval_b is not None:
            self._eval_cache["b"] = np.asarray(eval_b, np.float32)

    def _data_sources(self) -> dict:
        return {"a": self.dataset_a, "b": self.dataset_b}

    def _data_iterators(self) -> dict:
        return {"a": self.iter_a, "b": self.iter_b}

    def log_sample(self, epoch: int):
        if self._fixed_a is None:
            # host_fetch: on a pod the iterator yields cross-process-sharded
            # global batches; device_get/np.asarray of those raises. Every
            # process runs this (aligned collective), only the coordinator's
            # writer persists the images.
            self._fixed_a = multihost.host_fetch(next(self.iter_a))
            self._fixed_b = multihost.host_fetch(next(self.iter_b))
        fake_b = self._transfer(self._fixed_a, "ab")
        fake_a = self._transfer(self._fixed_b, "ba")
        cycled = self._transfer(fake_b, "ba")
        self.writer.image("transfer_ab", np.asarray(fake_b) * 0.5 + 0.5, epoch, 10)
        self.writer.image("transfer_ba", np.asarray(fake_a) * 0.5 + 0.5, epoch, 10)
        self.writer.image("cycle_aba", np.asarray(cycled) * 0.5 + 0.5, epoch, 10)
        if self.cfg.fid_samples > 0:
            fids = []
            for d in ("ab", "ba"):
                scores = self.transfer_scores(d)
                if scores is None:  # degenerate eval set: metric skipped
                    continue
                self.writer.scalar(f"transfer_fid_{d}", scores["fid"], epoch)
                self.writer.scalar(f"transfer_kid_{d}", scores["kid"], epoch)
                fids.append(scores["fid"])
            if fids:
                # per-pair FID is non-monotone late in cycle-GAN training
                # (phase oscillation, BASELINE_MEASURED r5) — keep_best
                # tracks the mean over directions
                self._maybe_keep_best(
                    sum(fids) / len(fids), epoch, "transfer_fid_mean"
                )

    def _eval_set(self, cls: str) -> np.ndarray:
        """Fixed per-class eval images, disjoint from training data.

        Preferred source: the held-out file split reserved at construction
        (decoded deterministically, center-of-stream crop, no flip). When the
        caller supplied prebuilt datasets (no file list to split), falls back
        to a fixed set drawn ONCE from a dedicated iterator — fixed across
        evals, though disjointness can then not be guaranteed."""
        if cls in self._eval_cache:
            return self._eval_cache[cls]
        files = self._eval_files[cls]
        n = max(self.cfg.fid_samples, self.cfg.batch_size)
        if files:
            # undecodable reserved files are skipped, like training does
            out = pipeline.decode_eval_set(files, self.cfg.size, seed=0)
        else:
            ds = self.dataset_a if cls == "a" else self.dataset_b
            it = iter(ds)
            chunks = []
            while sum(len(x) for x in chunks) < n:
                chunks.append(np.asarray(jax.device_get(next(it))))
            out = np.concatenate(chunks, 0)[:n]
        self._eval_cache[cls] = out
        return out

    def transfer_fid(self, direction: str = "ab"):
        """FID of transferred HELD-OUT images against the target class's
        held-out set — BASELINE.json's "steps-to-fixed-FID on class-transfer
        pairs" metric. The eval sets never feed the training iterators
        (see _eval_set). None when an eval set is degenerate."""
        scores = self.transfer_scores(direction)
        return None if scores is None else scores["fid"]

    def transfer_scores(self, direction: str = "ab"):
        """{"fid", "kid"} of ONE transferred held-out batch vs the target
        class's held-out set (KID = unbiased MMD², comparable across
        eval-set sizes — docs/FID.md); None when either eval set has < 2
        images (metrics.fid_and_kid raises below that — a 2-file class or
        fid_samples=1 must skip the metric, not abort training)."""
        from ..utils import metrics

        src = self._eval_set("a" if direction == "ab" else "b")
        tgt = self._eval_set("b" if direction == "ab" else "a")
        if len(src) < 2 or len(tgt) < 2:
            print(f"transfer_scores({direction}) skipped: need >= 2 images "
                  f"per eval set (src={len(src)}, tgt={len(tgt)})")
            return None
        fake = np.asarray(self._transfer(jnp.asarray(src), direction))
        x = metrics.get_extractor(self.cfg.fid_extractor)
        tgt_cls = "b" if direction == "ab" else "a"
        feats = self._eval_features(tgt_cls, tgt, x)
        return metrics.fid_and_kid(fake, tgt, extractor=x, features_b=feats)

    def _eval_features(self, cls: str, images, extractor):
        """Cached extractor features of a FIXED per-class eval set — the
        per-epoch logger re-scores both directions every epoch, and
        re-extracting the unchanged target set dominated eval cost at
        large fid_samples."""
        from ..utils import metrics

        if not hasattr(self, "_eval_feat_cache"):
            self._eval_feat_cache = {}
        if cls not in self._eval_feat_cache:
            self._eval_feat_cache[cls] = metrics.extract_features(
                images, extractor=extractor
            )
        return self._eval_feat_cache[cls]

    def _transfer(self, images, direction: str):
        """Mesh-parallel transfer with the runner's (EMA-preferring) params —
        value-identical to ``gan.transfer`` on the same weights."""
        return self._transfer_fn(
            gan.select_generator(self.state, direction), jnp.asarray(images)
        )

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
            rng=jax.random.fold_in(self.rng, 23),
            next_batch=lambda: (next(self.iter_a), next(self.iter_b)),
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
        for ds in (self.dataset_a, self.dataset_b):
            if hasattr(ds, "close"):
                ds.close()
