"""Checkpoint / resume.

The reference has **no checkpointing at all** (SURVEY §5 — a crash loses the
run). This is a required new capability per BASELINE.json ("checkpoint
format" is public surface). Format: orbax PyTree checkpoints under
``<dir>/step_<N>`` plus the config JSON, so a run is resumable from the
directory alone.
"""

from __future__ import annotations

import glob as globlib
import json
import os
import re
import shutil
from typing import Optional, Tuple

import jax

from ..config import Config


# Stamped into the checkpoint config.json so future readers can detect and
# migrate old layouts (step_<N> orbax dirs + .extra.json sidecars = v1).
# Unknown keys are ignored by Config.from_json, so the stamp is
# forward-compatible with configs saved before it existed.
CHECKPOINT_FORMAT_VERSION = 1


def _checkpointer():
    import jax as _jax
    import orbax.checkpoint as ocp

    if _jax.process_count() > 1:
        # pod runs: only the coordinator calls save/restore (the state it
        # writes is replicated numpy after device_get), so orbax's internal
        # cross-host barriers must span ONLY process 0 — with the default
        # options its sync_global_devices would deadlock waiting for the
        # processes that (correctly) skipped the write.
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                # singleton per-host group: saves are coordinator-only and
                # restores are independent per-host reads of the shared dir
                primary_host=_jax.process_index(),
                active_processes={_jax.process_index()},
                barrier_sync_key_prefix=f"gct2host{_jax.process_index()}",
            ),
        )
    return ocp.PyTreeCheckpointer()


def host_complete(state):
    """A host-complete (numpy) copy of a state tree.

    Single-process (and replicated pod leaves): plain ``device_get``.
    Pod leaves that are SHARDED across processes (ZeRO-1 optimizer
    moments): ``process_allgather`` — a COLLECTIVE, so on pods this must
    run on EVERY process, before any coordinator-only gating (see
    resilience._checkpoint_now). The per-leaf routing lives in
    multihost.host_fetch."""
    from ..parallel import multihost

    return multihost.host_fetch(state)


def _host_template(like):
    """Structure template for orbax restore: shape/dtype placeholders only.
    Values are overwritten by the restore, so device arrays map to
    ``np.zeros`` — never ``device_get`` (which would synchronously pull the
    full live state to host just to be discarded, ~0.7 GB at the flagship,
    and raises outright on cross-process-sharded ZeRO-1 leaves)."""
    import numpy as _np

    import jax as _jax

    def one(leaf):
        if isinstance(leaf, _jax.Array) or hasattr(leaf, "shape"):
            return _np.zeros(leaf.shape, leaf.dtype)
        return leaf  # python scalars/None keep their structure role

    return _jax.tree_util.tree_map(one, like)


def save(ckpt_dir: str, state, cfg: Config, step: Optional[int] = None,
         extra: Optional[dict] = None):
    """Save TrainState (+ config) at ``<ckpt_dir>/step_<N>``.

    Crash-safe: writes to ``step_<N>.tmp`` and renames into place (atomic on
    POSIX), so a ``step_<N>`` directory that exists is always a complete
    checkpoint; a crash mid-save leaves only a ``.tmp`` directory, which
    ``latest_step``'s pattern never matches and the next save sweeps away.

    ``extra``: JSON-serialisable sidecar (e.g. data-iterator position) stored
    inside the step directory; read back with ``load_extra``.

    Pod note: with cross-process-sharded leaves (ZeRO-1), call
    ``host_complete(state)`` on EVERY process first and pass the result in
    (it is a collective; calling save() with sharded state on the
    coordinator alone would deadlock). resilience._checkpoint_now does
    this ordering.

    ``cfg.checkpoint_keep > 0`` prunes all but the newest N step dirs after
    a successful save (retention policy for long runs — a 10⁶-step
    reference-length run at checkpoint_every=1000 would otherwise
    accumulate a thousand full states).
    """
    step = int(state.step) if step is None else int(step)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:09d}")
    if os.path.exists(path):
        # same step already persisted (e.g. interrupt right after a periodic
        # save) — committed dirs are complete by construction, skip the
        # write but still honour retention (keep may have been lowered).
        # The CURRENT step is protected: it may be older than the newest
        # `keep` dirs (resume from an explicit step) and the caller is told
        # it is persisted.
        keep = getattr(cfg, "checkpoint_keep", 0)
        if keep > 0:
            prune(ckpt_dir, keep, protect=step)
        return path
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # stale partial write from a crashed save
    _checkpointer().save(tmp, host_complete(state))
    os.rename(tmp, path)
    if extra is not None:
        # sibling sidecar (not inside the orbax dir, whose layout is orbax's);
        # written post-commit — a crash here costs only the data position
        tmp_extra = path + ".extra.json.tmp"
        with open(tmp_extra, "w") as f:
            json.dump(extra, f)
        os.rename(tmp_extra, path + ".extra.json")
    meta = json.loads(cfg.to_json())
    meta["checkpoint_format_version"] = CHECKPOINT_FORMAT_VERSION
    # atomic like every other artifact here: resume reads this file
    # (cli.load_config), so a crash mid-dump must not truncate it
    cfg_path = os.path.join(ckpt_dir, "config.json")
    with open(cfg_path + ".tmp", "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    os.rename(cfg_path + ".tmp", cfg_path)
    keep = getattr(cfg, "checkpoint_keep", 0)
    if keep > 0:
        # protect the step JUST written: after resuming from an explicitly
        # older step it ranks below the newest `keep` dirs, and pruning it
        # here would delete the checkpoint this call reports as persisted
        prune(ckpt_dir, keep, protect=step)
    return path


class AsyncSaver:
    """Single-worker background checkpoint writer (``Config.checkpoint_async``).

    The device→host fetch (``host_complete``) must stay on the caller: with
    donated state buffers the old device arrays are invalid the moment the
    next step is dispatched, so the fetch cannot be deferred. Everything
    after it can overlap training — orbax serialisation, the atomic rename,
    sidecars, retention — and runs here on ONE worker thread, so saves
    commit in submission order and retention never races a write.

    A failed background save is re-raised on the next ``submit()``/``wait()``
    — a checkpoint silently not written would defeat the resilience path
    that trusts it. Callers must ``wait()`` before reading the directory
    (restore, latest_step) and before process exit; the runners do this at
    the end of ``fit`` and in ``fit_resilient``'s restore path.

    Backpressure: each queued save pins a full host-state copy (~0.7 GB at
    the 41.7 M-param flagship with Adam moments + EMA), so ``submit`` blocks
    until the backlog is below ``max_pending`` — a disk slower than the
    checkpoint cadence degrades to synchronous saves instead of accumulating
    state copies until the host OOMs.
    """

    def __init__(self, max_pending: int = 2):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="gct2-ckpt"
        )
        self._pending: list = []
        self._max_pending = max(1, max_pending)

    def _reap(self, block: bool = False) -> None:
        err = None
        still = []
        for f in self._pending:
            if block or f.done():
                exc = f.exception()  # blocks when not yet done
                if exc is not None and err is None:
                    err = exc
            else:
                still.append(f)
        self._pending = still
        if err is not None:
            raise RuntimeError("async checkpoint save failed") from err

    def submit(self, ckpt_dir: str, host_state, cfg: Config,
               step: Optional[int] = None, extra: Optional[dict] = None) -> str:
        """Queue a save of an already host-complete state; returns the step
        path the save will commit to. Blocks while ``max_pending`` saves are
        already queued (oldest-first), bounding host memory."""
        self._reap()
        while len(self._pending) >= self._max_pending:
            f = self._pending.pop(0)
            exc = f.exception()  # blocks until the oldest save finishes
            if exc is not None:
                raise RuntimeError("async checkpoint save failed") from exc
        n = int(host_state.step) if step is None else int(step)
        self._pending.append(
            self._pool.submit(save, ckpt_dir, host_state, cfg, n, extra)
        )
        return os.path.join(os.path.abspath(ckpt_dir), f"step_{n:09d}")

    def wait(self) -> None:
        """Drain the queue; re-raise the first background failure."""
        self._reap(block=True)

    def close(self) -> None:
        self.wait()
        self._pool.shutdown()


def _extra_path(ckpt_dir: str, step: int, host: Optional[int] = None) -> str:
    suffix = ".extra.json" if host is None else f".extra.host{host}.json"
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{step:09d}{suffix}")


def save_host_extra(ckpt_dir: str, step: int, extra: dict) -> str:
    """Per-process data-position sidecar for pod runs.

    The main ``.extra.json`` is coordinator-authored, so on a pod it records
    only process 0's stream positions; the per-host streams are aligned
    counters over DIFFERENT file shards (make_datasets round-robins files by
    process), so the coordinator's counters are normally valid everywhere —
    but only as a derivation. This persists each host's own positions
    directly: every process writes exactly its own
    ``step_<N>.extra.host<k>.json`` (no cross-host write races), and
    ``load_extra(host=k)`` prefers it on restore."""
    import jax as _jax

    os.makedirs(ckpt_dir, exist_ok=True)
    path = _extra_path(ckpt_dir, int(step), _jax.process_index())
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(extra, f)
    os.rename(tmp, path)
    return path


def all_steps(ckpt_dir: str) -> list:
    if not os.path.isdir(ckpt_dir):
        return []
    return sorted(
        int(m.group(1))
        for name in os.listdir(ckpt_dir)
        if (m := re.fullmatch(r"step_(\d+)", name))
    )


def prune(ckpt_dir: str, keep: int, protect: Optional[int] = None) -> int:
    """Delete all but the newest ``keep`` step dirs (+ their sidecars);
    returns the number removed. ``protect`` names a step exempt from
    DELETION (the step a save() call just vouched for) — it still counts
    toward the retention total, so at most ``keep`` dirs remain (keep+1
    only when the protected step is older than the newest ``keep``).
    Newest-first retention — committed dirs are always complete (see save),
    so order is safe."""
    steps = all_steps(ckpt_dir)
    removed = 0
    for s in steps[:-keep] if keep > 0 else []:
        if s == protect:
            continue
        path = os.path.join(os.path.abspath(ckpt_dir), f"step_{s:09d}")
        shutil.rmtree(path, ignore_errors=True)
        # the coordinator sidecar plus any per-host sidecars (pod runs),
        # and crashed-write .tmp leftovers of either
        for pat in (".extra*.json", ".extra*.json.tmp"):
            for extra in globlib.glob(globlib.escape(path) + pat):
                os.remove(extra)
        removed += 1
    # orphan sidecars: host sidecars are written BEFORE the coordinator's
    # save commits the step dir (resilience._checkpoint_now), so a crashed
    # save leaves step_<N>.extra.host<k>.json with no step_<N> dir. Sweep
    # them — but only for steps strictly older than the newest committed
    # dir: a sidecar newer than that may belong to a save in flight.
    if steps:
        have = set(steps)
        root = globlib.escape(os.path.abspath(ckpt_dir))
        # *.json.tmp too: a crash between a sidecar's tmp write and its
        # rename leaks the .tmp forever otherwise (review r4). A .tmp is
        # garbage even when its step dir is committed (the rename never
        # happened and nothing will retry it), so it only needs the
        # older-than-newest guard against a save in flight.
        for pattern, need_orphan in (
            ("step_*.extra*.json", True),
            ("step_*.extra*.json.tmp", False),
        ):
            for extra in globlib.glob(os.path.join(root, pattern)):
                m = re.match(r"step_(\d+)\.extra", os.path.basename(extra))
                if (m and int(m.group(1)) < steps[-1]
                        and (not need_orphan or int(m.group(1)) not in have)):
                    os.remove(extra)
    return removed


def save_best(ckpt_dir: str, state, cfg: Config, *, metric: str,
              value: float, epoch: int) -> str:
    """Persist ``state`` as the run's best checkpoint so far under
    ``<ckpt_dir>/best`` (Config.keep_best).

    ``best/`` is a normal self-contained checkpoint directory (one
    ``step_<N>`` + ``config.json`` + ``best.json``), so every existing
    consumer works by pointing at it — ``gct2 sample/serve/eval
    --checkpoint-dir ckpt/best``. Crash-safe by construction: the inner
    save() is atomic, ``best.json`` is tmp+rename, and retention runs
    last — a crash between them leaves an extra older step dir whose
    newest entry is still the best state.
    """
    best_dir = os.path.join(ckpt_dir, "best")
    path = save(best_dir, state, cfg)
    record = {
        "metric": metric,
        "value": float(value),
        "step": int(state.step),
        "epoch": int(epoch),
        # values are only comparable under the same feature extractor —
        # a restarted run checks this before trusting the recorded value
        "fid_extractor": getattr(cfg, "fid_extractor", None),
    }
    rec_path = os.path.join(best_dir, "best.json")
    with open(rec_path + ".tmp", "w") as f:
        json.dump(record, f)
    os.rename(rec_path + ".tmp", rec_path)
    prune(best_dir, keep=1, protect=int(state.step))
    return path


def read_best(ckpt_dir: str) -> Optional[dict]:
    """The best.json record written by save_best (None when absent) —
    lets a restarted run continue the best-metric tracker instead of
    overwriting a better earlier checkpoint with its first eval."""
    path = os.path.join(ckpt_dir, "best", "best.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def load_extra(ckpt_dir: str, step: Optional[int] = None,
               host: Optional[int] = None) -> Optional[dict]:
    """Read the JSON sidecar saved alongside ``step_<N>`` (None if absent).

    ``host``: prefer that process's per-host sidecar (save_host_extra),
    falling back to the coordinator-authored ``.extra.json`` — valid as a
    fallback because the per-host streams advance in lockstep."""
    step = latest_step(ckpt_dir) if step is None else step
    if step is None:
        return None
    candidates = (
        [_extra_path(ckpt_dir, step, host)] if host is not None else []
    ) + [_extra_path(ckpt_dir, step)]
    for path in candidates:
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
    return None


def latest_step(ckpt_dir: str) -> Optional[int]:
    steps = all_steps(ckpt_dir)
    return max(steps) if steps else None


def restore(ckpt_dir: str, like, step: Optional[int] = None):
    """Restore a TrainState. ``like`` is a template state (same treedef) —
    e.g. from ``trainer.init_state`` or ``jax.eval_shape`` thereof.

    Pod + ZeRO-1: cross-process-sharded ``like`` leaves are re-placed onto
    their shardings via ``make_array_from_callback`` (each process reads
    the full value from the shared checkpoint dir and provides its local
    shards — no collectives). Other leaves are returned as restored
    (host) values, exactly as before."""
    import numpy as _np

    step = latest_step(ckpt_dir) if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:09d}")
    restored = _checkpointer().restore(path, item=_host_template(like))

    def place(l, r):
        from ..parallel import multihost

        if multihost.is_cross_process_sharded(l):
            full = _np.asarray(r)
            return jax.make_array_from_callback(
                l.shape, l.sharding, lambda idx: full[idx]
            )
        return r

    return jax.tree_util.tree_map(place, like, restored)


def load_config(ckpt_dir: str) -> Config:
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        return Config.from_json(f.read())
