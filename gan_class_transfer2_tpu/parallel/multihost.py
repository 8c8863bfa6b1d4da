"""Multi-host (multi-process) support.

Single-slice multi-chip needs nothing beyond `parallel/mesh.py` (one process
sees all chips). On multi-host TPU pods each process owns a subset of chips;
this module wraps the standard JAX recipe:

  * ``initialize()`` — `jax.distributed.initialize` (no-op when single-host
    or already initialised)
  * ``global_batch_from_host_local(...)`` — each host loads only its shard of
    the global batch; `jax.make_array_from_process_local_data` assembles the
    logically-global array without any cross-host data movement (gradients
    still all-reduce over ICI/DCN via the mesh shardings).

There is exactly one process in this build environment, so the multi-host
paths are exercised only in their degenerate form; the API mirrors the
standard pattern so pod runs need no code changes.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None, **kw) -> int:
    """Initialise the JAX distributed runtime when running multi-process.

    MUST be the first JAX call in the process: touching any backend API
    (even ``jax.process_count()``) initialises the local backend, after which
    ``jax.distributed.initialize`` raises. Errors propagate — a silently
    failed init would leave every host training as an independent
    single-host job. Returns the process index; single-host (no coordinator
    address) returns 0 without touching the distributed runtime."""
    if coordinator_address is not None:
        if jax.distributed.is_initialized():
            # honour the documented no-op contract when two setup paths
            # compose (jax.distributed.initialize raises on re-init)
            return jax.process_index()
        jax.distributed.initialize(coordinator_address=coordinator_address, **kw)
    return jax.process_index()


def host_local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n


def global_batch_from_host_local(local_batch, sharding):
    """Assemble a logically-global batch from this host's local shard.

    ``local_batch``: numpy array (or pytree of arrays, e.g. the labeled
    ``{"image", "label"}`` batches) of leading dim global_batch /
    process_count; ``sharding``: the global NamedSharding (e.g. mesh
    batch_sharding — a P('data') spec applies to every leaf's leading
    axis)."""
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch,
    )


def is_cross_process_sharded(leaf) -> bool:
    """True when a leaf's value spans processes (e.g. ZeRO-1 moments or a
    P('data') batch on a pod): fetching it needs ``process_allgather`` (a
    collective) rather than ``device_get``. The ONE definition of this
    test — host_fetch, checkpoint.restore and the resilience save gates all
    route on it (three hand-copies before review r4)."""
    return (
        isinstance(leaf, jax.Array)
        and not leaf.is_fully_addressable
        and not leaf.is_fully_replicated
    )


def any_cross_process_sharded(tree) -> bool:
    return any(
        is_cross_process_sharded(l) for l in jax.tree_util.tree_leaves(tree)
    )


def host_fetch(tree):
    """Host (numpy) copy of a pytree whose leaves may be sharded across
    processes.

    Plain ``device_get`` raises on a jax.Array that spans non-addressable
    devices (e.g. a P('data') batch on a pod), so such leaves go through
    ``process_allgather(tiled=True)`` instead — a COLLECTIVE, so on pods
    this must be called from every process at an aligned point (the
    runners' eval paths are; they compute everywhere and gate only the
    writes on is_coordinator)."""
    def one(leaf):
        if is_cross_process_sharded(leaf):
            from jax.experimental import multihost_utils

            # tiled=True preserves the global shape (no stacked axis) and
            # returns the full value on every process
            return multihost_utils.process_allgather(leaf, tiled=True)
        return jax.device_get(leaf)

    return jax.tree_util.tree_map(one, tree)


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs.

    Every runner gates its file outputs (checkpoints, TensorBoard events,
    config.json) on this — on a pod exactly one process writes, the rest
    compute. Checkpoint RESTORE still happens on every process (shared
    filesystem assumed, the standard pod setup). ZeRO-1 sharded optimizer
    state checkpoints too: ``checkpoint.host_complete`` all-gathers the
    cross-process shards on every process (collective, ordered before this
    gate — see resilience._checkpoint_now) and restore re-places shards via
    ``make_array_from_callback``."""
    return jax.process_index() == 0


def shard_files_for_host(files: list) -> list:
    """This host's share of a file list (round-robin by process index) —
    per-host input sharding so each process decodes only 1/N of the data
    (SURVEY §2.3 DP row: 'per-host input sharding')."""
    n = jax.process_count()
    if n == 1:
        return files
    shard = files[jax.process_index()::n]
    if not shard:
        raise ValueError(
            f"host {jax.process_index()}/{n} got no files "
            f"(dataset has only {len(files)})"
        )
    return shard
