"""Disk dataset cache: decode once (native C++), stream forever (memmap).

The reference re-decodes every image on every epoch (tf.data map over
read_file, train.py:313-321; the one-line `.cache()` is commented out at
train.py:317). For TPU-rate training the decode is pure host overhead, so
this module adds a production decode-once path:

  1. ``native_loader.build_cache(files, store, path)`` — C++ builder:
     decode → bilinear shortest-side resize to ``store`` → center crop →
     packed uint8 records (also exposed as ``cli.py build-cache``).
  2. ``CachedDataset`` — zero-copy ``np.memmap`` reader with
     shuffle-without-replacement epochs (pipeline.EpochIndexStream) and
     checkpointable position, yielding raw uint8 batches.
  3. ``AugmentedCachedDataset`` — the two-dispatch device pipeline: raw
     uint8 batches ship to the device (4× smaller than fp32) and the
     random-crop/flip/normalize runs as a jitted VPU program
     (data/device_augment.augment_batch) — the input path measured at 88%
     of the compute-bound training peak (BASELINE_MEASURED.md).

Note the semantics difference vs the live loaders: caching stores a single
``store``-sized center view per image, so the training crop window is
restricted to that view (the live loaders crop the full original image).
Pick ``store`` > ``size`` to retain crop augmentation range.
"""

from __future__ import annotations

import numpy as np

_MAGIC = 0x47435432
_HEADER_BYTES = 16  # 4 x uint32: magic, version, count, store


def read_cache(path: str):
    """(memmap view (N, store, store, 3) uint8, store). Zero-copy."""
    header = np.fromfile(path, dtype=np.uint32, count=4)
    if len(header) != 4 or header[0] != _MAGIC:
        raise ValueError(f"{path!r} is not a GCT2 dataset cache")
    if header[1] != 1:
        raise ValueError(f"unsupported cache version {header[1]}")
    n, store = int(header[2]), int(header[3])
    data = np.memmap(
        path, dtype=np.uint8, mode="r", offset=_HEADER_BYTES,
        shape=(n, store, store, 3),
    )
    return data, store


class CachedDataset:
    """Raw uint8 batches (B, store, store, 3) out of a cache file, epoch-
    exact shuffle, restorable position (state_dict/set_state)."""

    def __init__(self, path: str, batch_size: int, seed: int = 0):
        from .pipeline import EpochIndexStream

        self.images, self.store = read_cache(path)
        self.batch_size = batch_size
        self._stream = EpochIndexStream(len(self.images), batch_size, seed)

    def __len__(self):
        return len(self.images)

    def __iter__(self):
        while True:
            idx = self._stream.next_indices()
            yield np.asarray(self.images[idx])  # copy out of the memmap

    def state_dict(self) -> dict:
        return self._stream.state_dict()

    def set_state(self, state: dict) -> None:
        self._stream.set_state(state)

    def close(self):
        pass


class AugmentedCachedDataset(CachedDataset):
    """CachedDataset + on-device random-crop/flip/normalize to ``size``:
    yields float32 (B, size, size, 3) device arrays via one extra jitted
    dispatch per batch (the measured-fastest input arrangement)."""

    def __init__(self, path: str, size: int, batch_size: int, seed: int = 0,
                 sharding=None):
        super().__init__(path, batch_size, seed)
        if self.store < size:
            raise ValueError(
                f"cache store={self.store} smaller than crop size={size}"
            )
        self.size = size
        self._sharding = sharding
        self._seed = seed

    def __iter__(self):
        import jax

        from . import device_augment

        base_key = jax.random.PRNGKey(self._seed + 101)
        for raw in super().__iter__():
            pos = self._stream.position  # post-draw position keys the augment
            batch = jax.device_put(raw, self._sharding)
            rng = jax.random.fold_in(base_key, pos)
            yield device_augment.augment_batch(batch, rng, size=self.size)
