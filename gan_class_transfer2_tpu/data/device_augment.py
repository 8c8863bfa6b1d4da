"""On-device augmentation and HBM-resident datasets.

BASELINE.json's north star: "the image decode→resize→normalize→augment input
path is an on-device prefetching pipeline feeding HBM-resident batches."
Two pieces:

  * ``augment_batch`` — the random-crop / random-flip / ``uint8/128−1``
    normalize chain (reference train.py:288-292) as a jitted device function:
    the host ships raw uint8 pixels (4× smaller than fp32) and the VPU does
    the arithmetic, fused by XLA into whatever consumes the batch.
  * ``HBMDataset`` — for datasets that fit in HBM (CIFAR/MNIST-scale or a
    few thousand 256² crops): decode once on the host, park the uint8 tensor
    on device, and draw batches with a jitted gather+augment — zero
    steady-state host↔device traffic.

Crop randomisation uses a static-shape trick: a full random crop needs a
dynamic_slice per sample; we vmap ``lax.dynamic_slice`` over per-sample
offsets, which XLA lowers to an efficient batched gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _crop_one(img, off_h, off_w, size):
    return jax.lax.dynamic_slice(img, (off_h, off_w, 0), (size, size, 3))


@functools.partial(jax.jit, static_argnames=("size",))
def augment_batch(raw, rng, size: int):
    """raw: (B, H, W, 3) uint8 with H, W ≥ size → (B, size, size, 3) float32
    in [−1, 1): per-sample random crop + random hflip + /128−1."""
    b, h, w, _ = raw.shape
    r_crop, r_flip = jax.random.split(rng)
    off = jax.random.randint(
        r_crop, (b, 2), 0, jnp.asarray([h - size + 1, w - size + 1])
    )
    cropped = jax.vmap(_crop_one, in_axes=(0, 0, 0, None))(
        raw, off[:, 0], off[:, 1], size
    )
    flip = jax.random.bernoulli(r_flip, 0.5, (b,))
    flipped = jnp.where(flip[:, None, None, None], cropped[:, :, ::-1], cropped)
    return flipped.astype(jnp.float32) * (1.0 / 128.0) - 1.0


class HBMDataset:
    """All images resident in HBM; batches drawn fully on device.

    ``images``: (N, H, W, 3) uint8 (H, W ≥ size) — yields float32 augmented
    batches, or raw uint8 batches with ``raw=True`` — the train step then
    fuses crop/flip/normalize into its own program (trainer.diffusion_loss
    handles uint8 batches), removing the separate augment dispatch. A
    float32 pool already normalised to [−1, 1) (H = W = size) is also
    accepted: batches are plain gathers (crop/flip augmentation is a
    uint8-path feature; pre-normalised pools come from synthetic corpora
    and measurement tools).

    The pool is passed to the jitted draw as an ARGUMENT, not captured in
    its closure: a closure-captured device array is baked into the HLO as a
    literal, which bloats the executable by the pool size and outright
    fails on remote-compile platforms (axon rejects the >100 MB compile
    request for a 256²-scale pool with HTTP 413). As an argument it stays a
    runtime buffer.

    On tunneled platforms this path matters for memory too: every
    host→device ``device_put`` leaks its full byte size in host RSS on the
    axon client (measured ~50 MB/step at 256²/b64 — a 3000-step loop OOMs a
    125 GB host; tools/probe_transfer_leak.py). The HBM-resident draw ships
    only the int32 index vector per step and holds host RSS flat.

    Epoch semantics: shuffle WITHOUT replacement (every image once per
    epoch), matching the reference's permuted file stream (train.py:318) —
    the batch indices come from a host-side pipeline.EpochIndexStream (a
    few hundred int32 per step, negligible next to the batch itself) and the
    augment RNG is keyed by stream position, so the draw sequence is exactly
    restorable across restarts via ``state_dict``/``set_state``."""

    def __init__(self, images: np.ndarray, size: int, batch_size: int,
                 seed: int = 0, sharding=None, raw: bool = False):
        from .pipeline import EpochIndexStream

        if images.dtype == np.uint8:
            augment = not raw
        elif images.dtype == np.float32:
            if images.shape[1] != size or images.shape[2] != size:
                raise ValueError(
                    "float32 HBM pools must be pre-cropped to the target "
                    f"size (got {images.shape[1]}x{images.shape[2]}, "
                    f"size={size}); crop/flip augmentation is uint8-only"
                )
            augment = False
        else:
            raise TypeError(
                f"HBMDataset expects uint8 or float32 images, got {images.dtype}"
            )
        self.size = size
        self.batch_size = batch_size
        if sharding is not None:
            # multi-device: the pool must live on the batch sharding's mesh
            # (replicated — gathers take arbitrary indices, so sharding the
            # pool's N axis would turn every draw into a collective)
            from jax.sharding import NamedSharding, PartitionSpec

            self._images = jax.device_put(
                images, NamedSharding(sharding.mesh, PartitionSpec()))
        else:
            self._images = jnp.asarray(images)
        base_key = jax.random.PRNGKey(seed)

        @jax.jit
        def draw(pool, idx, position):
            batch = pool[idx]
            if augment:
                r_aug = jax.random.fold_in(base_key, position)
                batch = augment_batch(batch, r_aug, size=size)
            if sharding is not None:
                batch = jax.lax.with_sharding_constraint(batch, sharding)
            return batch

        self._draw = draw
        self._stream = EpochIndexStream(images.shape[0], batch_size, seed)

    def __iter__(self):
        while True:
            pos = self._stream.position
            idx = self._stream.next_indices().astype(np.int32)
            yield self._draw(self._images, idx, pos)

    def state_dict(self) -> dict:
        return self._stream.state_dict()

    def set_state(self, state: dict) -> None:
        self._stream.set_state(state)

    def close(self):
        pass
