"""ctypes binding for the C++ native data loader (data/native/dataloader.cc).

Builds the shared library on first use (g++ + libjpeg/libpng, both baked into
the image); falls back to the pure-Python pipeline when the toolchain is
unavailable. Element semantics are identical to pipeline.decode_image (tested
in tests/test_native_loader.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgct2dataloader.so")
_build_lock = threading.Lock()
_lib = None


def build_library(force: bool = False) -> str:
    """Compile the shared library (a no-op make when up to date). Returns
    its path.

    make runs unconditionally — its mtime tracking decides whether to
    recompile, so an edited dataloader.cc is never silently shadowed by a
    stale .so (an exists()-only check was — review r4). A no-op make costs
    milliseconds once per process (_load caches the CDLL)."""
    import fcntl

    with _build_lock:
        # the thread lock serialises within a process; the flock serialises
        # ACROSS processes (the multihost harness starts several at once,
        # and concurrent make runs would race on the .so)
        with open(os.path.join(_NATIVE_DIR, ".build.lock"), "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            if force and os.path.exists(_LIB_PATH):
                os.remove(_LIB_PATH)
            try:
                subprocess.run(
                    ["make", "-s", "libgct2dataloader.so"],
                    cwd=_NATIVE_DIR,
                    check=True,
                    capture_output=True,
                    text=True,
                )
            except subprocess.CalledProcessError as e:
                # surface the compiler diagnostics, not a bare exit status
                raise RuntimeError(
                    f"native loader build failed:\n{e.stderr or e.stdout}"
                ) from e
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        lib.dl_create.restype = ctypes.c_void_p
        lib.dl_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_uint64,
        ]
        lib.dl_next.restype = ctypes.c_int
        lib.dl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.dl_error.restype = ctypes.c_char_p
        lib.dl_error.argtypes = [ctypes.c_void_p]
        lib.dl_destroy.argtypes = [ctypes.c_void_p]
        lib.dl_cache_build.restype = ctypes.c_int
        lib.dl_cache_build.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_char_p,
        ]
        lib.dl_decode_one.restype = ctypes.c_int
        lib.dl_decode_one.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,  # out buffer capacity in floats (bounds check)
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def build_cache(pattern_or_files, store: int, out_path: str) -> int:
    """Decode every file once (C++), bilinear shortest-side resize to
    ``store``, center-crop, and pack into a uint8 cache file readable by
    data/cache.CachedDataset (zero-copy memmap). Returns records written."""
    from .pipeline import list_files

    files = (
        list_files(pattern_or_files)
        if isinstance(pattern_or_files, str)
        else list(pattern_or_files)
    )
    lib = _load()
    keep = [f.encode() for f in files]
    arr = (ctypes.c_char_p * len(keep))(*keep)
    n = lib.dl_cache_build(arr, len(keep), store, out_path.encode())
    if n < 0:
        raise RuntimeError(f"cache build failed for {out_path!r}")
    if n == 0:
        raise RuntimeError("cache build: no file decoded")
    return n


def decode_one(path: str, size: int, seed: int = 0, augment: bool = True):
    """Decode one file via the native path (parity-test hook).

    augment=True → (size,size,3) crop/flip/normalized; False → full image
    normalized only."""
    lib = _load()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if augment:
        out = np.empty((size, size, 3), np.float32)
    else:
        # caller doesn't know h,w yet: decode header first via a probe call
        from PIL import Image

        with Image.open(path) as im:
            w0, h0 = im.size
        out = np.empty((h0, w0, 3), np.float32)
    rc = lib.dl_decode_one(
        path.encode(),
        size,
        seed,
        1 if augment else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,  # capacity: the native side bounds-checks against it
        ctypes.byref(h),
        ctypes.byref(w),
    )
    if rc == -3:
        # the native decoder sees different dimensions than the PIL header
        # probe used to size the buffer — without the capacity check this
        # was a heap overflow (review r4)
        raise ValueError(
            f"native decode of {path}: decoded {h.value}x{w.value} exceeds "
            f"the probed buffer {tuple(out.shape[:2])}"
        )
    if rc != 0:
        raise ValueError(f"native decode failed ({rc}) for {path}")
    return out


class NativeImageDataset:
    """Drop-in replacement for pipeline.ImageDataset backed by the C++
    loader. Yields (B, size, size, 3) float32 batches."""

    def __init__(
        self,
        pattern_or_files,
        size: int,
        batch_size: int,
        seed: int = 0,
        num_workers: int = 2,
        prefetch: int = 2,
        **_,
    ):
        from .pipeline import list_files

        if isinstance(pattern_or_files, str):
            files = list_files(pattern_or_files)
        else:
            files = list(pattern_or_files)
        self._files_keepalive = [f.encode() for f in files]
        self.size = size
        self.batch_size = batch_size
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._lib = _load()
        self._batches_served = 0
        self._resume_round = 0
        self._handle = None
        self._started = False
        self._create()

    def _create(self):
        if self._handle:
            self._lib.dl_destroy(self._handle)
        arr = (ctypes.c_char_p * len(self._files_keepalive))(*self._files_keepalive)
        self._handle = self._lib.dl_create(
            arr, len(self._files_keepalive), self.size, self.batch_size,
            self.num_workers, self.prefetch,
            self.seed + 1_000_003 * self._resume_round,
        )
        if not self._handle:
            raise RuntimeError("dl_create failed")

    def state_dict(self) -> dict:
        """Stream position for checkpoint/resume; like ImageDataset, resume
        derives a fresh deterministic stream from the recorded position
        (threaded decode order is not exactly replayable)."""
        return {
            "batches_served": self._batches_served,
            "resume_round": self._resume_round,
        }

    def set_state(self, state: dict) -> None:
        if self._started:
            # same guard as ImageDataset: swapping the handle under a live
            # iterator is a use-after-free on the C++ side (review r4)
            raise RuntimeError("set_state must be called before iteration")
        self._batches_served = int(state["batches_served"])
        self._resume_round = int(state["resume_round"]) + 1
        self._create()  # restart workers on the resume seed

    def __iter__(self) -> Iterator[np.ndarray]:
        self._started = True
        while True:
            handle = self._handle
            if handle is None:
                return  # close() raced the consumer — stop, don't segfault
            out = np.empty((self.batch_size, self.size, self.size, 3), np.float32)
            rc = self._lib.dl_next(
                handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            if rc == -2:
                # worker pool aborted after persistent decode/crop failures —
                # surface the hang-prevention guard as a hard error, matching
                # the Python pipeline's behavior
                msg = self._lib.dl_error(handle) or b""
                raise RuntimeError(msg.decode() or "native loader failed")
            if rc != 0:
                return
            self._batches_served += 1
            yield out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.dl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
