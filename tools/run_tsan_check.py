"""Race-detection check for the native data loader.

The reference has no native code and so no sanitizer story (SURVEY §5);
this framework's C++ loader runs a worker pool over a shared ring buffer —
this tool builds it with ThreadSanitizer and hammers the concurrent
produce/consume path in a subprocess with libtsan preloaded.

    python tools/run_tsan_check.py

Exit 0 = no data races reported.
"""

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "gan_class_transfer2_tpu", "data", "native")

DRIVER = r"""
import ctypes, os, sys
import numpy as np

lib = ctypes.CDLL(os.environ["TSAN_LIB"])
lib.dl_create.restype = ctypes.c_void_p
lib.dl_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                          ctypes.c_int, ctypes.c_int, ctypes.c_int,
                          ctypes.c_int, ctypes.c_uint64]
lib.dl_next.restype = ctypes.c_int
lib.dl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
lib.dl_destroy.argtypes = [ctypes.c_void_p]

files = [f.encode() for f in sys.argv[1:]]
arr = (ctypes.c_char_p * len(files))(*files)
# 4 workers, small ring: maximum contention
h = lib.dl_create(arr, len(files), 16, 4, 4, 2, 0)
assert h
out = np.empty((4, 16, 16, 3), np.float32)
for _ in range(50):
    rc = lib.dl_next(h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert rc == 0
lib.dl_destroy(h)
print("tsan driver done")
"""


def main() -> int:
    subprocess.run(
        ["make", "-s", "libgct2dataloader_tsan.so"], cwd=NATIVE, check=True
    )
    tsan_lib = subprocess.run(
        ["g++", "-print-file-name=libtsan.so"], capture_output=True, text=True
    ).stdout.strip()

    with tempfile.TemporaryDirectory() as d:
        from PIL import Image
        import numpy as np

        rng = np.random.default_rng(0)
        paths = []
        for i in range(8):
            p = os.path.join(d, f"i{i}.png")
            Image.fromarray(
                rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
            ).save(p)
            paths.append(p)

        env = dict(
            os.environ,
            TSAN_LIB=os.path.join(NATIVE, "libgct2dataloader_tsan.so"),
            LD_PRELOAD=tsan_lib,
            TSAN_OPTIONS="halt_on_error=0 exitcode=66",
        )
        proc = subprocess.run(
            [sys.executable, "-c", DRIVER] + paths,
            env=env,
            capture_output=True,
            text=True,
        )
        sys.stdout.write(proc.stdout)
        races = "WARNING: ThreadSanitizer" in proc.stderr
        if races:
            sys.stderr.write(proc.stderr)
            print("TSAN: data races detected", file=sys.stderr)
            return 1
        if proc.returncode not in (0,):
            # non-race failure (e.g. preload issues in this environment)
            sys.stderr.write(proc.stderr[-2000:])
            print(f"TSAN driver exit {proc.returncode}", file=sys.stderr)
            return proc.returncode
        print("TSAN: no data races")
        return 0


if __name__ == "__main__":
    sys.exit(main())
