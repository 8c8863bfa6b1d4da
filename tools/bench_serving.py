"""End-to-end HTTP serving throughput on real hardware.

BASELINE_MEASURED has the raw sampler ladder (15.6 img/s b32 → 18.1 at the
b128 knee; ×stride with a distilled student), but no number for what a
client actually sees through the serving stack: HTTP parse → validation →
SampleBatcher coalescing → pow2-bucketed device batch → PNG/base64 encode
→ response. This tool measures that: it launches `gct2 serve` as a real
subprocess (random-init weights — throughput is weight-independent),
drives it with C concurrent clients × R requests of `num` images each,
and reports images/s through the full stack plus the coalescing stats
from /metrics.

Usage:
  python tools/bench_serving.py                        # flagship, TPU
  python tools/bench_serving.py --stride 8             # distilled-student op point
  python tools/bench_serving.py --platform cpu --size 16 --pixel-size 4 \
      --max-size 8 --octaves 2 --steps 4 --clients 2 --requests 1 --num 2
"""

import argparse
import base64
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _post(url, body, timeout):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        raw = r.read()
        if r.headers.get("Content-Type") == "application/octet-stream":
            import io

            import numpy as np

            return {"images": np.load(io.BytesIO(raw))}
        return json.loads(raw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=18944)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=3,
                    help="requests per client in the timed phase")
    ap.add_argument("--num", type=int, default=32, help="images per request")
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--frontend", default="threaded", choices=["threaded", "aio"])
    ap.add_argument("--format", default="base64", choices=["base64", "npy"],
                    help="response format: base64 = JSON list of PNG b64 "
                    "(browser-style clients); npy = raw uint8 tensor "
                    "(service-to-service; skips the per-image PNG encode)")
    ap.add_argument("--platform", default=None)
    # flagship defaults ride on Config's own defaults; these exist for smoke
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--pixel-size", type=int, default=None)
    ap.add_argument("--max-size", type=int, default=None)
    ap.add_argument("--octaves", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--wait-ms", type=float, default=None,
                    help="server-side coalescing window "
                    "(Config.serve_batch_wait_ms)")
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()

    def emit(obj):
        print(json.dumps(obj), flush=True)

    ckpt = f"/tmp/bench_serving_ckpt_{args.port}"
    os.makedirs(ckpt, exist_ok=True)  # empty: random-init weights, warns
    cmd = [
        sys.executable, "-m", "gan_class_transfer2_tpu.cli", "serve",
        "--port", str(args.port), "--frontend", args.frontend,
        "--checkpoint-dir", ckpt,
        "--compute-dtype", "bfloat16",
        "--sample-stride", str(args.stride),
        "--mesh-data", "1",
    ]
    if args.wait_ms is not None:
        cmd += ["--serve-batch-wait-ms", str(args.wait_ms)]
    if args.platform:
        cmd += ["--platform", args.platform,
                "--compute-dtype", "float32"]
    for flag in ("size", "pixel_size", "max_size", "octaves", "steps"):
        v = getattr(args, flag)
        if v is not None:
            cmd += ["--" + flag.replace("_", "-"), str(v)]
    log = open(f"/tmp/bench_serving_{args.port}.log", "wb")
    server = subprocess.Popen(cmd, cwd=REPO, stdout=log, stderr=log)
    base = f"http://127.0.0.1:{args.port}"
    try:
        # generous: on a tunneled TPU a fresh client can block minutes in
        # device init while the previous session drains
        deadline = time.time() + 540
        while True:
            try:
                with urllib.request.urlopen(base + "/healthz", timeout=5) as r:
                    json.loads(r.read())
                break
            except Exception:
                if server.poll() is not None:
                    raise RuntimeError("server exited during startup")
                if time.time() > deadline:
                    raise TimeoutError("server never became healthy")
                time.sleep(1)

        body = {"num": args.num, "format": args.format}

        # warmup: one full concurrent round, so every pow2 bucket the timed
        # phase can hit (stragglers included) is compiled and cached
        def one(results, i):
            t0 = time.time()
            out = _post(base + "/sample", body, args.timeout)
            results[i] = (time.time() - t0, len(out["images"]))

        warm = [None] * args.clients
        ts = [threading.Thread(target=one, args=(warm, i))
              for i in range(args.clients)]
        t0 = time.time()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        emit({"which": "warmup", "wall_s": round(time.time() - t0, 1),
              "per_request_s": [round(w[0], 1) for w in warm]})

        # timed phase
        lat = []
        lock = threading.Lock()

        def client():
            for _ in range(args.requests):
                t0 = time.time()
                out = _post(base + "/sample", body, args.timeout)
                dt = time.time() - t0
                assert len(out["images"]) == args.num
                if args.format == "base64":
                    # decode one image to keep the client honest end-to-end
                    base64.b64decode(out["images"][0][:64] + "==")
                else:
                    out["images"].sum()  # touch the tensor
                with lock:
                    lat.append(dt)

        ts = [threading.Thread(target=client) for _ in range(args.clients)]
        t0 = time.time()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.time() - t0
        total = args.clients * args.requests * args.num

        with urllib.request.urlopen(base + "/metrics", timeout=10) as r:
            metrics = r.read().decode()
        device_batches = None
        for line in metrics.splitlines():
            if line.startswith("gct2_device_batches"):
                device_batches = float(line.split()[-1])

        lat.sort()
        emit({
            "metric": "serving_images_per_sec_e2e",
            "value": round(total / wall, 2),
            "unit": "images/sec through HTTP (coalesce + device + encode)",
            "clients": args.clients, "num_per_request": args.num,
            "requests_total": args.clients * args.requests,
            "sample_stride": args.stride,
            "frontend": args.frontend,
            "format": args.format,
            "wall_s": round(wall, 1),
            "latency_p50_s": round(lat[len(lat) // 2], 2),
            "latency_max_s": round(lat[-1], 2),
            "device_batches_lifetime": device_batches,
        })
    finally:
        server.terminate()
        try:
            server.wait(timeout=15)
        except subprocess.TimeoutExpired:
            server.kill()


if __name__ == "__main__":
    main()
