"""Async (asyncio) serving frontend — same API surface as the threaded one.

Drives serve/aio.AsyncServer over a real socket with the stdlib client and
checks the endpoints, the multipart stream, and that concurrent requests
still coalesce through the shared device batchers.
"""

import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.serve.aio import AsyncServer
from gan_class_transfer2_tpu.serve.server import ModelService
from gan_class_transfer2_tpu.train import gan, trainer


@pytest.fixture(scope="module")
def aserver():
    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    gan_state = gan.init_gan_state(cfg, jax.random.PRNGKey(1))
    service = ModelService(cfg, state=state, gan_state=gan_state)
    srv = AsyncServer(service).start()
    yield srv, cfg
    srv.stop()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
        return r.status, r.read()


def _post(srv, path, data, headers=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=data, headers=headers or {}
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_healthz_reports_aio(aserver):
    srv, _ = aserver
    status, body = _get(srv, "/healthz")
    assert status == 200
    obj = json.loads(body)
    assert obj["status"] == "ok"
    assert obj["frontend"] == "aio"


def test_sample_png(aserver):
    srv, cfg = aserver
    status, body = _post(srv, "/sample", json.dumps({"num": 2}).encode())
    assert status == 200
    img = Image.open(io.BytesIO(body))
    assert img.size == (cfg.size, cfg.size)


def test_sample_base64_batch(aserver):
    srv, _ = aserver
    status, body = _post(
        srv, "/sample", json.dumps({"num": 3, "format": "base64"}).encode()
    )
    assert status == 200
    assert len(json.loads(body)["images"]) == 3


def test_bad_num_rejected(aserver):
    srv, _ = aserver
    status, body = _post(srv, "/sample", json.dumps({"num": 0}).encode())
    assert status == 400


def test_unknown_path_404(aserver):
    srv, _ = aserver
    status, _ = _post(srv, "/nope", b"")
    assert status == 404


def test_denoise_roundtrip(aserver):
    srv, cfg = aserver
    arr = np.random.default_rng(0).integers(
        0, 256, (cfg.size, cfg.size, 3), dtype=np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    status, body = _post(srv, "/denoise", buf.getvalue())
    assert status == 200
    assert Image.open(io.BytesIO(body)).size == (cfg.size, cfg.size)


def test_transfer_direction(aserver):
    srv, cfg = aserver
    arr = np.zeros((cfg.size, cfg.size, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    status, _ = _post(srv, "/transfer?direction=ba", buf.getvalue())
    assert status == 200
    status, body = _post(srv, "/transfer?direction=zz", buf.getvalue())
    assert status == 400


def test_edit_endpoint(aserver):
    import base64

    srv, cfg = aserver
    arr = np.zeros((cfg.size, cfg.size, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    status, body = _post(srv, "/edit?edits=shift", buf.getvalue())
    assert status == 200
    out = json.loads(body)
    assert sorted(out) == ["reconstruction", "shift"]
    assert Image.open(
        io.BytesIO(base64.b64decode(out["shift"]))
    ).size == (cfg.size, cfg.size)


def test_stream_multipart(aserver):
    srv, _ = aserver
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/sample",
        data=json.dumps({"num": 1, "stream": True, "segments": 3}).encode(),
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert "multipart/x-mixed-replace" in r.headers["Content-Type"]
        payload = r.read()
    assert payload.count(b"--gct2frame") >= 4  # 3 frames + terminator
    assert payload.count(b"Content-Type: image/png") == 3


def test_stream_on_gan_only_service_is_clean_400():
    """A stream precondition failure must be a JSON 400, never a 200
    multipart header followed by an embedded error (the header is only
    written after check_streamable passes)."""
    from gan_class_transfer2_tpu.train import gan as gan_lib

    cfg = tiny_test_config()
    gan_state = gan_lib.init_gan_state(cfg, jax.random.PRNGKey(0))
    srv = AsyncServer(ModelService(cfg, gan_state=gan_state)).start()
    try:
        status, body = _post(
            srv, "/sample", json.dumps({"num": 1, "stream": True}).encode()
        )
        assert status == 400
        assert "diffusion" in json.loads(body)["error"]
    finally:
        srv.stop()


def test_oversize_body_rejected_without_buffering(aserver):
    """A huge Content-Length must not be buffered; the connection drops and
    the server stays healthy for the next request."""
    import http.client

    srv, _ = aserver
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
    try:
        conn.putrequest("POST", "/denoise")
        conn.putheader("Content-Length", str(10 * 1024 * 1024 * 1024))
        conn.endheaders()
        try:
            conn.send(b"x" * 10)
            conn.getresponse().read()
        except Exception:
            pass  # dropped connection is the expected outcome
    finally:
        conn.close()
    status, _ = _get(srv, "/healthz")
    assert status == 200  # server alive after the abusive client


def test_concurrent_requests_coalesce(aserver):
    """N parallel /sample requests must share device batches through the
    SampleBatcher even on the async frontend."""
    srv, _ = aserver
    service = srv.service

    # count device invocations by wrapping the batcher's run fn
    n_calls = []
    orig = service._batcher._run

    def counting(num):
        n_calls.append(num)
        return orig(num)

    service._batcher._run = counting
    try:
        results = [None] * 6
        def worker(i):
            results[i] = _post(
                srv, "/sample", json.dumps({"num": 1}).encode()
            )
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r[0] == 200 for r in results)
        assert len(n_calls) <= 3, f"expected coalescing, got calls {n_calls}"
    finally:
        service._batcher._run = orig


def test_malformed_request_gets_400(aserver):
    """A malformed request line must get an HTTP 400 like the threaded
    frontend — not a silent connection drop (ADVICE r2)."""
    import socket

    srv, _ = aserver
    with socket.create_connection(("127.0.0.1", srv.port), timeout=10) as s:
        s.sendall(b"garbage\r\n\r\n")
        data = s.recv(4096)
    assert data.startswith(b"HTTP/1.1 400")
    assert b"malformed request line" in data


def test_busy_maps_to_503_aio(aserver):
    """Both frontends answer 503 + Retry-After on batcher overload."""
    from gan_class_transfer2_tpu.serve.server import ServerBusy

    srv, _ = aserver
    orig = srv.service.sample

    def busy(num, class_idx=None):
        raise ServerBusy("request queue full (test)")

    srv.service.sample = busy
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/sample",
            data=json.dumps({"num": 1}).encode(),
        )
        try:
            with urllib.request.urlopen(req) as r:
                status, hdrs, body = r.status, r.headers, r.read()
        except urllib.error.HTTPError as e:
            status, hdrs, body = e.code, e.headers, e.read()
    finally:
        srv.service.sample = orig
    assert status == 503
    assert hdrs.get("Retry-After") == "1"
    assert "queue full" in json.loads(body)["error"]


def test_stream_stops_after_client_disconnect(aserver):
    """A client that reads one frame and disconnects must not cost every
    remaining device segment: the producer checks the abandon flag between
    segments and stops (review r3e)."""
    import socket
    import time

    srv, _ = aserver
    svc = srv.service
    real = svc.sample_stream
    segments_served = []

    def counting(num, segments=4, class_idx=None):
        for i, snap in enumerate(real(num, segments=segments,
                                      class_idx=class_idx)):
            segments_served.append(i)
            yield snap

    svc.sample_stream = counting
    try:
        body = json.dumps({"num": 1, "stream": True, "segments": 4}).encode()
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        s.sendall(
            b"POST /sample HTTP/1.1\r\nHost: x\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
        )
        # read a little (the header + first frame), then vanish
        s.recv(512)
        s.close()
        deadline = time.time() + 20
        while time.time() < deadline and len(segments_served) < 4:
            time.sleep(0.2)
            n_before = len(segments_served)
            time.sleep(0.8)
            if len(segments_served) == n_before:
                break  # producer stopped
        assert len(segments_served) < 4, segments_served
    finally:
        svc.sample_stream = real


def test_header_count_limit_is_inclusive(aserver):
    """Exactly MAX_HEADERS headers must be accepted (the blank terminator
    used to consume an iteration, making the effective limit 99)."""
    srv, _ = aserver
    # urllib adds 6 of its own (Host, Content-Length, Content-Type,
    # Accept-Encoding, User-Agent, Connection): 94 + 6 = exactly MAX_HEADERS
    extra = {f"X-H-{i}": "v" for i in range(94)}
    status, body = _post(srv, "/healthz-nope", b"", headers=extra)
    assert status == 404  # parsed fine; unknown path — not a 400 header error
    # one over the limit is still rejected
    extra["X-Extra"] = "v"
    status, body = _post(srv, "/healthz-nope", b"", headers=extra)
    assert status == 400 and b"headers" in body


def test_malformed_json_shapes_are_400_not_500(aserver):
    srv, _ = aserver
    for body in (b"[1]", b'"x"', b'{"num": null}', b'{"num": "many"}'):
        status, resp = _post(srv, "/sample", body)
        assert status == 400, (body, status, resp)


def test_inflight_cap_sheds_503(aserver):
    """The aio frontend sheds with a fast 503 when too many blocking calls
    are in flight (review r4: excess requests sat in the executor's
    unbounded queue and the batcher-level shed was unreachable)."""
    srv, _ = aserver
    old = srv._max_inflight
    srv._max_inflight = 0
    try:
        status, body = _post(srv, "/sample", json.dumps({"num": 1}).encode())
        assert status == 503
        assert "overloaded" in json.loads(body)["error"]
    finally:
        srv._max_inflight = old


def test_start_surfaces_bind_error():
    """A bind failure must raise the real error from start(), not a generic
    'failed to start' after a 30 s stall (review r4)."""
    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    service = ModelService(cfg, state=state)
    srv = AsyncServer(service).start()
    try:
        service2 = ModelService(cfg, state=state)
        clash = AsyncServer(service2, port=srv.port)
        with pytest.raises(RuntimeError, match="failed to start"):
            clash.start()
    finally:
        srv.stop()


def test_sample_npy_batch(aserver):
    import numpy as _np

    srv, cfg = aserver
    status, body = _post(
        srv, "/sample", json.dumps({"num": 3, "format": "npy"}).encode()
    )
    assert status == 200
    arr = _np.load(io.BytesIO(body))
    assert arr.shape == (3, cfg.size, cfg.size, 3)
    assert arr.dtype == _np.uint8


def test_image_endpoints_npy_roundtrip_aio(aserver):
    """Raw-tensor I/O (r5) through the asyncio frontend: .npy uint8 body in,
    format=npy uint8 batch out on /denoise and /transfer; /edit returns a
    keyed .npz; malformed tensors and unknown formats are 400s."""
    srv, cfg = aserver
    arr = np.random.default_rng(7).integers(
        0, 256, (cfg.size, cfg.size, 3), dtype=np.uint8
    )

    def npy(a):
        buf = io.BytesIO()
        np.save(buf, a)
        return buf.getvalue()

    status, body = _post(srv, "/denoise?format=npy", npy(arr))
    assert status == 200
    out = np.load(io.BytesIO(body))
    assert out.shape == (1, cfg.size, cfg.size, 3) and out.dtype == np.uint8

    status, body = _post(srv, "/transfer?direction=ba&format=npy", npy(arr))
    assert status == 200
    out = np.load(io.BytesIO(body))
    assert out.shape == (1, cfg.size, cfg.size, 3) and out.dtype == np.uint8

    status, body = _post(srv, "/edit?edits=shift&format=npy", npy(arr))
    assert status == 200
    with np.load(io.BytesIO(body)) as z:
        assert sorted(z.files) == ["reconstruction", "shift"]

    status, body = _post(
        srv, "/denoise", npy(np.zeros((cfg.size, cfg.size, 3), np.float32))
    )
    assert status == 400 and b"uint8" in body
    status, body = _post(srv, "/transfer?direction=ab&format=jpeg", npy(arr))
    assert status == 400 and b"png | npy" in body
