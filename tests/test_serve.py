"""Serving-tier tests: drive the HTTP API over a real socket."""

import io
import json
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.serve.server import ModelService, Server
from gan_class_transfer2_tpu.train import gan, trainer


@pytest.fixture(scope="module")
def server():
    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    gan_state = gan.init_gan_state(cfg, jax.random.PRNGKey(1))
    service = ModelService(cfg, state=state, gan_state=gan_state)
    srv = Server(service).start()
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


def test_healthz(server):
    srv, _ = server
    status, body = _get(srv, "/healthz")
    assert status == 200
    assert json.loads(body)["status"] == "ok"


def test_sample_png(server):
    srv, cfg = server
    status, body = _post(srv, "/sample", json.dumps({"num": 2}).encode())
    assert status == 200
    img = Image.open(io.BytesIO(body))
    assert img.size == (cfg.size, cfg.size)


def test_sample_base64_batch(server):
    srv, _ = server
    status, body = _post(
        srv, "/sample", json.dumps({"num": 3, "format": "base64"}).encode()
    )
    assert status == 200
    assert len(json.loads(body)["images"]) == 3


def test_denoise_roundtrip(server):
    srv, cfg = server
    arr = np.random.default_rng(0).integers(
        0, 256, (cfg.size, cfg.size, 3), dtype=np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    status, body = _post(srv, "/denoise", buf.getvalue())
    assert status == 200
    out = Image.open(io.BytesIO(body))
    assert out.size == (cfg.size, cfg.size)


def test_edit_endpoint(server):
    """The reference's invert → edit-noise → decode workflow over HTTP
    (reference train.py:364-496)."""
    import base64

    srv, cfg = server
    arr = np.random.default_rng(2).integers(
        0, 256, (cfg.size, cfg.size, 3), dtype=np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    status, body = _post(srv, "/edit?edits=pixelate,shift", buf.getvalue())
    assert status == 200
    out = json.loads(body)
    assert sorted(out) == ["pixelate", "reconstruction", "shift"]
    img = Image.open(io.BytesIO(base64.b64decode(out["pixelate"])))
    assert img.size == (cfg.size, cfg.size)
    # invalid edit name → named 400
    status, body = _post(srv, "/edit?edits=sharpen", buf.getvalue())
    assert status == 400
    assert "sharpen" in json.loads(body)["error"]


def test_transfer_directions(server):
    srv, cfg = server
    arr = np.random.default_rng(1).integers(
        0, 256, (cfg.size, cfg.size, 3), dtype=np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    s1, b1 = _post(srv, "/transfer?direction=ab", buf.getvalue())
    s2, b2 = _post(srv, "/transfer?direction=ba", buf.getvalue())
    assert s1 == s2 == 200
    assert b1 != b2  # different generators


def test_error_paths(server):
    srv, _ = server
    status, body = _post(srv, "/sample", json.dumps({"num": 10_000}).encode())
    assert status == 400
    status, _ = _post(srv, "/nope", b"")
    assert status == 404
    status, body = _post(srv, "/transfer?direction=zz", b"")
    assert status == 400


def test_gan_only_service_rejects_sample():
    cfg = tiny_test_config()
    gan_state = gan.init_gan_state(cfg, jax.random.PRNGKey(2))
    service = ModelService(cfg, gan_state=gan_state)
    srv = Server(service).start()
    try:
        status, body = _post(srv, "/sample", json.dumps({"num": 1}).encode())
        assert status == 400
        assert "diffusion" in json.loads(body)["error"]
        # transfer still works
        import numpy as _np
        from PIL import Image as _Image

        arr = _np.zeros((cfg.size, cfg.size, 3), _np.uint8)
        buf = io.BytesIO()
        _Image.fromarray(arr).save(buf, format="PNG")
        status, _ = _post(srv, "/transfer?direction=ab", buf.getvalue())
        assert status == 200
    finally:
        srv.stop()


def test_transfer_rejects_malformed_direction(server):
    srv, _ = server
    status, _ = _post(srv, "/transfer?direction=abba", b"")
    assert status == 400


def test_sample_batch_bucketing(server):
    """num=3 pads to 4 internally but returns exactly 3 images."""
    srv, _ = server
    status, body = _post(
        srv, "/sample", json.dumps({"num": 3, "format": "base64"}).encode()
    )
    assert status == 200
    assert len(json.loads(body)["images"]) == 3


def test_concurrent_samples_coalesce(server):
    """N concurrent /sample requests trigger <= 2 device sampler invocations
    (SampleBatcher microbatching — VERDICT r1 next #9)."""
    import threading

    srv, _ = server
    # count device invocations by wrapping the service's jitted program
    svc = srv.service
    real = svc._sample
    calls = []

    def counting(p, b, c=None):
        calls.append(int(b.shape[0]))
        return real(p, b, c)

    svc._sample = counting
    try:
        results = [None] * 6
        errors = []

        def hit(i):
            try:
                status, body = _post(
                    srv, "/sample", json.dumps({"num": 2, "format": "base64"}).encode()
                )
                results[i] = (status, len(json.loads(body)["images"]))
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors
        assert all(r == (200, 2) for r in results), results
        # 6 requests x 2 images: coalesced into at most 2 device batches
        assert len(calls) <= 2, calls
        assert sum(calls) >= 12  # padded buckets cover all requested images
    finally:
        svc._sample = real


def test_sample_stream_yields_progression(server):
    """Streaming endpoint: chunked multipart of intermediate diffusion
    states; last part equals the finished sample resolution."""
    srv, cfg = server
    status, body = _post(
        srv, "/sample", json.dumps({"num": 1, "stream": True, "segments": 3}).encode()
    )
    assert status == 200
    parts = body.split(b"--gct2frame")
    pngs = [p.split(b"\r\n\r\n", 1)[1] for p in parts if b"image/png" in p]
    assert len(pngs) == 3
    for p in pngs:
        img = Image.open(io.BytesIO(p.rstrip(b"\r\n")))
        assert img.size == (cfg.size, cfg.size)
    # intermediate states differ from the final one
    assert pngs[0] != pngs[-1]


def test_concurrent_denoise_coalesce(server):
    """N concurrent /denoise requests trigger <= 2 preview invocations."""
    import threading

    srv, cfg = server
    svc = srv.service
    real = svc._preview
    calls = []

    def counting(p, x, n):
        calls.append(int(x.shape[0]))
        return real(p, x, n)

    svc._preview = counting
    try:
        rng = np.random.default_rng(0)
        arr = np.clip(
            (rng.uniform(-1, 1, (cfg.size, cfg.size, 3)) * 0.5 + 0.5) * 255,
            0, 255,
        ).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        png = buf.getvalue()
        results, errors = [None] * 5, []

        def hit(i):
            try:
                results[i] = _post(srv, "/denoise", png)[0]
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors and all(r == 200 for r in results), (results, errors)
        assert len(calls) <= 2, calls
    finally:
        svc._preview = real


def test_sample_stream_matches_full_sampler():
    """sample_stream's final state is value-identical to sample().images."""
    import jax
    import jax.numpy as jnp

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.models import unet
    from gan_class_transfer2_tpu.sample import sampler

    cfg = tiny_test_config(steps=6)
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    r = np.random.default_rng(0)
    init = jnp.asarray(r.normal(size=(2, cfg.size, cfg.size, 3)).astype(np.float32))
    full = np.asarray(sampler.sample(cfg, params, init).images)
    *_, last = sampler.sample_stream(cfg, params, init, segments=3)
    np.testing.assert_allclose(last, full, atol=1e-5)


def test_batcher_rejects_mixed_class_and_unconditional():
    """payload=None means 'no class' — NOT class 0; a mixed device batch
    must fail loudly instead of silently sampling class 0 (VERDICT r2
    weak #4). ModelService.sample resolves the default class before
    submit, so this only fires on direct misuse."""
    from gan_class_transfer2_tpu.serve.server import SampleBatcher, _BatchRequest

    b = SampleBatcher(lambda n, c=None: np.zeros((n, 4, 4, 3)), max_wait_s=0.001)
    try:
        with pytest.raises(ValueError, match="mixed"):
            b._execute([_BatchRequest(1, None), _BatchRequest(1, 1)])
    finally:
        b.close()


def test_conditional_default_class_resolved_before_batching():
    """On a conditional checkpoint, sample() with no class uses class 0 by
    documented default — resolved in the service, so the batcher sees a
    concrete class index."""
    import jax

    from gan_class_transfer2_tpu.serve.server import ModelService
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    cfg = tiny_test_config(num_classes=2, classes=("a", "b"))
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    svc = ModelService(cfg, state=state)
    try:
        seen = []
        orig = svc._run_sample

        def spy(num, classes=None):
            seen.append(None if classes is None else np.asarray(classes))
            return orig(num, classes)

        svc._batcher._run = spy
        out = svc.sample(2)  # no class requested
        assert out.shape[0] == 2
        assert seen and seen[0] is not None
        np.testing.assert_array_equal(seen[0], [0, 0])
    finally:
        svc.close()


def test_service_samples_over_mesh_match_single_device():
    """ModelService with a data mesh pads the sampler batch to the data
    extent and shards the program; results must match the unmeshed service
    bit-for-bit given identical RNG and padded shapes."""
    from gan_class_transfer2_tpu.parallel import mesh as mesh_lib
    from gan_class_transfer2_tpu.serve.server import ModelService
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    cfg = tiny_test_config()
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:4], data=4, model=1)
    plain = ModelService(cfg, state=state)
    meshed = ModelService(cfg, state=state, mesh=mesh)
    try:
        # num=3 → pow2 bucket 4 → already a multiple of data=4: identical
        # padded shape → identical RNG draw → identical samples
        a = plain.sample(3)
        b = meshed.sample(3)
        assert a.shape == b.shape == (3, cfg.size, cfg.size, 3)
        assert a.dtype == b.dtype == np.uint8  # quantised on device
        # ±1: a float diff straddling a uint8 bucket edge rounds apart
        np.testing.assert_allclose(
            a.astype(np.int16), b.astype(np.int16), atol=1, rtol=0
        )
        # streaming over the mesh also works end-to-end
        chunks = list(meshed.sample_stream(2, segments=2))
        assert len(chunks) == 2 and chunks[-1].shape[0] == 2
    finally:
        plain.close()
        meshed.close()


def test_service_transfer_and_denoise_over_mesh_match_single_device():
    """The one-forward endpoints (GAN/cGAN transfer, denoise preview) run
    data-parallel over the mesh (mesh.make_data_parallel_apply); outputs
    must match the unmeshed service on the same weights."""
    from gan_class_transfer2_tpu.parallel import mesh as mesh_lib
    from gan_class_transfer2_tpu.serve.server import ModelService
    from gan_class_transfer2_tpu.train import conditional_gan as cgan_lib
    from gan_class_transfer2_tpu.train import gan as gan_lib
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    cfg = tiny_test_config()
    ccfg = cfg.replace(num_classes=3)
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    gs = gan_lib.init_gan_state(cfg, jax.random.PRNGKey(1))
    cs = cgan_lib.init_conditional_gan_state(ccfg, jax.random.PRNGKey(2))
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:4], data=4, model=1)
    plain = ModelService(cfg, state=state, gan_state=gs)
    meshed = ModelService(cfg, state=state, gan_state=gs, mesh=mesh)
    cplain = ModelService(ccfg, cgan_state=cs)
    cmeshed = ModelService(ccfg, cgan_state=cs, mesh=mesh)
    img = np.random.default_rng(0).uniform(
        -1, 1, (1, cfg.size, cfg.size, 3)
    ).astype(np.float32)
    try:
        for d in ("ab", "ba"):
            a = plain.transfer(img, d)
            b = meshed.transfer(img, d)
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
        ca = cplain.transfer_to(img, 2)
        cb = cmeshed.transfer_to(img, 2)
        np.testing.assert_allclose(ca, cb, rtol=2e-4, atol=2e-4)
        # denoise previews draw service-local RNG; check shape/finiteness
        den = meshed.denoise(img)
        assert den.shape == img.shape and np.isfinite(den).all()
    finally:
        plain.close()
        meshed.close()
        cplain.close()
        cmeshed.close()


def test_build_service_uses_mesh_on_multichip_host(tmp_path):
    """The serve CLI's service constructor: restores the latest checkpoint
    and, with >1 visible device, builds a mesh so /sample shards over the
    data axis — the path the CLI runs on multi-chip hosts."""
    from gan_class_transfer2_tpu.serve.server import build_service
    from gan_class_transfer2_tpu.train import trainer as trainer_lib
    from gan_class_transfer2_tpu.utils import checkpoint as ckpt_lib

    import jax.numpy as jnp

    cfg = tiny_test_config(checkpoint_dir=str(tmp_path), mesh_data=0)
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    ckpt_lib.save(str(tmp_path), state, cfg)

    svc = build_service(cfg)
    try:
        assert svc.step == 7  # checkpoint restored
        assert svc.mesh is not None and svc.mesh.size == len(jax.devices())
        out = svc.sample(3)  # 3 -> pow2 4 -> padded to the 8-way data axis
        assert out.shape == (3, cfg.size, cfg.size, 3)
        assert np.isfinite(out).all()
    finally:
        svc.close()


def test_build_service_ignores_oversized_train_mesh(tmp_path):
    """A checkpoint trained with a mesh larger than the serving host (pod
    runs store e.g. mesh_data=16 in config.json) must still serve — the
    serving mesh is always the LOCAL data mesh (review r3 finding)."""
    from gan_class_transfer2_tpu.serve.server import build_service

    cfg = tiny_test_config(checkpoint_dir=str(tmp_path), mesh_data=16)
    svc = build_service(cfg)  # would raise "needs 16 devices" before the fix
    try:
        assert svc.mesh is None or svc.mesh.size <= len(jax.devices())
        out = svc.sample(2)
        assert out.shape == (2, cfg.size, cfg.size, 3)
    finally:
        svc.close()


def test_batcher_load_shed():
    """serve_max_queue: submits past the queued-image cap raise ServerBusy
    while a device batch is in flight; queued work still completes."""
    import threading
    import time

    from gan_class_transfer2_tpu.serve import server as srv_mod

    release = threading.Event()
    started = threading.Event()

    def run(total):
        started.set()
        release.wait(10)
        return np.zeros((total, 4, 4, 3), np.float32)

    b = srv_mod.SampleBatcher(run, max_batch=8, max_wait_s=0.0, max_queue=4)
    try:
        results = []
        t1 = threading.Thread(target=lambda: results.append(b.submit(2)))
        t1.start()
        assert started.wait(5)  # collector now blocked inside run()
        t2 = threading.Thread(target=lambda: results.append(b.submit(4)))
        t2.start()
        deadline = time.time() + 5
        while b.depth() < 4 and time.time() < deadline:
            time.sleep(0.01)
        assert b.depth() == 4
        with pytest.raises(srv_mod.ServerBusy):
            b.submit(1)  # 4 queued + 1 > max_queue
        release.set()
        t1.join(5)
        t2.join(5)
        # completion-wait order between the two waiter threads races once
        # release fires; compare as a multiset
        assert sorted(r.shape[0] for r in results) == [2, 4]
    finally:
        release.set()
        b.close()


def test_busy_maps_to_503(server):
    from gan_class_transfer2_tpu.serve.server import ServerBusy

    srv, _ = server
    orig = srv.service.sample

    def busy(num, class_idx=None):
        raise ServerBusy("request queue full (test)")

    srv.service.sample = busy
    try:
        status, body = _post(srv, "/sample", json.dumps({"num": 1}).encode())
    finally:
        srv.service.sample = orig
    assert status == 503
    assert "queue full" in json.loads(body)["error"]


def test_metrics_include_queue_depth_and_shed_counter(server):
    srv, _ = server
    status, body = _get(srv, "/metrics")
    assert status == 200
    assert b'gct2_queue_depth{batcher="sample"}' in body
    assert b'gct2_queue_depth{batcher="transfer_ab"}' in body
    assert b"gct2_rejected_busy" in body


def test_stream_request_guards(server):
    """Streaming validates segments (unbounded np.array_split sizing is a
    host-OOM lever) and rejects num > 1 (the wire format carries one image
    per frame — computing a batch and transmitting [0] wasted device work;
    review r3e)."""
    import json as _json

    srv, _ = server
    code, body = _post(
        srv, "/sample",
        _json.dumps({"num": 1, "stream": True, "segments": 10**9}).encode(),
    )
    assert code == 400 and b"segments" in body
    code, body = _post(
        srv, "/sample",
        _json.dumps({"num": 2, "stream": True, "segments": 2}).encode(),
    )
    assert code == 400 and b"num=1" in body


def test_batcher_submit_after_close_raises():
    """A handler thread racing close() must get an error, not enqueue a
    request nobody will ever complete (review r3e)."""
    from gan_class_transfer2_tpu.serve.server import SampleBatcher

    b = SampleBatcher(lambda n: np.zeros((n, 2, 2, 3), np.float32))
    b.close()
    with pytest.raises(RuntimeError, match="shutting down"):
        b.submit(1)


def test_stream_load_shed():
    """Streams bypass the batchers, so they have their own shed: beyond
    Config.serve_max_streams concurrent streams, sample_stream raises
    ServerBusy EAGERLY (pre-header → 503), and slots free when a stream
    ends (review r3f)."""
    from gan_class_transfer2_tpu.serve.server import ServerBusy
    from gan_class_transfer2_tpu.train import trainer as trainer_lib

    cfg = tiny_test_config().replace(serve_max_streams=2)
    state = trainer_lib.init_state(cfg, jax.random.PRNGKey(0))
    svc = ModelService(cfg, state=state)
    try:
        s1 = svc.sample_stream(1, segments=2)
        s2 = svc.sample_stream(1, segments=2)
        with pytest.raises(ServerBusy, match="trajectories active"):
            svc.sample_stream(1, segments=2)
        assert "gct2_streams_active 2" in svc.metrics_text()
        s1.close()  # slot released on close, not only on exhaustion
        s3 = svc.sample_stream(1, segments=2)
        list(s3)  # drain to completion releases too
        assert "gct2_streams_active 1" in svc.metrics_text()
        s2.close()
        assert "gct2_streams_active 0" in svc.metrics_text()
        # /edit counts against the same trajectory shed
        s4 = svc.sample_stream(1, segments=2)
        s5 = svc.sample_stream(1, segments=2)
        img = np.zeros((1, cfg.size, cfg.size, 3), np.float32)
        with pytest.raises(ServerBusy, match="trajectories active"):
            svc.edit(img, edits=("shift",))
        s4.close(); s5.close()
        out = svc.edit(img, edits=("shift",))  # slots freed: edit runs
        assert "shift" in out and "reconstruction" in out
    finally:
        svc.close()


def test_malformed_json_shapes_are_400_not_500(server):
    """Non-object JSON and null fields are client errors (review r4:
    AttributeError/TypeError fell through to the 500 fault barrier)."""
    srv, _ = server
    for body in (b"[1]", b'"x"', b'{"num": null}', b'{"num": "many"}'):
        status, resp = _post(srv, "/sample", body)
        assert status == 400, (body, status, resp)


def test_body_length_guards(server):
    """Oversized/negative Content-Length answers 400 instead of buffering
    (review r4: the threaded frontend had no cap at all)."""
    import http.client

    srv, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
    conn.putrequest("POST", "/sample")
    conn.putheader("Content-Length", str(100 * 1024 * 1024 * 1024))
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


def test_edit_bumps_device_batches(server):
    srv, cfg = server
    import io as io_lib

    import numpy as np
    from PIL import Image as PILImage

    before = srv.service.counters["device_batches"]
    rng = np.random.default_rng(0)
    buf = io_lib.BytesIO()
    PILImage.fromarray(
        rng.integers(0, 256, (cfg.size, cfg.size, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    status, _ = _post(srv, "/edit?edits=shift", buf.getvalue())
    assert status == 200
    assert srv.service.counters["device_batches"] > before


def test_sample_npy_batch(server):
    """"format": "npy" returns one .npy of the uint8 batch — the raw
    service-to-service response (r5: PNG encode dominates e2e serving
    throughput on small host CPUs once the device is fast)."""
    srv, cfg = server
    status, body = _post(
        srv, "/sample", json.dumps({"num": 3, "format": "npy"}).encode()
    )
    assert status == 200
    arr = np.load(io.BytesIO(body))
    assert arr.shape == (3, cfg.size, cfg.size, 3)
    assert arr.dtype == np.uint8


def test_sample_unknown_format_rejected(server):
    srv, _ = server
    status, body = _post(
        srv, "/sample", json.dumps({"num": 1, "format": "jpeg"}).encode()
    )
    assert status == 400
    assert b"png | base64 | npy" in body


def _npy_body(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_image_endpoints_npy_roundtrip(server):
    """Raw-tensor I/O on the image-in endpoints (r5): a ``.npy`` uint8 body
    in, ``format=npy`` uint8 batch out — no PIL on either side, and
    value-identical to the PNG path (PNG is lossless uint8)."""
    srv, cfg = server
    arr = np.random.default_rng(7).integers(
        0, 256, (cfg.size, cfg.size, 3), dtype=np.uint8
    )
    status, body = _post(srv, "/denoise?format=npy", _npy_body(arr))
    assert status == 200
    out = np.load(io.BytesIO(body))
    assert out.shape == (1, cfg.size, cfg.size, 3) and out.dtype == np.uint8
    # PNG path vs raw path must see the SAME pixels — compare through the
    # deterministic /transfer program (denoise draws fresh noise per call)
    status, body = _post(srv, "/transfer?direction=ab&format=npy",
                         _npy_body(arr[None]))  # (1,H,W,3) also accepted
    assert status == 200
    out = np.load(io.BytesIO(body))
    assert out.shape == (1, cfg.size, cfg.size, 3) and out.dtype == np.uint8
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    status, png_body = _post(srv, "/transfer?direction=ab", buf.getvalue())
    assert status == 200
    png_out = np.asarray(Image.open(io.BytesIO(png_body)))
    np.testing.assert_array_equal(out[0], png_out)


def test_edit_npy_returns_keyed_npz(server):
    srv, cfg = server
    arr = np.random.default_rng(8).integers(
        0, 256, (cfg.size, cfg.size, 3), dtype=np.uint8
    )
    status, body = _post(
        srv, "/edit?edits=pixelate,shift&format=npy", _npy_body(arr)
    )
    assert status == 200
    with np.load(io.BytesIO(body)) as z:
        assert sorted(z.files) == ["pixelate", "reconstruction", "shift"]
        assert z["shift"].shape == (1, cfg.size, cfg.size, 3)
        assert z["shift"].dtype == np.uint8


def test_npy_body_validation(server):
    """Malformed raw-tensor bodies are client errors (400), and raw tensors
    are never silently resampled."""
    srv, cfg = server
    # wrong dtype
    bad = np.zeros((cfg.size, cfg.size, 3), np.float32)
    status, body = _post(srv, "/denoise", _npy_body(bad))
    assert status == 400 and b"uint8" in body
    # wrong spatial size — must NOT be resampled
    bad = np.zeros((cfg.size * 2, cfg.size * 2, 3), np.uint8)
    status, body = _post(srv, "/denoise", _npy_body(bad))
    assert status == 400 and b"not resampled" in body
    # wrong rank/channels
    bad = np.zeros((cfg.size, cfg.size), np.uint8)
    status, _ = _post(srv, "/denoise", _npy_body(bad))
    assert status == 400
    # truncated .npy header
    status, _ = _post(srv, "/denoise", b"\x93NUMPY garbage")
    assert status == 400
    # unknown response format on an image endpoint
    arr = np.zeros((cfg.size, cfg.size, 3), np.uint8)
    status, body = _post(srv, "/denoise?format=jpeg", _npy_body(arr))
    assert status == 400 and b"png | npy" in body
