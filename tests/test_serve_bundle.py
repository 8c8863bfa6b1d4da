"""Serving a compiled model bundle (serve/server.py bundle mode): the
artifact's programs run behind the same batchers/shed/metrics as a
checkpoint-backed server; absent surfaces answer 400, reload is refused
(bundles are immutable)."""

import io
import json
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.serve.server import ModelService, Server
from gan_class_transfer2_tpu.train import trainer
from gan_class_transfer2_tpu.utils import bundle as bundle_lib


@pytest.fixture(scope="module")
def bundle_server(tmp_path_factory):
    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("bundles") / "diffusion")
    bundle_lib.export_bundle(cfg, state, out, platforms=("cpu",))
    service = ModelService(cfg, bundle=bundle_lib.load_bundle(out))
    srv = Server(service).start()
    yield srv, cfg, state
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


def test_bundle_healthz_and_metrics(bundle_server):
    srv, _, _ = bundle_server
    status, body = _get(srv, "/healthz")
    assert status == 200 and json.loads(body)["status"] == "ok"
    status, body = _get(srv, "/metrics")
    assert status == 200
    assert "gct2_checkpoint_step 0" in body.decode()


def test_bundle_sample_matches_checkpoint_server(bundle_server):
    """The bundle-served sample bytes equal a checkpoint-backed service's:
    same rng stream (cfg.seed+99), same program content."""
    srv, cfg, state = bundle_server
    status, body = _post(srv, "/sample", json.dumps({"num": 2}).encode())
    assert status == 200
    got = np.asarray(Image.open(io.BytesIO(body)))

    ref_service = ModelService(cfg, state=state)
    try:
        want = ref_service.sample(2)
    finally:
        ref_service.close()
    # the HTTP body is the PNG of the first image; the checkpoint service
    # quantises on device (uint8), the bundle ships floats — compare in
    # uint8 with a ±1 quantisation-boundary tolerance (device vs host
    # rounding of values straddling a bucket edge)
    from gan_class_transfer2_tpu.serve.server import _to_uint8

    first = _to_uint8(want[0])
    np.testing.assert_allclose(
        got.astype(np.int16), first.astype(np.int16), atol=1, rtol=0
    )


def test_bundle_denoise(bundle_server):
    srv, cfg, _ = bundle_server
    arr = np.random.default_rng(0).integers(
        0, 256, (cfg.size, cfg.size, 3), dtype=np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    status, body = _post(srv, "/denoise", buf.getvalue())
    assert status == 200
    assert Image.open(io.BytesIO(body)).size == (cfg.size, cfg.size)


def test_bundle_unsupported_surfaces(bundle_server):
    srv, cfg, _ = bundle_server
    # /reload: bundles are immutable
    status, body = _post(srv, "/reload", b"")
    assert status == 400 and b"immutable" in body

    # streaming requires a checkpoint-backed server
    status, body = _post(
        srv, "/sample", json.dumps({"num": 1, "stream": True}).encode()
    )
    assert status == 400 and b"bundle" in body

    # /edit requires a checkpoint-backed server
    arr = np.zeros((cfg.size, cfg.size, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    status, body = _post(srv, "/edit", buf.getvalue())
    assert status == 400 and b"bundle" in body

    # no transfer programs in a diffusion bundle
    status, body = _post(srv, "/transfer?direction=ab", buf.getvalue())
    assert status == 400 and b"not served" in body


def test_partial_bundle_metrics_and_denoise(tmp_path):
    """Program-subset bundles must not crash the other surfaces: a
    sample-only bundle still serves /metrics (review finding: metrics_text
    dereferenced the absent denoise batcher), and a preview-only bundle
    serves denoise (finding: _params was only set under 'sample')."""
    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))

    out_s = str(tmp_path / "sample_only")
    bundle_lib.export_bundle(
        cfg, state, out_s, programs=("sample",), platforms=("cpu",)
    )
    svc = ModelService(cfg, bundle=bundle_lib.load_bundle(out_s))
    try:
        text = svc.metrics_text()
        assert 'gct2_queue_depth{batcher="sample"}' in text
        assert 'gct2_queue_depth{batcher="denoise"}' not in text
        with pytest.raises(ValueError, match="denoise not served"):
            svc.denoise(np.zeros((1, cfg.size, cfg.size, 3), np.float32))
    finally:
        svc.close()

    out_p = str(tmp_path / "preview_only")
    bundle_lib.export_bundle(
        cfg, state, out_p, programs=("preview",), platforms=("cpu",)
    )
    svc = ModelService(cfg, bundle=bundle_lib.load_bundle(out_p))
    try:
        img = np.zeros((1, cfg.size, cfg.size, 3), np.float32)
        assert svc.denoise(img).shape == (1, cfg.size, cfg.size, 3)
        with pytest.raises(ValueError, match="sampling not served"):
            svc.sample(1)
    finally:
        svc.close()


def test_bundle_service_overrides(tmp_path):
    """serve --bundle applies explicit CLI config overrides (shedding
    knobs) over the manifest's train-time config."""
    from gan_class_transfer2_tpu.serve.server import build_bundle_service

    cfg = tiny_test_config()
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    out = str(tmp_path / "b")
    bundle_lib.export_bundle(
        cfg, state, out, programs=("sample",), platforms=("cpu",)
    )
    svc = build_bundle_service(out, overrides={"serve_max_queue": 8})
    try:
        assert svc._max_queue == 8
        assert svc.cfg.serve_max_queue == 8
    finally:
        svc.close()


def test_cgan_bundle_service(tmp_path):
    from gan_class_transfer2_tpu.train import conditional_gan as cgan_lib

    cfg = tiny_test_config(num_classes=3)
    state = cgan_lib.init_conditional_gan_state(cfg, jax.random.PRNGKey(3))
    out = str(tmp_path / "cgan_bundle")
    bundle_lib.export_bundle(cfg, state, out, model="cgan", platforms=("cpu",))

    service = ModelService(cfg, bundle=bundle_lib.load_bundle(out))
    try:
        img = np.asarray(
            np.random.default_rng(1).normal(size=(1, cfg.size, cfg.size, 3)),
            dtype=np.float32,
        )
        got = service.transfer_to(img, 2)
        want = np.asarray(
            cgan_lib.transfer(cfg, state, img, np.asarray([2], np.int32))
        )
        np.testing.assert_array_equal(got, want)
        # sampling is not in a cgan bundle
        with pytest.raises(ValueError, match="not served"):
            service.sample(1)
    finally:
        service.close()
