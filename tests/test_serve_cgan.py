"""Conditional-GAN serving (serve --model cgan): /transfer?to=K routes a
per-sample target-class vector through a coalescing batcher, so concurrent
requests for DIFFERENT target classes still share one device batch.
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
from gan_class_transfer2_tpu.serve.server import ModelService, Server
from gan_class_transfer2_tpu.train import conditional_gan as cgan_lib


@pytest.fixture(scope="module")
def cgan_server():
    cfg = tiny_test_config(num_classes=3)
    state = cgan_lib.init_conditional_gan_state(cfg, jax.random.PRNGKey(0))
    service = ModelService(cfg, cgan_state=state)
    srv = Server(service).start()
    yield srv, cfg
    srv.stop()


def _png_body(cfg):
    arr = np.random.default_rng(0).integers(
        0, 256, (cfg.size, cfg.size, 3), dtype=np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _post(srv, path, data):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=data
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_transfer_to_class(cgan_server):
    srv, cfg = cgan_server
    status, body = _post(srv, "/transfer?to=2", _png_body(cfg))
    assert status == 200
    assert Image.open(io.BytesIO(body)).size == (cfg.size, cfg.size)
    # different targets give different generator outputs
    _, b1 = _post(srv, "/transfer?to=1", _png_body(cfg))
    assert b1 != body


def test_transfer_to_out_of_range(cgan_server):
    srv, cfg = cgan_server
    status, body = _post(srv, "/transfer?to=9", _png_body(cfg))
    assert status == 400
    assert "target" in json.loads(body)["error"]


def test_cycle_direction_on_cgan_rejected(cgan_server):
    srv, cfg = cgan_server
    status, body = _post(srv, "/transfer?direction=ab", _png_body(cfg))
    assert status == 400
    assert "GAN" in json.loads(body)["error"]


def test_healthz_on_cgan(cgan_server):
    srv, _ = cgan_server
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/healthz") as r:
        assert json.loads(r.read())["status"] == "ok"


def test_mixed_targets_coalesce(cgan_server):
    srv, cfg = cgan_server
    service = srv.service
    seen = []
    orig = service._cgan_batcher._targeted_run

    def probe(imgs, targets):
        seen.append(sorted(targets.tolist()))
        return orig(imgs, targets)

    service._cgan_batcher._targeted_run = probe
    try:
        results = [None, None]

        def worker(i, k):
            results[i] = _post(srv, f"/transfer?to={k}", _png_body(cfg))

        t1 = threading.Thread(target=worker, args=(0, 1))
        t2 = threading.Thread(target=worker, args=(1, 2))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert all(r[0] == 200 for r in results)
        assert len(seen) <= 2
        if len(seen) == 1:
            assert seen[0] == [1, 2]
    finally:
        service._cgan_batcher._targeted_run = orig
