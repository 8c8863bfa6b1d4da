"""Class-conditional sampling through the serving tier (BASELINE config 5
surface): /sample {"class": k} routes a per-sample class vector through the
coalescing batcher into one mixed-class device batch.
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.serve.server import ModelService, Server
from gan_class_transfer2_tpu.train import trainer


@pytest.fixture(scope="module")
def cond_server():
    cfg = tiny_test_config(num_classes=3)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    service = ModelService(cfg, state=state)
    srv = Server(service).start()
    yield srv, cfg
    srv.stop()


def _post(srv, path, data):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=data
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_conditional_sample(cond_server):
    srv, _ = cond_server
    status, body = _post(srv, "/sample", json.dumps({"num": 1, "class": 2}).encode())
    assert status == 200
    assert body[:4] == b"\x89PNG"


def test_class_out_of_range_rejected(cond_server):
    srv, _ = cond_server
    status, body = _post(srv, "/sample", json.dumps({"num": 1, "class": 7}).encode())
    assert status == 400
    assert "class" in json.loads(body)["error"]


def test_class_on_unconditional_rejected():
    cfg = tiny_test_config()  # num_classes=0
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    srv = Server(ModelService(cfg, state=state)).start()
    try:
        status, body = _post(
            srv, "/sample", json.dumps({"num": 1, "class": 0}).encode()
        )
        assert status == 400
        assert "unconditional" in json.loads(body)["error"]
    finally:
        srv.stop()


def test_conditional_stream(cond_server):
    """stream + class must produce class-conditioned frames (not silently
    fall back to class 0) and bad classes must fail BEFORE the multipart
    header goes out (clean JSON 400, no corrupt 200)."""
    srv, _ = cond_server
    status, body = _post(
        srv, "/sample",
        json.dumps({"num": 1, "stream": True, "segments": 2, "class": 1}).encode(),
    )
    assert status == 200
    assert body.count(b"Content-Type: image/png") == 2
    status, body = _post(
        srv, "/sample",
        json.dumps({"num": 1, "stream": True, "class": 9}).encode(),
    )
    assert status == 400
    assert "class" in json.loads(body)["error"]


def test_conditional_edit(cond_server):
    """/edit with a class: the invert and decode stages condition on it;
    the class vector tiles across the stacked edit candidates."""
    import io

    from PIL import Image

    srv, cfg = cond_server
    arr = np.zeros((cfg.size, cfg.size, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    status, body = _post(srv, "/edit?edits=shift&class=2", buf.getvalue())
    assert status == 200
    assert sorted(json.loads(body)) == ["reconstruction", "shift"]
    status, body = _post(srv, "/edit?edits=shift&class=5", buf.getvalue())
    assert status == 400


def test_mixed_classes_coalesce_into_one_batch(cond_server):
    """Concurrent requests for different classes must share ONE device call
    with the right per-sample class vector."""
    srv, _ = cond_server
    service = srv.service
    seen = []
    orig = service._batcher._run

    def probe(num, classes=None):
        seen.append((num, None if classes is None else classes.copy()))
        return orig(num, classes)

    service._batcher._run = probe
    try:
        results = [None, None]

        def worker(i, k):
            results[i] = _post(
                srv, "/sample", json.dumps({"num": 2, "class": k}).encode()
            )

        t1 = threading.Thread(target=worker, args=(0, 1))
        t2 = threading.Thread(target=worker, args=(1, 2))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert all(r[0] == 200 for r in results)
        assert len(seen) <= 2
        if len(seen) == 1:  # fully coalesced: classes concatenated in order
            num, classes = seen[0]
            assert num == 4
            assert sorted(classes.tolist()) == [1, 1, 2, 2]
    finally:
        service._batcher._run = orig
