"""Serving operations surface: /metrics counters and /reload hot-swap.

Production-serving behaviors the reference never had: a Prometheus-format
counter endpoint, and reloading the latest checkpoint into a LIVE server
(training keeps writing checkpoints; serving picks them up without a
restart or recompilation — the jitted programs take params as arguments).
"""

import json
import urllib.request

import jax
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.serve.server import ModelService, Server
from gan_class_transfer2_tpu.train import trainer
from gan_class_transfer2_tpu.train.loop import Runner


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
        return r.status, r.read()


def _post(srv, path, data=b""):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=data
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _dataset(cfg):
    r = np.random.default_rng(0)
    from gan_class_transfer2_tpu.data.pipeline import ArrayDataset

    imgs = r.uniform(-1, 1, (8, cfg.size, cfg.size, 3)).astype(np.float32)
    return ArrayDataset(imgs, cfg.batch_size, seed=0)


def test_reload_picks_up_new_checkpoint(tmp_path):
    cfg = tiny_test_config(
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        checkpoint_every=3,
        donate_state=False,
        mesh_data=1,
    )
    runner = Runner(cfg, dataset=_dataset(cfg))
    runner.fit(epochs=1, steps_per_epoch=3, log_samples=False)
    runner.close()

    from gan_class_transfer2_tpu.utils import checkpoint as ckpt_lib

    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    state = ckpt_lib.restore(cfg.checkpoint_dir, state)
    srv = Server(ModelService(cfg, state=state)).start()
    try:
        assert json.loads(_get(srv, "/healthz")[1])["step"] == 3

        # training continues in the background: 3 more steps → step 6
        runner2 = Runner(cfg, dataset=_dataset(cfg))
        runner2.fit(epochs=1, steps_per_epoch=3, log_samples=False)
        runner2.close()

        status, body = _post(srv, "/reload")
        assert status == 200
        assert json.loads(body)["step"] == 6
        assert json.loads(_get(srv, "/healthz")[1])["step"] == 6
    finally:
        srv.stop()


def test_reload_without_checkpoint_dir_rejected():
    cfg = tiny_test_config(checkpoint_dir=None)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    srv = Server(ModelService(cfg, state=state)).start()
    try:
        status, body = _post(srv, "/reload")
        assert status == 400
        assert "checkpoint" in json.loads(body)["error"]
    finally:
        srv.stop()


def test_metrics_counters(tmp_path):
    cfg = tiny_test_config(checkpoint_dir=None)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    srv = Server(ModelService(cfg, state=state)).start()
    try:
        _post(srv, "/sample", json.dumps({"num": 1}).encode())
        status, body = _get(srv, "/metrics")
        assert status == 200
        text = body.decode()
        metrics = {
            line.split()[0]: float(line.split()[1])
            for line in text.splitlines()
            if line and not line.startswith("#")
        }
        assert metrics["gct2_requests_sample"] >= 1
        assert metrics["gct2_device_batches"] >= 1
        assert "gct2_checkpoint_step" in metrics
        assert metrics["gct2_reloads"] == 0
    finally:
        srv.stop()
