"""End-to-end class-conditional diffusion training (BASELINE config 5)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.data.pipeline import ArrayDataset, LabeledDataset
from gan_class_transfer2_tpu.sample import sampler
from gan_class_transfer2_tpu.train import trainer


def test_conditional_train_step_and_sampling():
    cfg = tiny_test_config(num_classes=3, donate_state=False)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    assert "embed" in state.params
    step = trainer.make_train_step(cfg)
    r = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            r.uniform(-1, 1, (cfg.batch_size, cfg.size, cfg.size, 3)), jnp.float32
        ),
        "label": jnp.asarray([0, 2], jnp.int32),
    }
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # conditional sampling: different classes give different samples
    init = jnp.asarray(
        r.normal(size=(2, cfg.size, cfg.size, 3)).astype(np.float32)
    )
    s0 = sampler.sample(cfg, state.params, init, class_idx=jnp.asarray([0, 0]))
    s1 = sampler.sample(cfg, state.params, init, class_idx=jnp.asarray([1, 1]))
    assert not np.allclose(np.asarray(s0.images), np.asarray(s1.images))


def test_labeled_dataset_round_robin():
    r = np.random.default_rng(0)
    mk = lambda seed: ArrayDataset(
        r.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8), 2, seed=seed
    )
    ds = LabeledDataset([mk(0), mk(1), mk(2)])
    it = iter(ds)
    labels = [next(it)["label"][0] for _ in range(6)]
    assert labels == [0, 1, 2, 0, 1, 2]
    b = next(it)
    assert b["image"].shape == (2, 8, 8, 3)
    assert b["label"].shape == (2,)


def test_unconditional_batch_still_accepted():
    cfg = tiny_test_config(num_classes=3, donate_state=False)
    state = trainer.init_state(cfg, jax.random.PRNGKey(0))
    step = trainer.make_train_step(cfg)
    batch = jnp.zeros((cfg.batch_size, cfg.size, cfg.size, 3))
    state, loss = step(state, batch, jax.random.PRNGKey(1))  # defaults class 0
    assert np.isfinite(float(loss))


def test_runner_auto_labels_multiclass(tmp_path):
    """Runner wraps per-class datasets into labeled batches when
    num_classes > 0 (conditional diffusion through the real driver)."""
    import numpy as np
    from PIL import Image

    from gan_class_transfer2_tpu.train.loop import Runner

    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    cfg = tiny_test_config(
        num_classes=2,
        classes=(str(tmp_path / "a" / "*.png"), str(tmp_path / "b" / "*.png")),
        steps_per_epoch=2,
        epochs=1,
        log_dir=str(tmp_path / "logs"),
        checkpoint_dir=None,
        mesh_data=1,
    )
    runner = Runner(cfg)
    runner.fit(epochs=1, steps_per_epoch=2, log_samples=False)
    runner.close()
    assert int(runner.state.step) == 2
    assert "embed" in runner.state.params  # conditional model was built


def test_conditional_transfer_fid_heldout(tmp_path):
    """Per-class-pair FID on held-out eval sets (same hygiene as GANRunner)."""
    import numpy as np
    from PIL import Image as PILImage

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.train.conditional_gan_loop import (
        ConditionalGANRunner,
    )
    from gan_class_transfer2_tpu.utils import tensorboard as tb

    r = np.random.default_rng(0)
    patterns = []
    for cls in range(2):
        d = tmp_path / f"c{cls}"
        d.mkdir()
        for i in range(8):
            arr = r.integers(0, 256, (20, 20, 3), dtype=np.uint8)
            PILImage.fromarray(arr).save(d / f"{i}.png")
        patterns.append(str(d / "*.png"))

    cfg = tiny_test_config(
        classes=tuple(patterns), num_classes=2, fid_samples=3,
        steps_per_epoch=1, epochs=1, learning_rate=1e-4,
        log_dir=str(tmp_path / "logs"), checkpoint_dir=None,
        donate_state=False, mesh_data=1, native_loader=False,
    )
    runner = ConditionalGANRunner(cfg)
    try:
        assert runner._eval_sets and len(runner._eval_sets) == 2
        assert runner._eval_sets[0].shape[0] == 3
        fid = runner.transfer_fid(0, 1)
        assert fid is not None and np.isfinite(fid)
        runner.fit(epochs=1, steps_per_epoch=1)
        tags = {e[1] for e in tb.read_events(runner.writer.path)}
        assert "transfer_fid_0_to_1" in tags, tags
        assert "transfer_fid_1_to_0" in tags
    finally:
        runner.close()


def test_cli_cgan_train_then_eval(tmp_path, capsys):
    """`gct2 cgan-train` then `gct2 eval --model cgan` re-scores every
    class pair's transfer FID from the inherited checkpoint config."""
    import json

    import numpy as np
    from PIL import Image as PILImage

    from gan_class_transfer2_tpu import cli

    r = np.random.default_rng(0)
    patterns = []
    for cls in range(2):
        d = tmp_path / f"c{cls}"
        d.mkdir()
        for i in range(6):
            arr = r.integers(0, 256, (20, 20, 3), dtype=np.uint8)
            PILImage.fromarray(arr).save(d / f"{i}.png")
        patterns.append(str(d / "*.png"))

    ckpt = str(tmp_path / "ckpt")
    rc = cli.main([
        "cgan-train", "--platform", "cpu",
        "--classes", *patterns, "--num-classes", "2",
        "--size", "16", "--pixel-size", "4", "--max-size", "8",
        "--octaves", "2", "--steps", "4", "--batch-size", "2",
        "--warm-up", "0", "--fused-diffusion", "false",
        "--fid-samples", "2", "--native-loader", "false", "--mesh-data", "1",
        "--steps-per-epoch", "2", "--epochs", "1",
        "--log-dir", str(tmp_path / "logs"), "--checkpoint-dir", ckpt,
        "--checkpoint-every", "2",
    ])
    assert rc == 0
    capsys.readouterr()

    rc = cli.main(["eval", "--model", "cgan", "--platform", "cpu",
                   "--checkpoint-dir", ckpt])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["step"] == 2
    for k in ("transfer_fid_0_to_1", "transfer_fid_1_to_0"):
        assert np.isfinite(out[k]) and out[k] >= 0
