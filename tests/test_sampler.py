"""Sampler tests: scan loops match a step-by-step python reference, edits
behave per spec (reference train.py:323-496)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.config import tiny_test_config
from gan_class_transfer2_tpu.core import diffusion
from gan_class_transfer2_tpu.models import unet
from gan_class_transfer2_tpu.ops import image as image_ops
from gan_class_transfer2_tpu.sample import sampler


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    r = np.random.default_rng(0)
    image = jnp.asarray(r.uniform(-1, 1, (1, cfg.size, cfg.size, 3)), jnp.float32)
    return cfg, params, image


def _python_invert(cfg, params, image):
    """Eager re-implementation of the reference inversion loop
    (train.py:364-413) as an oracle for the scan version."""
    x_theta, epsilon_theta = image, image
    for t in range(1, cfg.steps + 1):
        fake = diffusion.renoise(cfg, x_theta, epsilon_theta, float(t))
        pred = unet.unet_apply(
            cfg, params, fake, jnp.full((1,), t, jnp.int32)
        ).astype(jnp.float32)
        x_theta, epsilon_theta = diffusion.step_update(
            cfg, pred, fake, epsilon_theta, float(t)
        )
    return x_theta, epsilon_theta


def test_invert_matches_python_loop(setup):
    cfg, params, image = setup
    x_scan, e_scan = jax.jit(lambda p, x: sampler.invert(cfg, p, x))(params, image)
    x_ref, e_ref = _python_invert(cfg, params, image)
    np.testing.assert_allclose(np.asarray(x_scan), np.asarray(x_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(e_scan), np.asarray(e_ref), atol=1e-4)


def test_sample_shapes_and_snapshots(setup):
    cfg, params, image = setup
    batch = jnp.concatenate([image] * 3, 0)
    result = jax.jit(lambda p, b: sampler.sample(cfg, p, b))(params, batch)
    assert result.images.shape == batch.shape
    assert result.snapshots.shape == (4,) + batch.shape
    # snapshots are filled (t=T is the first iteration, always hit)
    assert np.abs(np.asarray(result.snapshots[0])).max() > 0


def test_preview_rmse_finite(setup):
    cfg, params, image = setup
    noise = jnp.asarray(
        np.random.default_rng(1).normal(size=image.shape), jnp.float32
    )
    denoised, rmse = sampler.preview(cfg, params, image, noise)
    assert denoised.shape == image.shape
    assert np.isfinite(float(rmse))


def test_edit_noise_assembles_batch(setup):
    cfg, params, image = setup
    eps = image
    dictionary = jnp.asarray(
        np.random.default_rng(2).normal(
            size=(cfg.size, cfg.size, 2**cfg.bits_per_pixel, 3)
        ),
        jnp.float32,
    )
    extra = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, cfg.size, cfg.size, 3)),
        jnp.float32,
    )
    batch = sampler.edit_noise(cfg, eps, dictionary, extra)
    # [2 noise, eps, pixelated, shifted, quantised] (reference train.py:432-434)
    assert batch.shape == (6, cfg.size, cfg.size, 3)
    np.testing.assert_array_equal(np.asarray(batch[:2]), np.asarray(extra))
    np.testing.assert_array_equal(np.asarray(batch[2]), np.asarray(eps[0]))


def test_vq_quantise_picks_nearest():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 4, 4, 3)), jnp.float32)
    dictionary = jnp.asarray(r.normal(size=(4, 4, 8, 3)), jnp.float32)
    q = image_ops.vq_quantise(x, dictionary)
    # brute-force check one pixel
    d = np.asarray(dictionary)[1, 2]  # (8,3)
    xv = np.asarray(x)[0, 1, 2]
    best = d[np.argmin(((d - xv) ** 2).sum(-1))]
    np.testing.assert_allclose(np.asarray(q)[0, 1, 2], best, rtol=1e-6)


def test_pixelate_roundtrip_shape():
    x = jnp.ones((1, 16, 16, 3))
    y = image_ops.upsample_nearest(image_ops.avg_pool(x, 4), 4)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))


def test_eval_fn_end_to_end(setup):
    cfg, params, image = setup
    noise = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, cfg.size, cfg.size, 3)),
        jnp.float32,
    )
    dictionary = jnp.asarray(
        np.random.default_rng(2).normal(
            size=(cfg.size, cfg.size, 2**cfg.bits_per_pixel, 3)
        ),
        jnp.float32,
    )
    out = sampler.make_eval_fn(cfg)(params, image, noise, dictionary)
    assert set(out) == {
        "denoised", "example_loss", "fake",
        "step_1", "step_0.75", "step_0.5", "step_0.25",
    }
    assert out["fake"].shape == (6, cfg.size, cfg.size, 3)
    assert np.isfinite(float(out["example_loss"]))


def test_edit_image_api(setup):
    """User-facing invert→edit→decode workflow (reference train.py:364-496)."""
    cfg, params, image = setup
    out = sampler.edit_image(cfg, params, image, ("pixelate", "shift"))
    assert set(out) == {"reconstruction", "pixelate", "shift"}
    for v in out.values():
        assert v.shape == image.shape
    assert not np.allclose(
        np.asarray(out["pixelate"]), np.asarray(out["shift"])
    )


def test_eval_fn_is_batched():
    """make_eval_fn accepts B>1 examples: one program evals several images
    (VERDICT r1 next #6 — the reference hardcodes B=1, train.py:305)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_class_transfer2_tpu.config import tiny_test_config
    from gan_class_transfer2_tpu.models import unet
    from gan_class_transfer2_tpu.sample import sampler

    cfg = tiny_test_config(steps=3)
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    r = np.random.default_rng(0)
    B = 3
    examples = jnp.asarray(r.uniform(-1, 1, (B, cfg.size, cfg.size, 3)).astype(np.float32))
    noise = jnp.asarray(r.normal(size=(2, cfg.size, cfg.size, 3)).astype(np.float32))
    dictionary = jnp.asarray(
        r.normal(size=(cfg.size, cfg.size, 2**cfg.bits_per_pixel, 3)).astype(np.float32)
    )
    out = sampler.make_eval_fn(cfg)(params, examples, noise, dictionary)
    assert out["denoised"].shape == (B, cfg.size, cfg.size, 3)
    assert out["fake"].shape == (2 + 4 * B, cfg.size, cfg.size, 3)
    assert np.isfinite(float(out["example_loss"]))


def test_sample_stride_subset_sampling(setup):
    """cfg.sample_stride > 1 visits every stride-th timestep (DDIM-style
    subset); stride 1 is the exact reference loop. Snapshots still populate
    at the nearest visited timestep."""
    import numpy as np

    cfg, params, _ = setup
    import jax.numpy as jnp

    r = np.random.default_rng(0)
    init = jnp.asarray(
        r.normal(size=(2, cfg.size, cfg.size, 3)).astype(np.float32)
    )
    full = sampler.sample(cfg, params, init)
    strided = sampler.sample(cfg.replace(sample_stride=3), params, init)
    assert strided.images.shape == full.images.shape
    assert np.isfinite(np.asarray(strided.images)).all()
    # every snapshot slot was written (nonzero) despite the stride
    snaps = np.asarray(strided.snapshots)
    assert all(np.abs(snaps[i]).sum() > 0 for i in range(4))
    # both are x-hat estimates of the same process: correlated, not equal
    a = np.asarray(full.images).ravel()
    b = np.asarray(strided.images).ravel()
    assert not np.allclose(a, b)
    assert np.corrcoef(a, b)[0, 1] > 0.5
    # extreme stride (= steps, one visited timestep): snapshots must STILL
    # all populate (mapped to the lowest visited t — review r3 finding)
    extreme = sampler.sample(cfg.replace(sample_stride=cfg.steps), params, init)
    snaps = np.asarray(extreme.snapshots)
    assert all(np.abs(snaps[i]).sum() > 0 for i in range(4))


def test_sample_stride_validation():
    import pytest as _pytest

    from gan_class_transfer2_tpu.config import tiny_test_config

    with _pytest.raises(ValueError, match="sample_stride"):
        tiny_test_config(sample_stride=0)
    with _pytest.raises(ValueError, match="sample_stride"):
        tiny_test_config(steps=4, sample_stride=9)


def test_sample_stream_honours_stride(setup):
    """sampler.sample_stream must visit the same subset schedule as
    sample() under cfg.sample_stride (ADVICE r2: the module-level helper
    ignored the stride while the serving path re-derived it)."""
    cfg, params, _ = setup
    cfg = cfg.replace(sample_stride=3)
    init = jax.random.normal(
        jax.random.PRNGKey(5), (2, cfg.size, cfg.size, 3), jnp.float32
    )
    direct = np.asarray(sampler.sample(cfg, params, init).images)
    *_, last = sampler.sample_stream(cfg, params, init, segments=3)
    np.testing.assert_allclose(np.asarray(last), direct, rtol=1e-5, atol=1e-5)


def test_sample_timesteps_single_definition():
    from gan_class_transfer2_tpu.config import tiny_test_config

    cfg = tiny_test_config(steps=10, sample_stride=4)
    assert list(sampler.sample_timesteps(cfg)) == [10, 6, 2]
    assert list(sampler.sample_timesteps(cfg.replace(sample_stride=1))) == list(
        range(10, 0, -1)
    )


def test_sample_snapshots_false_matches_images(setup):
    """The snapshot-free fast path (serving/metric samplers) must produce
    bit-identical images — only the carried buffer differs (review r4)."""
    cfg, params, image = setup
    batch = jnp.concatenate([image, -image], 0)
    full = sampler.sample(cfg, params, batch)
    fast = sampler.sample(cfg, params, batch, snapshots=False)
    assert fast.snapshots is None
    np.testing.assert_array_equal(
        np.asarray(full.images), np.asarray(fast.images)
    )


def test_edit_image_rejects_unknown_edit(setup):
    cfg, params, image = setup
    with pytest.raises(ValueError, match="unknown edits"):
        sampler.edit_image(cfg, params, image, edits=("quantize",))


def test_edit_image_batched_blocks(setup):
    """edit_image on a B=2 batch must return each edit's B rows — the old
    row indexing returned image 1's reconstruction as 'pixelate' etc.
    (review r4). Each batched row must equal the corresponding B=1 call."""
    cfg, params, image = setup
    two = jnp.concatenate([image, -image], 0)
    dictionary = jax.random.normal(
        jax.random.PRNGKey(3),
        (cfg.size, cfg.size, 2**cfg.bits_per_pixel, 3),
        jnp.float32,
    )
    batched = sampler.edit_image(
        cfg, params, two, edits=("pixelate", "shift"), dictionary=dictionary
    )
    for b in range(2):
        single = sampler.edit_image(
            cfg, params, two[b : b + 1], edits=("pixelate", "shift"),
            dictionary=dictionary,
        )
        for name, v in single.items():
            assert batched[name].shape[0] == 2
            np.testing.assert_allclose(
                np.asarray(batched[name][b]), np.asarray(v[0]), atol=1e-5
            )
