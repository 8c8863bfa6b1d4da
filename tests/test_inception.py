"""InceptionV3 pool3 path (utils/inception.py) — the publication-
comparable FID embedding, exercised end-to-end with SYNTHETIC weights
(no pretrained Inception exists in this zero-egress environment; the
tests pin the architecture's shape table, the state-dict loader for both
standard formats, BN-folding numerics, and the pytorch-fid pooling
quirks that define published FID scores)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gan_class_transfer2_tpu.utils import inception, metrics


@pytest.fixture(scope="module")
def state_dict():
    return inception.synthetic_state_dict(seed=0)


@pytest.fixture(scope="module")
def npz_path(state_dict, tmp_path_factory):
    p = tmp_path_factory.mktemp("inception") / "weights.npz"
    np.savez(p, **state_dict)
    return str(p)


def test_spec_table_channel_ledger():
    """Per-stage output channels of the torchvision InceptionV3 —
    256/288/288 (A), 768 (B..C), 1280 (D), 2048 (E)."""
    s = inception.CONV_SPECS
    # InceptionA outputs: 64 + 64 + 96 + pool
    assert s["Mixed_5b.branch_pool"][1] == 32
    assert s["Mixed_5c.branch1x1"][0] == 256
    assert s["Mixed_5d.branch1x1"][0] == 288
    assert s["Mixed_6a.branch3x3"][0] == 288
    assert s["Mixed_6b.branch1x1"][0] == 768
    assert s["Mixed_6b.branch7x7_1"][1] == 128  # channels_7x7 ladder
    assert s["Mixed_6c.branch7x7_1"][1] == 160
    assert s["Mixed_6e.branch7x7_1"][1] == 192
    assert s["Mixed_7a.branch3x3_1"][0] == 768
    assert s["Mixed_7b.branch1x1"][0] == 1280
    assert s["Mixed_7c.branch1x1"][0] == 2048
    assert len(s) == 94  # 5 stem + 3*7 (A) + 4 (B) + 4*10 (C) + 6 (D) + 2*9 (E)


def test_fold_state_dict_shapes(state_dict):
    params = inception.fold_state_dict(state_dict)
    assert set(params) == set(inception.CONV_SPECS)
    for name, (cin, cout, (kh, kw), _, _) in inception.CONV_SPECS.items():
        assert params[name]["kernel"].shape == (kh, kw, cin, cout), name
        assert params[name]["bias"].shape == (cout,), name


def test_bn_folding_matches_explicit(state_dict):
    """conv→BN(eval)→relu computed explicitly must equal the folded
    scale/bias path — on the real Conv2d_1a_3x3 spec."""
    params = inception.fold_state_dict(state_dict)
    r = np.random.default_rng(1)
    x = r.normal(size=(1, 9, 9, 3)).astype(np.float32)
    got = np.asarray(inception._conv(params, "Conv2d_1a_3x3", jnp.asarray(x)))

    import jax.lax as lax

    k = np.transpose(state_dict["Conv2d_1a_3x3.conv.weight"], (2, 3, 1, 0))
    raw = np.asarray(lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    g = state_dict["Conv2d_1a_3x3.bn.weight"]
    b = state_dict["Conv2d_1a_3x3.bn.bias"]
    mu = state_dict["Conv2d_1a_3x3.bn.running_mean"]
    var = state_dict["Conv2d_1a_3x3.bn.running_var"]
    want = np.maximum(
        g * (raw - mu) / np.sqrt(var + inception.BN_EPS) + b, 0.0
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_avg_pool_count_include_pad_semantics():
    """Corner of a ones image: 4 valid cells in the 3x3 window → 1.0 when
    pad is excluded (pytorch-fid), 4/9 when included (stock torchvision)."""
    x = jnp.ones((1, 3, 3, 1))
    excl = np.asarray(inception._avg_pool_3x3_s1_p1(x, count_include_pad=False))
    incl = np.asarray(inception._avg_pool_3x3_s1_p1(x, count_include_pad=True))
    assert excl[0, 0, 0, 0] == pytest.approx(1.0)
    assert incl[0, 0, 0, 0] == pytest.approx(4.0 / 9.0)
    assert excl[0, 1, 1, 0] == pytest.approx(1.0)  # interior identical
    assert incl[0, 1, 1, 0] == pytest.approx(1.0)


def test_pool3_forward_and_variants(npz_path):
    """Full 299² forward: (N, 2048) finite features; the fid-variant
    pooling quirks (count_include_pad=False + Mixed_7c max pool) must
    change the features relative to stock-torchvision semantics."""
    params = inception.load_params(npz_path)
    r = np.random.default_rng(2)
    x = jnp.asarray(r.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    f_fid = np.asarray(inception.pool3_features(params, x, variant="fid"))
    assert f_fid.shape == (2, inception.POOL3_DIM)
    assert np.all(np.isfinite(f_fid))
    f_tv = np.asarray(
        inception.pool3_features(params, x, variant="torchvision")
    )
    assert f_tv.shape == (2, inception.POOL3_DIM)
    assert not np.allclose(f_fid, f_tv)
    with pytest.raises(ValueError, match="variant"):
        inception.pool3_features(params, x, variant="bogus")


def test_pth_and_npz_load_identically(state_dict, npz_path, tmp_path):
    """The torch .pth format (the one published weights ship in) and the
    .npz mirror must fold to identical params."""
    import torch

    pth = tmp_path / "weights.pth"
    torch.save({k: torch.from_numpy(v) for k, v in state_dict.items()}, pth)
    a = inception.load_params(str(pth))
    b = inception.load_params(npz_path)
    for name in inception.CONV_SPECS:
        np.testing.assert_array_equal(
            np.asarray(a[name]["kernel"]), np.asarray(b[name]["kernel"])
        )
        np.testing.assert_array_equal(
            np.asarray(a[name]["bias"]), np.asarray(b[name]["bias"])
        )


def test_hwio_npz_kernels_accepted(state_dict, tmp_path):
    """An .npz prepared with HWIO kernels (the JAX-native layout) loads to
    the same folded params as the torch OIHW layout."""
    hwio = dict(state_dict)
    for name in inception.CONV_SPECS:
        hwio[f"{name}.conv.weight"] = np.transpose(
            state_dict[f"{name}.conv.weight"], (2, 3, 1, 0)
        )
    p = tmp_path / "hwio.npz"
    np.savez(p, **hwio)
    a = inception.fold_state_dict(state_dict)
    b = inception.load_params(str(p))
    for name in inception.CONV_SPECS:
        np.testing.assert_allclose(
            np.asarray(a[name]["kernel"]), np.asarray(b[name]["kernel"])
        )


def test_loader_errors(state_dict, tmp_path):
    sd = dict(state_dict)
    del sd["Mixed_7c.branch_pool.bn.running_var"]
    with pytest.raises(ValueError, match="Mixed_7c.branch_pool.bn.running_var"):
        inception.fold_state_dict(sd)

    sd = dict(state_dict)
    sd["Conv2d_1a_3x3.conv.weight"] = np.zeros((32, 3, 5, 5), np.float32)
    with pytest.raises(ValueError, match="Conv2d_1a_3x3"):
        inception.fold_state_dict(sd)

    with pytest.raises(FileNotFoundError, match="inception"):
        inception.features_from_file(str(tmp_path / "nope.pth"))

    bad = tmp_path / "weights.txt"
    bad.write_text("x")
    with pytest.raises(ValueError, match="unsupported weight format"):
        inception.load_params(str(bad))


def test_get_extractor_and_kid(npz_path):
    """metrics.get_extractor('inception:<path>') end-to-end: the 2048-d
    pool3 features plug straight into the KID scorer (no 2048² sqrtm
    needed). Note the unbiased-MMD² estimator is NOT ≈0 for literally
    identical sets (its −2·k(x,y) term keeps the self-similarity diagonal
    that both within-set terms drop), so the checks here are finiteness
    and that a genuinely different set scores strictly higher."""
    ex = metrics.get_extractor(f"inception:{npz_path}")
    r = np.random.default_rng(3)
    a = r.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + r.normal(0, 0.5, a.shape), -1, 1).astype(np.float32)
    feats = np.asarray(ex(jnp.asarray(a)))
    assert feats.shape == (4, 2048)
    k_same = metrics.kid(a, a.copy(), extractor=ex)
    k_diff = metrics.kid(a, b, extractor=ex)
    assert np.isfinite(k_same) and np.isfinite(k_diff)
    assert k_diff > k_same

    ex_tv = metrics.get_extractor(f"inception-tv:{npz_path}")
    assert not np.allclose(np.asarray(ex_tv(jnp.asarray(a))), feats)


def test_params_are_jit_argument_not_constant(npz_path):
    """The ~87 MB of folded params must reach the jitted pool3 forward as
    ARGUMENTS: closure capture bakes them into the HLO as literals, which
    axon's remote-compile endpoint rejects (HTTP 413) — the same failure
    mode tests/test_device_augment.py pins for the HBM pool (r5)."""
    params = inception.load_params(npz_path)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    lowered = inception._pool3_jit.lower(params, x, "fid")
    text = lowered.as_text()
    # 94 conv layers × (kernel, bias) + the image → ≥ 100 runtime args
    assert "%arg100" in text or "arg100" in text


def test_config_accepts_inception_extractor():
    from gan_class_transfer2_tpu.config import Config

    Config(fid_extractor="inception:/some/path.pth").validate()
    Config(fid_extractor="inception-tv:/some/path.npz").validate()
    with pytest.raises(ValueError, match="fid_extractor"):
        Config(fid_extractor="inceptionv4:/x.pth").validate()
