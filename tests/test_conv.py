"""Conv primitive tests: TF-semantics parity via pre-generated goldens
(tests/golden/conv_golden.npz, produced offline by tf.nn ops) and
lax-vs-shuffle implementation equivalence."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from gan_class_transfer2_tpu.ops import conv

GOLDEN = np.load(
    os.path.join(os.path.dirname(__file__), "golden", "conv_golden.npz")
)


def test_conv2d_matches_tf_same_stride2():
    y = conv.conv2d(
        jnp.asarray(GOLDEN["x"]),
        jnp.asarray(GOLDEN["k_conv"]),
        jnp.asarray(GOLDEN["b_conv"]),
        stride=2,
    )
    np.testing.assert_allclose(np.asarray(y), GOLDEN["y_conv"], atol=1e-4)


def test_conv2d_matches_tf_same_stride1_k3():
    y = conv.conv2d(
        jnp.asarray(GOLDEN["x"]),
        jnp.asarray(GOLDEN["k3"]),
        jnp.asarray(GOLDEN["b3"]),
        stride=1,
    )
    np.testing.assert_allclose(np.asarray(y), GOLDEN["y_conv3"], atol=1e-4)


def test_conv2d_matches_tf_odd_input():
    y = conv.conv2d(
        jnp.asarray(GOLDEN["x7"]), jnp.asarray(GOLDEN["k_conv"]), stride=2
    )
    np.testing.assert_allclose(np.asarray(y), GOLDEN["y_conv7"], atol=1e-4)


def test_conv2d_transpose_matches_tf():
    # TF stores convT kernels (kh, kw, out, in); ours are dataflow HWIO.
    k = jnp.asarray(GOLDEN["k_convt_tf"]).transpose(0, 1, 3, 2)
    y = conv.conv2d_transpose(
        jnp.asarray(GOLDEN["x"]), k, jnp.asarray(GOLDEN["b_convt"]), stride=2
    )
    np.testing.assert_allclose(np.asarray(y), GOLDEN["y_convt"], atol=1e-4)


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 4, 4, 7)])
def test_transpose_shuffle_equals_lax(shape, rng):
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(4, 4, shape[-1], 6)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    y_ref = conv.conv2d_transpose(x, k, b, stride=2, relu=True)
    y_fast = conv.conv2d_transpose_shuffle(x, k, b, relu=True)
    assert y_fast.shape == y_ref.shape == (shape[0], shape[1] * 2, shape[2] * 2, 6)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref), atol=1e-4)


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 4, 4, 7)])
def test_down_shuffle_equals_lax(shape, rng):
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(4, 4, shape[-1], 6)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    y_ref = conv.conv2d(x, k, b, stride=2, relu=True)
    y_fast = conv.conv2d_down_shuffle(x, k, b, relu=True)
    assert y_fast.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref), atol=1e-4)


def test_space_depth_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv.depth_to_space(conv.space_to_depth(x, 2), 2)),
        np.asarray(x),
    )


def test_dense(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 7)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    y = conv.dense(x, k, b)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) @ np.asarray(k) + np.asarray(b), atol=1e-5
    )


def test_convt_custom_vjp_matches_autodiff():
    """The hand-written transposed-conv adjoint (no activation reverses —
    see ops/conv._convt_core) must match autodiff of the raw lowering."""
    import jax
    import jax.numpy as jnp

    from gan_class_transfer2_tpu.ops import conv as C

    r = np.random.default_rng(3)
    x = jnp.asarray(r.normal(size=(2, 6, 4, 5)).astype(np.float32))
    k = jnp.asarray(r.normal(size=(4, 4, 5, 7)).astype(np.float32))
    b = jnp.asarray(r.normal(size=(7,)).astype(np.float32))

    def f_custom(x, k, b):
        return jnp.sum(C.conv2d_transpose(x, k, b, stride=2, relu=True) ** 2)

    def f_raw(x, k, b):
        y = C._convt_raw(x, k, 2) + b
        return jnp.sum(jax.nn.relu(y) ** 2)

    v1, g1 = jax.value_and_grad(f_custom, argnums=(0, 1, 2))(x, k, b)
    v2, g2 = jax.value_and_grad(f_raw, argnums=(0, 1, 2))(x, k, b)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-4, rtol=1e-5)


def test_pallas_down_conv_interpret_matches_lax():
    """Fused down-conv kernel (ops/pallas_conv.py): fwd + all grads match
    the lax strided conv (CPU interpret mode; no PRNG involved)."""
    import jax
    import jax.numpy as jnp

    from gan_class_transfer2_tpu.ops import conv as C
    from gan_class_transfer2_tpu.ops import pallas_conv as PC

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 16, 16, 128)).astype(np.float32))
    k = jnp.asarray((r.normal(size=(4, 4, 128, 256)) * 0.05).astype(np.float32))
    b = jnp.asarray(r.normal(size=(256,)).astype(np.float32))
    assert PC.supported(x.shape, k.shape)

    y1 = PC.down_conv_fused(x, k, b, True, True)
    y2 = C.conv2d(x, k, b, stride=2, relu=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    g1 = jax.grad(lambda x, k, b: jnp.sum(
        PC.down_conv_fused(x, k, b, True, True) ** 2), argnums=(0, 1, 2))(x, k, b)
    g2 = jax.grad(lambda x, k, b: jnp.sum(
        C.conv2d(x, k, b, stride=2, relu=True) ** 2), argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-4)


def test_pallas_down_conv_supported_gate():
    from gan_class_transfer2_tpu.ops import pallas_conv as PC

    assert not PC.supported((2, 256, 256, 3), (4, 4, 3, 128))  # stem: C=3
    assert not PC.supported((2, 8, 8, 512), (4, 4, 512, 512))  # bottleneck
    assert PC.supported((2, 128, 128, 128), (4, 4, 128, 256))


def test_shuffle_impl_rejects_odd_spatial_dims():
    """The space-to-depth reformulation's fixed pad (1,1) differs from
    TF-SAME's (1,2) on odd inputs — it must refuse instead of silently
    computing different math (review r4)."""
    import pytest as _pytest

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(1, 7, 7, 4)), jnp.float32)
    k = jnp.asarray(r.normal(size=(4, 4, 4, 8)), jnp.float32)
    with _pytest.raises(ValueError, match="even spatial"):
        conv.conv2d_down_shuffle(x, k)


def test_pallas_supported_gate_matches_tile_choice():
    """supported() must mirror the kernel's actual ntile selection: the old
    `o % min(o, 256)` gate admitted (c=256, o=192), whose grid left output
    channels 128-191 uninitialized (review r4)."""
    from gan_class_transfer2_tpu.ops import pallas_conv

    assert not pallas_conv.supported((1, 16, 16, 256), (4, 4, 256, 192))
    assert pallas_conv.supported((1, 16, 16, 256), (4, 4, 256, 256))
    assert pallas_conv.supported((1, 16, 16, 128), (4, 4, 128, 256))
