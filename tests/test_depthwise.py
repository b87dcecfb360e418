"""Depthwise conv custom VJP vs XLA's native grouped-conv autodiff.

The op must be numerically identical to ``lax.conv_general_dilated`` with
``feature_group_count=C`` in BOTH the forward and the gradients — the custom
VJP only changes how the weight gradient is computed (K² shifted
multiply-reduces instead of the dense [K,K,C,C] filter-grad conv that XLA
materialises, measured 67 s/device/step for EfficientNet-B3's widest stage).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from multimodal_isic_tpu.ops.depthwise import (
    DepthwiseConv, depthwise_conv2d, same_pads)


def _ref(x, w, stride, padding):
    return lax.conv_general_dilated(
        x, w, (stride, stride), padding, feature_group_count=w.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("k,stride,h,w_,c,padding", [
    (3, 1, 8, 8, 4, "SAME"),
    (3, 2, 9, 7, 4, "SAME"),   # odd sizes + stride: asymmetric SAME pads
    (5, 1, 12, 12, 3, "SAME"),
    (5, 2, 16, 16, 6, "SAME"),
    (3, 1, 8, 8, 4, "VALID"),
    (3, 2, 11, 11, 2, "VALID"),
])
def test_depthwise_matches_xla_forward_and_grads(k, stride, h, w_, c, padding):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w_, c).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 1, c).astype(np.float32))

    out = depthwise_conv2d(x, w, stride=stride, padding=padding)
    ref = _ref(x, w, stride, padding)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)

    def loss_new(x, w):
        return jnp.sum(jnp.sin(depthwise_conv2d(x, w, stride, padding)))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(_ref(x, w, stride, padding)))

    gx, gw = jax.grad(loss_new, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-5,
                               atol=1e-5)


def test_depthwise_vjp_backend_switch_both_paths_agree():
    """use_custom_vjp=None resolves per backend (custom on CPU, XLA-native on
    TPU — measured 712 vs 516 img/s for the B3 train step); forcing either
    path must give identical grads."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 10, 10, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 1, 5).astype(np.float32))

    def loss(force):
        return jax.grad(lambda xx, ww: jnp.sum(jnp.sin(
            depthwise_conv2d(xx, ww, 1, "SAME", use_custom_vjp=force))),
            argnums=(0, 1))(x, w)

    (gx_c, gw_c), (gx_n, gw_n) = loss(True), loss(False)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_n),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_n),
                               rtol=1e-5, atol=1e-5)


def test_same_pads_matches_lax():
    for n in (7, 8, 15, 64):
        for k in (3, 5):
            for s in (1, 2):
                x = jnp.ones((1, n, n, 1))
                w = jnp.ones((k, k, 1, 1))
                ref = _ref(x, w, s, "SAME")
                out = _ref(x, w, s, (same_pads(n, k, s), same_pads(n, k, s)))
                np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_depthwise_module_matches_nn_conv():
    """DepthwiseConv must have the same param tree, init, and output as the
    nn.Conv(feature_group_count=C) it replaces (checkpoint compatibility)."""
    import flax.linen as nn

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 10, 10, 6).astype(np.float32))
    old = nn.Conv(6, (5, 5), padding="SAME", feature_group_count=6)
    new = DepthwiseConv(6, (5, 5), padding="SAME")
    vo = old.init(jax.random.PRNGKey(7), x)
    vn = new.init(jax.random.PRNGKey(7), x)
    assert jax.tree_util.tree_structure(vo) == jax.tree_util.tree_structure(vn)
    for a, b in zip(jax.tree_util.tree_leaves(vo),
                    jax.tree_util.tree_leaves(vn)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(old.apply(vo, x)),
                               np.asarray(new.apply(vo, x)), rtol=1e-6,
                               atol=1e-6)


def test_depthwise_bf16_grads_finite_and_close():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 4)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 1, 4)).astype(jnp.bfloat16)
    gx, gw = jax.grad(
        lambda x, w: jnp.sum(depthwise_conv2d(x, w).astype(jnp.float32)),
        argnums=(0, 1))(x, w)
    assert gw.dtype == jnp.bfloat16
    rw = jax.grad(
        lambda w: jnp.sum(_ref(x.astype(jnp.float32),
                               w, 1, "SAME")))(w.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(gw, dtype=np.float32),
                               np.asarray(rw), rtol=5e-2, atol=1e-2)
    assert np.all(np.isfinite(np.asarray(gx, dtype=np.float32)))
