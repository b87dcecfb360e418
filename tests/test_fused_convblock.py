"""Fused ConvBlock-front Pallas kernel (ops.fused_convblock): equivalence
against the unfused ConvBlock first half (LN → 1×1 → keep-mask → depthwise
5×5 → GELU → 1×1 → residual), forward and gradients, with and without the
masked-pretraining keep mask.

Covers the r5 kernel addition attacking the ConvMAE train step's remaining
trace-identified hot ops (reference hot loop ``train_ae.py:163-175``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_isic_tpu.ops.fused_convblock import (_reference_front,
                                                     fused_front)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _params(rng, c):
    return dict(
        ls=jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32)),
        lb=jnp.asarray(0.1 * rng.randn(c).astype(np.float32)),
        w1=jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05),
        b1=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
        wd=jnp.asarray(rng.randn(5, 5, c).astype(np.float32) * 0.2),
        bd=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
        w2=jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05),
        b2=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
    )


@pytest.mark.parametrize("hw", [(8, 8), (14, 6)])  # t divides h, w != h
@pytest.mark.parametrize("with_keep", [False, True])
def test_fused_front_matches_reference_forward(rng, hw, with_keep):
    b, (h, w), c = 2, hw, 128
    p = _params(rng, c)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    keep = (jnp.asarray((rng.rand(b, h, w, 1) > 0.4).astype(np.float32))
            if with_keep else None)
    got = fused_front(x, p["ls"], p["lb"], p["w1"], p["b1"], p["wd"],
                      p["bd"], p["w2"], p["b2"], keep, interpret=True)
    want = _reference_front(x, p["ls"], p["lb"], p["w1"], p["b1"], p["wd"],
                            p["bd"], p["w2"], p["b2"], keep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_front_bf16_close_to_reference(rng):
    b, h, w, c = 2, 8, 8, 128
    p = {k: v.astype(jnp.bfloat16) for k, v in _params(rng, c).items()}
    x = jnp.asarray(rng.randn(b, h, w, c)).astype(jnp.bfloat16)
    got = fused_front(x, p["ls"], p["lb"], p["w1"], p["b1"], p["wd"],
                      p["bd"], p["w2"], p["b2"], None, interpret=True)
    want = _reference_front(x, p["ls"], p["lb"], p["w1"], p["b1"], p["wd"],
                            p["bd"], p["w2"], p["b2"], None)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def _tiny_aligned_mae(**kw):
    from multimodal_isic_tpu.models.convmae import ConvMAE
    return ConvMAE(img_size=32, embed_dims=(128, 128, 128), depths=(1, 1, 1),
                   num_heads=4, decoder_dim=128, decoder_depth=1,
                   decoder_heads=4, **kw)


def test_convmae_fused_front_forward_and_grads_match(rng):
    """Same params, fused-front vs unfused conv stages: identical encoder
    output and matching train grads — incl. masked pretraining, where the
    keep mask rides inside the kernel."""
    from multimodal_isic_tpu.models.convmae import ConvMAE

    base = _tiny_aligned_mae()
    fused = _tiny_aligned_mae(use_fused_front=True)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    params = base.init({"params": jax.random.PRNGKey(0)}, imgs,
                       mask_ratio=0.0)["params"]

    lat0, _, _ = base.apply({"params": params}, imgs, mask_ratio=0.0,
                            method=ConvMAE.forward_encoder)
    lat1, _, _ = fused.apply({"params": params}, imgs, mask_ratio=0.0,
                             method=ConvMAE.forward_encoder)
    np.testing.assert_allclose(np.asarray(lat1), np.asarray(lat0),
                               rtol=2e-4, atol=2e-5)

    def loss(model, p):
        out = model.apply({"params": p}, imgs, mask_ratio=0.5,
                          rng=jax.random.PRNGKey(3))
        return out[0]

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(fused, p))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def test_fused_front_gradients_match_reference(rng):
    b, h, w, c = 1, 8, 8, 128
    p = _params(rng, c)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    keep = jnp.asarray((rng.rand(b, h, w, 1) > 0.4).astype(np.float32))
    args = (x, p["ls"], p["lb"], p["w1"], p["b1"], p["wd"], p["bd"],
            p["w2"], p["b2"], keep)

    def loss_fused(*a):
        return (fused_front(*a, interpret=True) ** 2).mean()

    def loss_ref(*a):
        return (_reference_front(*a) ** 2).mean()

    g_fused = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)
