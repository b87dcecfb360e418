"""Fused conv-MLP Pallas kernel (ops.fused_mlp): equivalence against the
unfused formulation, standalone and inside ConvMAE's conv stages.

Covers the r3 kernel addition: Conv_3 → GELU → Conv_4 with the 4× expansion
VMEM-resident (re-creating the reference ConvMAE conv blocks' MLP math,
``/root/reference/train_ae.py:24-25`` external repo)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_isic_tpu.ops.fused_mlp import (_reference_ln_mlp,
                                               _reference_mlp, fused_ln_mlp,
                                               fused_mlp)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_fused_mlp_matches_reference_forward(rng):
    m, c, f, c2 = 300, 128, 256, 128  # M deliberately not a block multiple
    x = jnp.asarray(rng.randn(m, c).astype(np.float32))
    w1 = jnp.asarray(rng.randn(c, f).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(f, c2).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(c2).astype(np.float32) * 0.1)
    got = fused_mlp(x, w1, b1, w2, b2, interpret=True)
    want = _reference_mlp(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_mlp_rejects_unaligned_dims(rng):
    x = jnp.zeros((8, 100))
    w1 = jnp.zeros((100, 256))
    with pytest.raises(AssertionError, match="lane-aligned"):
        fused_mlp(x, w1, jnp.zeros(256), jnp.zeros((256, 100)),
                  jnp.zeros(100), interpret=True)


def test_fused_mlp_gradients_match_reference(rng):
    m, c, f = 64, 128, 256
    x = jnp.asarray(rng.randn(m, c).astype(np.float32))
    w1 = jnp.asarray(rng.randn(c, f).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(f, c).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)

    def loss_fused(args):
        return jnp.sum(fused_mlp(*args, interpret=True) ** 2)

    def loss_ref(args):
        return jnp.sum(_reference_mlp(*args) ** 2)

    gf = jax.grad(loss_fused)((x, w1, b1, w2, b2))
    gr = jax.grad(loss_ref)((x, w1, b1, w2, b2))
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_ln_mlp_matches_flax_layernorm_plus_mlp(rng):
    """The fully-fused variant must match nn.LayerNorm → MLP → residual:
    the reference formulation is itself asserted against flax first."""
    import flax.linen as nn

    m, c, f = 300, 128, 256
    x = jnp.asarray(rng.randn(m, c).astype(np.float32))
    ls = jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32))
    lb = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    w1 = jnp.asarray(rng.randn(c, f).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(f, c).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)

    ln = nn.LayerNorm()
    y = ln.apply({"params": {"scale": ls, "bias": lb}}, x)
    want_flax = x + _reference_mlp(y, w1, b1, w2, b2)
    want_ref = _reference_ln_mlp(x, ls, lb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(want_ref), np.asarray(want_flax),
                               rtol=1e-6, atol=1e-6)

    got = fused_ln_mlp(x, ls, lb, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_flax),
                               rtol=1e-5, atol=1e-5)


def test_fused_ln_mlp_gradients_match_reference(rng):
    m, c, f = 64, 128, 256
    args = (rng.randn(m, c), 1 + 0.1 * rng.randn(c), 0.1 * rng.randn(c),
            rng.randn(c, f) * 0.05, rng.randn(f) * 0.1,
            rng.randn(f, c) * 0.05, rng.randn(c) * 0.1)
    args = tuple(jnp.asarray(a.astype(np.float32)) for a in args)

    gf = jax.grad(lambda a: jnp.sum(
        fused_ln_mlp(*a, interpret=True) ** 2))(args)
    gr = jax.grad(lambda a: jnp.sum(_reference_ln_mlp(*a) ** 2))(args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def _tiny_aligned_mae(**kw):
    from multimodal_isic_tpu.models.convmae import ConvMAE
    # conv-stage dims must be lane-aligned (C and 4C multiples of 128) for
    # the fused path; heads divide d2
    return ConvMAE(img_size=32, embed_dims=(128, 128, 128), depths=(1, 1, 1),
                   num_heads=4, decoder_dim=128, decoder_depth=1,
                   decoder_heads=4, **kw)


def test_convmae_fused_mlp_forward_and_grads_match(rng):
    """Same params, fused vs unfused conv stages: identical encoder output
    and train-step gradients (recompute VJP is exact)."""
    from multimodal_isic_tpu.models.convmae import ConvMAE

    base = _tiny_aligned_mae()
    fused = _tiny_aligned_mae(use_fused_mlp=True)
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
