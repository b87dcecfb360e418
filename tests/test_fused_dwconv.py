"""Fused MBConv serving kernels (ops.fused_dwconv): equivalence against the
unfused formulation, standalone and inside the BN-folded EfficientNet.

Covers the r4 kernel addition: [expand 1×1 → silu →] depthwise K×K → silu →
SE global pool in one VMEM-resident Pallas pass for the serving forward
(re-creating ``efficientnet_pytorch``'s MBConv stage used at reference
``model.py:58``).  All kernels run in interpret mode on the CPU mesh; the
real-chip path is exercised by bench.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_isic_tpu.models.efficientnet import EfficientNet, fold_batchnorm
from multimodal_isic_tpu.ops.depthwise import depthwise_conv2d
from multimodal_isic_tpu.ops.fused_dwconv import (dw_silu_pool,
                                                  expand_dw_silu_pool,
                                                  fits_pallas_dw,
                                                  fits_pallas_expand_dw,
                                                  pick_row_tile_dw,
                                                  pick_row_tile_expand_dw)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize("k,h,w,c,t", [(3, 13, 13, 40, None),
                                       (5, 9, 11, 24, None),
                                       (3, 12, 13, 40, 4),   # 3 row tiles
                                       (5, 15, 9, 24, 5)])   # 3 row tiles
def test_dw_silu_pool_matches_unfused(rng, k, h, w, c, t):
    x = jnp.asarray(rng.randn(3, h, w, c), jnp.float32)
    wd = jnp.asarray(rng.randn(k, k, 1, c) * 0.2, jnp.float32)
    bd = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    y, pool = dw_silu_pool(x, wd, bd, row_tile=t, interpret=True)
    ref = jax.nn.silu(depthwise_conv2d(x, wd) + bd)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pool),
                               np.asarray(ref.mean(axis=(1, 2))),
                               rtol=1e-5, atol=1e-5)
    assert pool.dtype == jnp.float32


@pytest.mark.parametrize("k,h,w,cin,cmid,t", [(3, 13, 13, 32, 192, None),
                                              (5, 9, 11, 48, 288, None),
                                              (3, 12, 13, 32, 192, 4),
                                              (5, 15, 9, 16, 96, 3)])
def test_expand_dw_silu_pool_matches_unfused(rng, k, h, w, cin, cmid, t):
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    we = jnp.asarray(rng.randn(1, 1, cin, cmid) * 0.1, jnp.float32)
    be = jnp.asarray(rng.randn(cmid) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.randn(k, k, 1, cmid) * 0.2, jnp.float32)
    bd = jnp.asarray(rng.randn(cmid) * 0.1, jnp.float32)
    y, pool = expand_dw_silu_pool(x, we, be, wd, bd, row_tile=t,
                                  interpret=True)
    e = jax.nn.silu(jnp.einsum("bhwc,cd->bhwd", x, we[0, 0]) + be)
    ref = jax.nn.silu(depthwise_conv2d(e, wd) + bd)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pool),
                               np.asarray(ref.mean(axis=(1, 2))),
                               rtol=1e-5, atol=1e-5)


def test_expand_dw_bf16_matches_loosely(rng):
    x = jnp.asarray(rng.randn(2, 13, 13, 32), jnp.bfloat16)
    we = jnp.asarray(rng.randn(1, 1, 32, 192) * 0.1, jnp.bfloat16)
    be = jnp.asarray(rng.randn(192) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.randn(3, 3, 1, 192) * 0.2, jnp.bfloat16)
    bd = jnp.asarray(rng.randn(192) * 0.1, jnp.float32)
    y, pool = expand_dw_silu_pool(x, we, be, wd, bd, interpret=True)
    assert y.dtype == jnp.bfloat16 and pool.dtype == jnp.float32
    e = jax.nn.silu(jnp.einsum("bhwc,cd->bhwd", x, we[0, 0])
                    + be.astype(jnp.bfloat16))
    ref = jax.nn.silu(depthwise_conv2d(e, wd) + bd.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=0.1)


def test_dispatch_rules():
    # stride-2 never fuses
    assert not fits_pallas_dw(95, 95, 64, 3, 2, jnp.bfloat16)
    assert not fits_pallas_expand_dw(95, 95, 32, 192, 3, 2, jnp.bfloat16)
    # B3@380 serving geometry: the 95² stage-2 repeat blocks fit via row
    # tiling (95 = 19 tiles of 5 rows under the padded-VMEM model) ...
    t95 = pick_row_tile_expand_dw(95, 95, 32, 192, 3, 1, jnp.bfloat16)
    assert t95 is not None and 95 % t95 == 0 and t95 < 95
    # ... and every deeper stride-1 stage fits too
    for h, cin, cmid, k in [(48, 48, 288, 5), (24, 96, 576, 3),
                            (24, 136, 816, 5), (12, 232, 1392, 5),
                            (12, 232, 2304, 3)]:
        t = pick_row_tile_expand_dw(h, h, cin, cmid, k, 1, jnp.bfloat16)
        assert t is not None and h % t == 0, (h, cin, cmid, k)
    # the 24²-spatial stages fit whole-image (single row tile)
    assert pick_row_tile_expand_dw(12, 12, 232, 1392, 5, 1,
                                   jnp.bfloat16) == 12
    # the 190² expand-less stage-1 blocks exceed the VMEM budget even with
    # row tiling: the RESIDENT row-padded input alone (lane pad 24→128,
    # double-buffered) is ~19 MB — these stay on XLA (the r4 whole-image
    # kernel OOMed scoped VMEM at 44.6 MB exactly here)
    assert not fits_pallas_dw(190, 190, 24, 3, 1, jnp.bfloat16)
    assert not fits_pallas_dw(190, 190, 40, 3, 1, jnp.bfloat16)


def test_folded_efficientnet_pallas_equivalence(rng):
    """BN-folded B0 with pallas_serving routes fitting blocks through the
    fused kernels and must match the XLA folded graph; the param tree is
    unchanged (fold_batchnorm output loads directly)."""
    name = "efficientnet-b0"
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    base = EfficientNet(model_name=name)
    vs = base.init(jax.random.PRNGKey(0), x, train=False)
    folded = fold_batchnorm(vs["params"], vs["batch_stats"], name)
    # perturb so activations are non-trivial (fresh-init folded outputs are
    # ~1e-7 scale, which would make the comparison vacuous)
    folded = jax.tree_util.tree_map(
        lambda p: p + jnp.asarray(rng.randn(*p.shape) * 0.05, p.dtype), folded)
    m0 = EfficientNet(model_name=name, bn_folded=True)
    m1 = EfficientNet(model_name=name, bn_folded=True, pallas_serving=True)
    y0 = m0.apply({"params": folded}, x, train=False)
    y1 = m1.apply({"params": folded}, x, train=False)
    assert float(jnp.abs(y0).max()) > 1e-3  # non-vacuous
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    # init under pallas_serving yields the identical tree
    vs1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(vs1["params"])
            == jax.tree_util.tree_structure(folded))
