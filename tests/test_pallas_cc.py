"""Equivalence of the VMEM-resident Pallas connected-components kernel
(`ops.pallas_cc`) with the XLA hooking formulation, in interpret mode.

The kernel backs GLSZM zone labeling in the production radiomics bundle
(reference behavior: pyradiomics' C flood fill behind the glszm class,
``RadiomicExtractor.py:38-48``).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_isic_tpu.ops import texture as T
from multimodal_isic_tpu.ops import texture_extra as X
from multimodal_isic_tpu.ops.pallas_cc import connected_components_pallas
from tests.test_texture import _case, np_discretize


@pytest.mark.parametrize("hw", [(14, 13), (45, 60), (64, 129)])
def test_pallas_cc_matches_xla(rng, hw):
    h, w = hw
    img, mask = _case(rng, h=h, w=w, vmax=30)
    lv_np, _ = np_discretize(img, mask, 10.0)
    lv = jnp.asarray(lv_np, jnp.int32)
    ins = jnp.asarray(mask) > 0
    ref = np.asarray(X.connected_components(lv, ins))
    got = np.asarray(connected_components_pallas(lv, ins, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_cc_serpentine():
    """Boustrophedon snake: long geodesic, alternating direction every row —
    the case line-sweep propagation must iterate on (one sweep resolves only
    one bend).  Must come back as exactly one zone."""
    h, w = 40, 41
    levels = np.ones((h, w), np.int32) * 2
    snake = np.zeros((h, w), bool)
    for r in range(0, h, 2):
        snake[r, :] = True
    for r in range(1, h, 2):
        snake[r, w - 1 if (r // 2) % 2 == 0 else 0] = True
    levels[snake] = 7
    lv = jnp.asarray(levels)
    ins = jnp.ones((h, w), bool)
    label = np.asarray(connected_components_pallas(lv, jnp.asarray(ins),
                                                   interpret=True))
    snake_labels = np.unique(label[snake])
    assert snake_labels.size == 1
    assert int(snake.sum()) == int((label == snake_labels[0]).sum())
    ref = np.asarray(X.connected_components(lv, jnp.asarray(ins)))
    np.testing.assert_array_equal(label, ref)


def test_pallas_cc_edge_rois(rng):
    # empty ROI: every label is the out-of-ROI sentinel h*w
    lv = jnp.zeros((16, 24), jnp.int32)
    ins = jnp.zeros((16, 24), bool)
    out = np.asarray(connected_components_pallas(lv, ins, interpret=True))
    assert (out == 16 * 24).all()
    # full single-level ROI: one zone rooted at linear index 0
    lv = jnp.ones((16, 24), jnp.int32)
    ins = jnp.ones((16, 24), bool)
    out = np.asarray(connected_components_pallas(lv, ins, interpret=True))
    assert (out == 0).all()


def test_glszm_pallas_path_matches_xla_path(rng):
    img, mask = _case(rng, h=30, w=33, vmax=40)
    lv_np, n_lv = np_discretize(img, mask, 10.0)
    lv = jnp.asarray(lv_np, jnp.int32)
    m = jnp.asarray(mask)
    base = X.glszm_features(lv, m, jnp.int32(n_lv), use_pallas=False)
    # route the pallas branch through interpret mode on CPU
    import multimodal_isic_tpu.ops.pallas_cc as pcc
    orig = pcc.connected_components_pallas

    def interp(levels, inside, max_sweeps=1024):
        return orig(levels, inside, max_sweeps=max_sweeps, interpret=True)

    pcc.connected_components_pallas = interp
    try:
        fast = X.glszm_features(lv, m, jnp.int32(n_lv), use_pallas=True)
    finally:
        pcc.connected_components_pallas = orig
    for k in base:
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(base[k]),
                                   rtol=1e-6, err_msg=k)
