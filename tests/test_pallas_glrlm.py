"""Equivalence of the VMEM-resident 4-angle GLRLM run-bookkeeping kernel
(`ops.pallas_glrlm`) with `texture.run_starts_and_lengths`, interpret mode."""

import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_isic_tpu.ops.texture import ANGLES_2D, run_starts_and_lengths
from multimodal_isic_tpu.ops.pallas_glrlm import glrlm_runs_pallas, unpack_runs
from tests.test_texture import _case, np_discretize


@pytest.mark.parametrize("hw", [(14, 13), (45, 60), (40, 129)])
def test_runs_kernel_matches_xla(rng, hw):
    h, w = hw
    img, mask = _case(rng, h=h, w=w, vmax=30)
    lv_np, _ = np_discretize(img, mask, 10.0)
    lv = jnp.asarray(lv_np, jnp.int32)
    ins = jnp.asarray(mask) > 0
    packed = glrlm_runs_pallas(lv, ins, interpret=True)
    for a, (dy, dx) in enumerate(ANGLES_2D):
        start, gray, length = run_starts_and_lengths(lv, ins, dy, dx)
        ps, pg, plen = unpack_runs(packed[a])
        np.testing.assert_array_equal(np.asarray(ps), np.asarray(start))
        sm = np.asarray(start)
        np.testing.assert_array_equal(np.asarray(pg)[sm],
                                      np.asarray(gray)[sm])
        np.testing.assert_array_equal(np.asarray(plen)[sm],
                                      np.asarray(length)[sm])


def test_glrlm_features_pallas_path_matches_xla(rng):
    """The full feature path through the runs kernel + MXU histogram equals
    the XLA formulation (all 16 features)."""
    import multimodal_isic_tpu.ops.pallas_glrlm as pg
    import multimodal_isic_tpu.ops.pallas_hist as ph
    from multimodal_isic_tpu.ops import texture as T

    img, mask = _case(rng, h=24, w=31, vmax=40)
    lv_np, n_lv = np_discretize(img, mask, 10.0)
    lv = jnp.asarray(lv_np, jnp.int32)
    m = jnp.asarray(mask)
    base = T.glrlm_features(lv, m, jnp.int32(n_lv), 64, use_pallas=False)

    orig_runs, orig_hist = pg.glrlm_runs_pallas, ph.joint_histogram_pallas
    pg.glrlm_runs_pallas = lambda l, i: orig_runs(l, i, interpret=True)
    ph.joint_histogram_pallas = (
        lambda a, b, na, nb: orig_hist(a, b, na, nb, interpret=True))
    try:
        fast = T.glrlm_features(lv, m, jnp.int32(n_lv), 64, use_pallas=True)
    finally:
        pg.glrlm_runs_pallas, ph.joint_histogram_pallas = orig_runs, orig_hist
    for k in base:
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(base[k]),
                                   rtol=1e-6, err_msg=k)
