"""Pallas joint-histogram / GLRLM / first-order kernels ≡ XLA formulations
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from multimodal_isic_tpu.ops import texture as T
from multimodal_isic_tpu.ops.pallas_hist import (
    firstorder_accumulate_pallas, glrlm_matrix_pallas, joint_histogram_pallas,
)
from tests.test_texture import _case, np_discretize


def test_joint_histogram_matches_numpy(rng):
    a = rng.randint(0, 10, 5000)  # 0 = invalid
    b = rng.randint(0, 30, 5000)
    got = np.asarray(joint_histogram_pallas(jnp.asarray(a), jnp.asarray(b),
                                            9, 29, interpret=True))
    expected = np.zeros((9, 29))
    for ai, bi in zip(a, b):
        if ai > 0 and bi > 0:
            expected[ai - 1, bi - 1] += 1
    np.testing.assert_allclose(got, expected)


def test_glrlm_pallas_matches_xla(rng):
    img, mask = _case(rng, h=24, w=31, vmax=60)
    lv, n, _ = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    for dy, dx in T.ANGLES_2D:
        expected = np.asarray(T.glrlm_matrix_for_angle(
            lv, jnp.asarray(mask) > 0, dy, dx, 32))
        got = np.asarray(glrlm_matrix_pallas(
            lv, jnp.asarray(mask) > 0, dy, dx, 32, interpret=True))
        np.testing.assert_allclose(got, expected, err_msg=f"angle {(dy, dx)}")


def test_firstorder_accumulate_matches_numpy(rng):
    img, mask = _case(rng, h=20, w=26, vmax=200)
    lv, n_lv, _ = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    stats, hist = firstorder_accumulate_pallas(
        jnp.asarray(img), lv, interpret=True)
    stats, hist = np.asarray(stats), np.asarray(hist)

    vals = img[mask > 0].astype(np.float64)
    mu = vals.mean()
    assert stats[0] == len(vals)
    assert stats[1] == np.float32(vals.sum())
    assert stats[2] == vals.min()
    assert stats[3] == vals.max()
    np.testing.assert_allclose(stats[5], ((vals - mu) ** 2).sum(), rtol=1e-4)
    np.testing.assert_allclose(stats[6], ((vals - mu) ** 3).sum(), rtol=1e-3)
    np.testing.assert_allclose(stats[7], ((vals - mu) ** 4).sum(), rtol=1e-3)
    np.testing.assert_allclose(stats[8], np.abs(vals - mu).sum(), rtol=1e-4)

    lv_np, n_np = np_discretize(img, mask, 10.0)
    expected_hist = np.bincount(lv_np[mask > 0], minlength=T.NG + 1)[1:T.NG + 1]
    np.testing.assert_allclose(hist, expected_hist)
