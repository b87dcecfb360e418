"""Pallas GLCM kernel ≡ XLA reference formulation (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from multimodal_isic_tpu.ops import texture as T
from multimodal_isic_tpu.ops.pallas_glcm import glcm_matrices_pallas


def _case(rng, h, w, vmax=120):
    img = rng.randint(0, vmax, (h, w)).astype(np.float32)
    mask = np.zeros((h, w), np.uint8)
    mask[h // 6: h - 2, w // 8: w - 3] = 255
    mask[h // 2: h // 2 + 2, w // 2: w // 2 + 4] = 0  # hole
    return img, mask


def test_pallas_glcm_matches_xla(rng):
    img, mask = _case(rng, 40, 56)
    lv, n, _ = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    expected = np.asarray(T.glcm_matrices(lv, jnp.asarray(mask)))
    got = np.asarray(glcm_matrices_pallas(lv, jnp.asarray(mask), interpret=True))
    np.testing.assert_allclose(got, expected)


def test_pallas_glcm_non_tile_aligned(rng):
    # H not a multiple of the 16-row block, W needing lane padding
    img, mask = _case(rng, 37, 130)
    lv, n, _ = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    expected = np.asarray(T.glcm_matrices(lv, jnp.asarray(mask)))
    got = np.asarray(glcm_matrices_pallas(lv, jnp.asarray(mask), interpret=True))
    np.testing.assert_allclose(got, expected)


def test_pallas_glcm_empty_mask(rng):
    img = rng.rand(32, 32).astype(np.float32)
    mask = np.zeros((32, 32), np.uint8)
    lv = jnp.zeros((32, 32), jnp.int32)
    got = np.asarray(glcm_matrices_pallas(lv, jnp.asarray(mask), interpret=True))
    assert got.sum() == 0
