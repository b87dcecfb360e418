"""Filter bank golden tests (scipy as oracle where applicable)."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.ndimage as ndi

from multimodal_isic_tpu.ops import filters as F


@pytest.fixture
def img(rng):
    return rng.rand(32, 40).astype(np.float32) * 200


def test_square_formula(img):
    out = np.asarray(F.square_filter(jnp.asarray(img)))
    c = 1.0 / np.sqrt(np.abs(img).max())
    np.testing.assert_allclose(out, (c * img) ** 2, rtol=1e-5)
    assert out.max() == pytest.approx(np.abs(img).max(), rel=1e-5)  # range preserved


def test_squareroot_formula(img):
    signed = img - 100.0  # exercise the negative branch
    out = np.asarray(F.squareroot_filter(jnp.asarray(signed)))
    c = np.abs(signed).max()
    expected = np.where(signed >= 0, np.sqrt(c * signed.clip(0)),
                        -np.sqrt(-c * signed.clip(max=0)))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)


def test_logarithm_formula(img):
    signed = img - 50.0
    out = np.asarray(F.logarithm_filter(jnp.asarray(signed)))
    m = np.abs(signed).max()
    c = m / np.log(m + 1)
    expected = np.sign(signed) * c * np.log(np.abs(signed) + 1)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)


def test_exponential_formula(img):
    out = np.asarray(F.exponential_filter(jnp.asarray(img)))
    m = np.abs(img).max()
    expected = np.exp(np.log(m) / m * img)
    np.testing.assert_allclose(out, expected, rtol=1e-4)
    assert out.max() == pytest.approx(m, rel=1e-4)  # e^(c·max) = max


def test_gradient_matches_numpy(img):
    out = np.asarray(F.gradient_filter(jnp.asarray(img)))
    gy, gx = np.gradient(img)  # central differences, edge-aware
    inner = np.sqrt(gx ** 2 + gy ** 2)
    np.testing.assert_allclose(out[1:-1, 1:-1], inner[1:-1, 1:-1], rtol=1e-4)


@pytest.mark.parametrize("sigma", [1.0, 2.0, 3.0])
def test_log_matches_scipy_gaussian_laplace(img, sigma):
    out = np.asarray(F.log_filter(jnp.asarray(img), sigma))
    expected = ndi.gaussian_laplace(img.astype(np.float64), sigma,
                                    mode="mirror", truncate=4.0)
    np.testing.assert_allclose(out, expected, rtol=2e-3, atol=2e-3 * np.abs(expected).max())


def test_wavelet_filters_are_qmf():
    lo = np.asarray(F.COIF1_DEC_LO)
    hi = np.asarray(F.COIF1_DEC_HI)
    assert lo.sum() == pytest.approx(np.sqrt(2), abs=1e-9)
    assert hi.sum() == pytest.approx(0.0, abs=1e-9)
    assert (lo ** 2).sum() == pytest.approx(1.0, abs=1e-6)
    assert np.dot(lo, hi) == pytest.approx(0.0, abs=1e-9)


def test_wavelet_energy_conservation(img):
    """Orthogonal QMF pair: the 4 undecimated subbands carry 4x the energy."""
    bands = F.wavelet_coif1_swt(jnp.asarray(img))
    assert set(bands) == {"wavelet-LL", "wavelet-LH", "wavelet-HL", "wavelet-HH"}
    total = sum(float((np.asarray(v) ** 2).sum()) for v in bands.values())
    assert total == pytest.approx(4 * (img.astype(np.float64) ** 2).sum(), rel=1e-4)


def test_wavelet_constant_image():
    """DC goes entirely to LL (scaled by 2 per axis), detail bands vanish."""
    img = jnp.full((16, 16), 5.0)
    bands = F.wavelet_coif1_swt(img)
    np.testing.assert_allclose(np.asarray(bands["wavelet-LL"]), 10.0, rtol=1e-5)
    for k in ("wavelet-LH", "wavelet-HL", "wavelet-HH"):
        np.testing.assert_allclose(np.asarray(bands[k]), 0.0, atol=1e-5)


def test_filter_bank_has_all_13_types(img):
    bank = F.filter_bank(jnp.asarray(img))
    assert len(bank) == 13
    for name in ["original", "wavelet-LL", "wavelet-LH", "wavelet-HL",
                 "wavelet-HH", "log-sigma-1-0-mm-3D", "log-sigma-2-0-mm-3D",
                 "log-sigma-3-0-mm-3D", "square", "squareroot", "logarithm",
                 "exponential", "gradient"]:
        assert name in bank, name
        assert bank[name].shape == img.shape
