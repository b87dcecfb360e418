"""The pyradiomics derived-image filter bank as jitted JAX ops.

The reference enables 12 derived images per channel (``params.yml:135-147``):
Original, Wavelet (coif1 stationary transform level 1 → LL/LH/HL/HH), LoG at
σ ∈ {1, 2, 3}, Square, SquareRoot, Logarithm, Exponential and Gradient.
Formulas follow the pyradiomics ``imageoperations`` definitions (intensity
rescaling coefficients, sign conventions); the LoG uses a truncated FIR
Gaussian-derivative kernel in place of SimpleITK's recursive IIR approximation
(sub-percent agreement at these σ).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# coif1 analysis filters (published Coiflet-6 coefficients, pywt convention)
COIF1_DEC_LO = (
    -0.01565572813546454, -0.0727326195128539, 0.38486484686420286,
    0.8525720202122554, 0.3378976624578092, -0.0727326195128539,
)
# QMF: hi[n] = (-1)^n · lo[N-1-n]
COIF1_DEC_HI = tuple(
    ((-1) ** n) * COIF1_DEC_LO[len(COIF1_DEC_LO) - 1 - n]
    for n in range(len(COIF1_DEC_LO))
)


def _conv1d_circular(img: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Circular (periodic) 1-D convolution along ``axis`` (SWT boundary mode)."""
    k = kernel.shape[0]
    half = k // 2
    x = jnp.moveaxis(img, axis, -1)
    n = x.shape[-1]
    idx = (jnp.arange(n)[:, None] + jnp.arange(k)[None, :] - half) % n
    gathered = x[..., idx]  # [..., n, k]
    out = jnp.einsum("...nk,k->...n", gathered, kernel[::-1])
    return jnp.moveaxis(out, -1, axis)


def wavelet_coif1_swt(img: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Level-1 stationary (undecimated) coif1 transform → the four subbands
    pyradiomics names wavelet-LL/LH/HL/HH.

    Subband naming follows pyradiomics/pywt ``swtn`` axis order: the first
    letter is the filter on axis 0 (rows), the second on axis 1 (columns).
    """
    lo = jnp.asarray(COIF1_DEC_LO, jnp.float32)
    hi = jnp.asarray(COIF1_DEC_HI, jnp.float32)
    row_lo = _conv1d_circular(img, lo, 0)
    row_hi = _conv1d_circular(img, hi, 0)
    return {
        "wavelet-LL": _conv1d_circular(row_lo, lo, 1),
        "wavelet-LH": _conv1d_circular(row_lo, hi, 1),
        "wavelet-HL": _conv1d_circular(row_hi, lo, 1),
        "wavelet-HH": _conv1d_circular(row_hi, hi, 1),
    }


def _gauss_kernels(sigma: float, order0: bool) -> jnp.ndarray:
    radius = max(1, int(math.ceil(4.0 * sigma)))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    if order0:
        return g
    # second derivative of the (normalized) gaussian
    return g * ((x ** 2 - sigma ** 2) / sigma ** 4)


def log_filter(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Laplacian of Gaussian: ∂²G/∂x² * G_y + G_x * ∂²G/∂y² (separable FIR),
    reflect boundary, σ in pixels (spacing 1)."""
    g = _gauss_kernels(sigma, order0=True)
    d2 = _gauss_kernels(sigma, order0=False)

    def conv(x, kernel, axis):
        k = kernel.shape[0]
        pad = [(0, 0), (0, 0)]
        pad[axis] = (k // 2, k // 2)
        xp = jnp.pad(x, pad, mode="reflect")
        moved = jnp.moveaxis(xp, axis, -1)
        n = img.shape[axis]
        idx = jnp.arange(n)[:, None] + jnp.arange(k)[None, :]
        gathered = moved[..., idx]
        out = jnp.einsum("...nk,k->...n", gathered, kernel[::-1])
        return jnp.moveaxis(out, -1, axis)

    dxx = conv(conv(img, d2, 1), g, 0)
    dyy = conv(conv(img, g, 1), d2, 0)
    return dxx + dyy


def square_filter(img: jnp.ndarray) -> jnp.ndarray:
    """f = (c·x)², c = 1/√(max|x|): squared intensities rescaled to range."""
    m = jnp.maximum(jnp.max(jnp.abs(img)), 1e-30)
    coeff = 1.0 / jnp.sqrt(m)
    return (coeff * img) ** 2


def squareroot_filter(img: jnp.ndarray) -> jnp.ndarray:
    """f = √(c·x) for x ≥ 0, −√(−c·x) for x < 0, c = max|x|."""
    c = jnp.max(jnp.abs(img))
    return jnp.where(img >= 0, jnp.sqrt(jnp.maximum(c * img, 0.0)),
                     -jnp.sqrt(jnp.maximum(-c * img, 0.0)))


def logarithm_filter(img: jnp.ndarray) -> jnp.ndarray:
    """f = sign(x)·c·log(|x| + 1), c = max|x| / log(max|x| + 1)."""
    m = jnp.max(jnp.abs(img))
    c = jnp.where(m > 0, m / jnp.log(m + 1.0), 1.0)
    return jnp.sign(img) * c * jnp.log(jnp.abs(img) + 1.0)


def exponential_filter(img: jnp.ndarray) -> jnp.ndarray:
    """f = e^(c·x), c = log(max|x|) / max|x|."""
    m = jnp.max(jnp.abs(img))
    c = jnp.where(m > 0, jnp.log(jnp.maximum(m, 1e-30)) / jnp.maximum(m, 1e-30), 1.0)
    return jnp.exp(c * img)


def gradient_filter(img: jnp.ndarray) -> jnp.ndarray:
    """Gradient magnitude via central differences (edge-replicated), the
    SimpleITK GradientMagnitude convention at spacing 1."""
    xp = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    dy = (xp[2:, 1:-1] - xp[:-2, 1:-1]) / 2.0
    dx = (xp[1:-1, 2:] - xp[1:-1, :-2]) / 2.0
    return jnp.sqrt(dx ** 2 + dy ** 2)


def filter_bank(img: jnp.ndarray,
                log_sigmas: Tuple[float, ...] = (1.0, 2.0, 3.0)) -> Dict[str, jnp.ndarray]:
    """All 13 derived images of the reference configuration (wavelet = 4 subbands), keyed by the
    pyradiomics image-type prefix used in feature column names."""
    out = {"original": img}
    out.update(wavelet_coif1_swt(img))
    for s in log_sigmas:
        name = f"log-sigma-{str(s).replace('.', '-')}-mm-3D"
        out[name] = log_filter(img, s)
    out["square"] = square_filter(img)
    out["squareroot"] = squareroot_filter(img)
    out["logarithm"] = logarithm_filter(img)
    out["exponential"] = exponential_filter(img)
    out["gradient"] = gradient_filter(img)
    return out
