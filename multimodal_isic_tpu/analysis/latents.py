"""Latent statistics over patch-token axes.

``concat_patch_moments`` reproduces the reference's per-image latent summary
(``utils.py:16-31``): mean, max, biased std, median, skew and excess kurtosis
over the patch axis of a (B, N, D) latent, concatenated to (B, 6·D).
"""

from __future__ import annotations

import jax.numpy as jnp


def concat_patch_moments(latent: jnp.ndarray, eps: float = 1e-6,
                         unbiased: bool = False) -> jnp.ndarray:
    """(B, N, D) → (B, 6·D): [mean | max | std | median | skew | kurtosis]."""
    mean = latent.mean(axis=1)
    maxv = latent.max(axis=1)
    ddof = 1 if unbiased else 0
    std = latent.std(axis=1, ddof=ddof)
    # torch.median returns the LOWER middle element for even N (N=196 here),
    # unlike numpy's midpoint average — match the torch semantics.
    n = latent.shape[1]
    median = jnp.sort(latent, axis=1)[:, (n - 1) // 2, :]
    centered = latent - mean[:, None, :]
    m3 = (centered ** 3).mean(axis=1)
    m4 = (centered ** 4).mean(axis=1)
    sigma = jnp.maximum(std, eps)
    skew = m3 / (sigma ** 3)
    kurtosis = m4 / (sigma ** 4) - 3.0
    return jnp.concatenate([mean, maxv, std, median, skew, kurtosis], axis=1)
