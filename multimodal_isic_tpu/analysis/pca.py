"""On-device PCA (sklearn-equivalent semantics).

Replaces the reference's sklearn ``PCA(n_components=0.90, whiten=False)``
(``save_latent.py:159-181``, ``utils.py:61``): fit = eigendecomposition of the
feature covariance on TPU (D×D ``eigh`` — D=768 here, far smaller than N), with
the fractional-variance component selection rule and deterministic sign
convention (largest-|loading| coordinate positive) so transforms are
reproducible across runs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


class PCAState(NamedTuple):
    mean: jnp.ndarray            # [D]
    components: jnp.ndarray      # [K, D]
    explained_variance: jnp.ndarray        # [K]
    explained_variance_ratio: jnp.ndarray  # [K]


@jax.jit
def _fit_full(x: jnp.ndarray):
    n = x.shape[0]
    mean = x.mean(axis=0)
    xc = x - mean
    cov = (xc.T @ xc) / (n - 1)
    eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
    order = jnp.argsort(eigvals)[::-1]
    eigvals = jnp.maximum(eigvals[order], 0.0)
    components = eigvecs[:, order].T  # [D, D] rows = components
    # deterministic sign: make the max-|loading| coordinate positive
    idx = jnp.argmax(jnp.abs(components), axis=1)
    signs = jnp.sign(components[jnp.arange(components.shape[0]), idx])
    components = components * jnp.where(signs == 0, 1.0, signs)[:, None]
    ratio = eigvals / jnp.maximum(eigvals.sum(), 1e-30)
    return mean, components, eigvals, ratio


def fit(x: Union[np.ndarray, jnp.ndarray],
        n_components: Union[int, float, None] = None) -> PCAState:
    """``n_components``: int K, or a float in (0, 1) selecting the smallest K
    whose cumulative explained-variance ratio strictly exceeds it (sklearn's
    rule), or None for all."""
    x = jnp.asarray(x, jnp.float32)
    mean, components, var, ratio = _fit_full(x)
    d = components.shape[0]
    max_k = min(x.shape[0], d)
    if n_components is None:
        k = max_k
    elif isinstance(n_components, float) and 0 < n_components < 1:
        csum = np.cumsum(np.asarray(ratio))
        k = int(np.searchsorted(csum, n_components, side="right") + 1)
        k = min(k, max_k)
    else:
        k = min(int(n_components), max_k)
    return PCAState(mean, components[:k], var[:k], ratio[:k])


def transform(state: PCAState, x) -> jnp.ndarray:
    return (jnp.asarray(x, jnp.float32) - state.mean) @ state.components.T


def inverse_transform(state: PCAState, z) -> jnp.ndarray:
    return jnp.asarray(z, jnp.float32) @ state.components + state.mean


def fit_transform(x, n_components=None):
    state = fit(x, n_components)
    return state, transform(state, x)
