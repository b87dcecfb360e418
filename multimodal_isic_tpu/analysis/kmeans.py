"""On-device k-means (k-means++ init, Lloyd iterations under lax.scan).

The BASELINE.json latent-clustering backbone: replaces the reference's
cuML UMAP+HDBSCAN GPU stage (``cluster_latents.py:26-35``) for the cluster
statistics pipeline (purity analysis operates on any hard assignment).
Distances via the ‖x‖²−2x·c+‖c‖² matmul expansion → MXU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class KMeansState(NamedTuple):
    centers: jnp.ndarray  # [K, D]
    inertia: jnp.ndarray  # scalar
    n_iter: jnp.ndarray


def _pairwise_sq(x, c):
    x2 = (x ** 2).sum(1)[:, None]
    c2 = (c ** 2).sum(1)[None, :]
    # true-f32 matmul: the TPU MXU default precision rounds −2x·cᵀ at ~0.4%
    # of the squared magnitude, which misassigns points between nearby
    # centroids (see analysis/ann.py::_EXACT for the measured failure)
    return jnp.maximum(
        x2 - 2.0 * jnp.matmul(x, c.T, precision=jax.lax.Precision.HIGHEST)
        + c2, 0.0)


def _kmeanspp_init(key, x, k):
    n = x.shape[0]
    first = jax.random.randint(key, (), 0, n)
    centers0 = jnp.tile(x[first], (k, 1))

    def body(i, carry):
        key, centers = carry
        key, sub = jax.random.split(key)
        d2 = _pairwise_sq(x, centers)
        mask = jnp.arange(k)[None, :] < i
        dmin = jnp.min(jnp.where(mask, d2, jnp.inf), axis=1)
        probs = dmin / jnp.maximum(dmin.sum(), 1e-30)
        nxt = jax.random.choice(sub, n, p=probs)
        return key, centers.at[i].set(x[nxt])

    _, centers = jax.lax.fori_loop(1, k, body, (key, centers0))
    return centers


@partial(jax.jit, static_argnames=("k", "max_iters"))
def fit(key: jax.Array, x: jnp.ndarray, k: int, max_iters: int = 100,
        tol: float = 1e-4) -> Tuple[KMeansState, jnp.ndarray]:
    """→ (state, labels [N]).  Empty clusters re-seeded to the farthest point."""
    x = jnp.asarray(x, jnp.float32)
    centers = _kmeanspp_init(key, x, k)

    def step(carry, _):
        centers, prev_shift = carry
        d2 = _pairwise_sq(x, centers)
        labels = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
        counts = onehot.sum(0)
        sums = onehot.T @ x
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # re-seed empties at the globally farthest point
        far = x[jnp.argmax(jnp.min(d2, axis=1))]
        new_centers = jnp.where((counts > 0)[:, None], new_centers, far[None, :])
        shift = ((new_centers - centers) ** 2).sum()
        return (new_centers, shift), shift

    (centers, _), shifts = jax.lax.scan(step, (centers, jnp.inf), None,
                                        length=max_iters)
    d2 = _pairwise_sq(x, centers)
    labels = jnp.argmin(d2, axis=1)
    inertia = jnp.min(d2, axis=1).sum()
    n_iter = jnp.sum(shifts > tol)
    return KMeansState(centers, inertia, n_iter), labels


def predict(state: KMeansState, x) -> jnp.ndarray:
    return jnp.argmin(_pairwise_sq(jnp.asarray(x, jnp.float32), state.centers), axis=1)


def fit_best_of(key: jax.Array, x, k: int, n_init: int = 4,
                max_iters: int = 100) -> Tuple[KMeansState, jnp.ndarray]:
    """vmapped multi-restart, keep the lowest-inertia run (sklearn n_init)."""
    keys = jax.random.split(key, n_init)
    states, labels = jax.vmap(lambda s: fit(s, x, k, max_iters))(keys)
    best = jnp.argmin(states.inertia)
    pick = lambda t: jax.tree_util.tree_map(lambda v: v[best], t)
    return pick(states), labels[best]
