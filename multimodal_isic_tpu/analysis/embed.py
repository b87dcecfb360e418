"""Neighbor-graph 2-D embedding and density clustering on device.

Closes the reference's cuML UMAP + HDBSCAN stage
(``/root/reference/cluster_latents.py:26-44,175-225``) with TPU-idiomatic
equivalents rather than ports:

- :func:`neighbor_embedding` — a LargeVis/UMAP-style attraction–repulsion
  layout of the kNN graph (fuzzy edge weights, student-t low-dim kernel,
  per-epoch negative sampling), optimized full-batch with Adam under one
  ``lax.scan``; supports the euclidean and cosine metrics the reference plots
  (``cluster_latents.py:175-217``).  Quality bar: trustworthiness above the
  PCA projection the round-1 build used (tested).
- :func:`density_cluster` — DBSCAN* over the HDBSCAN mutual-reachability
  graph (core distance = distance to the ``min_samples``-th neighbor), with
  connected components by min-label propagation + pointer jumping; clusters
  below ``min_cluster_size`` and low-density points become the ``-1`` noise
  label, which the purity pipeline already excludes like HDBSCAN's
  (``analysis/cluster.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import pca as PCA


def _pairwise_sq(x, y=None):
    y = x if y is None else y
    x2 = (x ** 2).sum(1)[:, None]
    y2 = (y ** 2).sum(1)[None, :]
    return jnp.maximum(x2 - 2.0 * (x @ y.T) + y2, 0.0)


@partial(jax.jit, static_argnames=("k", "metric", "block"))
def knn_graph(x: jnp.ndarray, k: int = 15, metric: str = "euclidean",
              block: int = 4096) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (nbr [N, k] indices, dist [N, k]) — self excluded.  'cosine'
    normalizes rows first (cosine distance = euclidean on the unit sphere
    up to monotone transform, which is all kNN needs).

    Rows are processed in ``block``-sized chunks under ``lax.map`` so peak
    memory is O(block·N), not O(N²) — patch-level latent tables run to
    hundreds of thousands of rows (compute is still exact O(N²·D); subsample
    or PCA first at multi-million scale)."""
    x = jnp.asarray(x, jnp.float32)
    if metric == "cosine":
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n = x.shape[0]
    kk = min(k, n - 1)
    if n <= block:
        d2 = _pairwise_sq(x)
        d2 = d2.at[jnp.arange(n), jnp.arange(n)].set(jnp.inf)
        neg, nbr = jax.lax.top_k(-d2, kk)
        return nbr, jnp.sqrt(jnp.maximum(-neg, 0.0))
    nb = -(-n // block)
    xp = jnp.pad(x, ((0, nb * block - n), (0, 0)))
    x2 = (x ** 2).sum(1)[None, :]
    col = jnp.arange(n)[None, :]

    def chunk(i):
        rows = jax.lax.dynamic_slice_in_dim(xp, i * block, block)
        d2 = jnp.maximum((rows ** 2).sum(1)[:, None] - 2.0 * (rows @ x.T) + x2,
                         0.0)
        idx = i * block + jnp.arange(block)
        d2 = jnp.where(col == idx[:, None], jnp.inf, d2)
        neg, nbr = jax.lax.top_k(-d2, kk)
        return nbr, jnp.sqrt(jnp.maximum(-neg, 0.0))

    nbrs, dists = jax.lax.map(chunk, jnp.arange(nb))
    return (nbrs.reshape(nb * block, kk)[:n],
            dists.reshape(nb * block, kk)[:n])


# ------------------------------------------------------------- embedding

def _fuzzy_weights(dist: jnp.ndarray) -> jnp.ndarray:
    """UMAP-style local kernel: w = exp(-(d - rho)/sigma), rho = nearest
    distance, sigma = mean excess distance (a cheap closed form standing in
    for UMAP's per-point binary search)."""
    rho = dist[:, :1]
    sigma = jnp.maximum((dist - rho).mean(axis=1, keepdims=True), 1e-6)
    return jnp.exp(-jnp.maximum(dist - rho, 0.0) / sigma)


@partial(jax.jit, static_argnames=("n_epochs", "n_neg"))
def _optimize_layout(y0, nbr, w, key, n_epochs: int = 200, n_neg: int = 5,
                     lr: float = 0.1, repulsion: float = 1.0):
    """Attraction along kNN edges, repulsion against per-epoch negative
    samples, student-t kernel q = 1/(1+d²); full-batch Adam in one scan."""
    n, k = nbr.shape
    rows = jnp.repeat(jnp.arange(n), k)
    cols = nbr.reshape(-1)
    wf = w.reshape(-1)

    def loss_fn(y, neg_idx):
        d2e = ((y[rows] - y[cols]) ** 2).sum(-1)
        attract = (wf * jnp.log1p(d2e)).sum()
        d2n = ((y[:, None, :] - y[neg_idx]) ** 2).sum(-1)  # [N, n_neg]
        repel = -jnp.log(d2n / (1.0 + d2n) + 1e-6).sum()
        return (attract + repulsion * repel) / n

    def step(carry, key):
        y, m, v, t = carry
        neg_idx = jax.random.randint(key, (n, n_neg), 0, n)
        g = jax.grad(loss_fn)(y, neg_idx)
        t = t + 1.0
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        m_hat = m / (1.0 - 0.9 ** t)
        v_hat = v / (1.0 - 0.999 ** t)
        y = y - lr * m_hat / (jnp.sqrt(v_hat) + 1e-8)
        return (y, m, v, t), None

    init = (y0, jnp.zeros_like(y0), jnp.zeros_like(y0), jnp.float32(0.0))
    (y, _, _, _), _ = jax.lax.scan(step, init, jax.random.split(key, n_epochs))
    return y


def neighbor_embedding(x: np.ndarray, n_components: int = 2,
                       n_neighbors: int = 15, n_epochs: int = 500,
                       metric: str = "euclidean", seed: int = 0,
                       lr: float = 0.05) -> np.ndarray:
    """kNN-graph layout → [N, n_components].  PCA init (scaled to ~1e-1 std,
    the UMAP convention) keeps global structure; the optimization recovers
    local neighborhoods the linear projection loses."""
    x = np.asarray(x, np.float32)
    nbr, dist = knn_graph(jnp.asarray(x), n_neighbors, metric)
    w = _fuzzy_weights(dist)
    comps = min(n_components, x.shape[1], x.shape[0])
    state = PCA.fit(x, comps)
    y0 = np.asarray(PCA.transform(state, x))[:, :n_components]
    if y0.shape[1] < n_components:
        y0 = np.pad(y0, ((0, 0), (0, n_components - y0.shape[1])))
    y0 = y0 / max(float(y0.std()), 1e-9) * 0.1
    y = _optimize_layout(jnp.asarray(y0), nbr, w, jax.random.PRNGKey(seed),
                         n_epochs=n_epochs, lr=lr)
    return np.asarray(y)


# ------------------------------------------------------ density clustering

@partial(jax.jit, static_argnames=("n_iters",))
def _connected_components(nbr, edge_ok, n_iters: int = 64):
    """Min-label propagation over a masked kNN edge list with pointer
    jumping (label ← label[label]) — converges in O(log N) rounds.

    Labels flow BOTH ways across each stored edge: the mutual-reachability
    connectivity rule is symmetric, but kNN rows are not — a dense blob's
    rows may not reciprocate a sparser neighbor's edge, and pull-only
    propagation would then split one component in two.  The scatter-min
    pushes each point's label along its out-edges to cover that case."""
    n = nbr.shape[0]
    label = jnp.arange(n)

    def body(label, _):
        nbr_labels = jnp.where(edge_ok, label[nbr], n)
        label = jnp.minimum(label, nbr_labels.min(axis=1))
        tgt = jnp.where(edge_ok, nbr, n).reshape(-1)
        src = jnp.broadcast_to(label[:, None], nbr.shape).reshape(-1)
        ext = jnp.concatenate([label, jnp.array([n])])
        label = ext.at[tgt].min(src)[:-1]
        label = jnp.minimum(label, label[label])  # pointer jump
        return label, None

    label, _ = jax.lax.scan(body, label, None, length=n_iters)
    return label


def density_cluster(x: np.ndarray, min_cluster_size: int = 50,
                    min_samples: int = 10, eps: Optional[float] = None,
                    eps_scale: float = 2.0, k: Optional[int] = None,
                    metric: str = "euclidean") -> np.ndarray:
    """DBSCAN* over the mutual-reachability graph → labels [N] with -1 noise.

    HDBSCAN semantics approximated at a single density level: core distance
    = distance to the ``min_samples``-th neighbor; points connect when
    max(core_i, core_j, d_ij) ≤ eps; non-core points and clusters smaller
    than ``min_cluster_size`` become noise — the reference's parameters
    min_cluster_size=50, min_samples=10 and its drop-the-(-1)-cluster step
    (``cluster_latents.py:32-44``) apply unchanged downstream.

    ``eps`` defaults to ``eps_scale ×`` the MEDIAN core distance — the
    typical in-cluster density scale; a quantile high enough to reach sparse
    background points would glue distant structures together.  (HDBSCAN
    instead selects per-cluster density levels by stability; this single
    level is the documented approximation.)
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    kk = k or max(min_samples + 1, 16)
    nbr, dist = knn_graph(x, min(kk, n - 1), metric)
    core = dist[:, min(min_samples, dist.shape[1]) - 1]  # min_samples-th NN
    eps = eps_scale * jnp.median(core) if eps is None else jnp.float32(eps)

    mreach = jnp.maximum(dist, jnp.maximum(core[:, None], core[nbr]))
    is_core = core <= eps
    edge_ok = (mreach <= eps) & is_core[:, None] & is_core[nbr]

    n_iters = max(8, int(np.ceil(np.log2(max(n, 2)))) * 4)
    label = np.array(_connected_components(nbr, edge_ok, n_iters))
    label[~np.asarray(is_core)] = -1

    # compact ids; small clusters -> noise
    out = np.full(n, -1, int)
    uniq, counts = np.unique(label[label >= 0], return_counts=True)
    next_id = 0
    for u, c in zip(uniq, counts):
        if c >= min_cluster_size:
            out[label == u] = next_id
            next_id += 1
    return out
