"""Graph builders for patch-bag MIL (dense-adjacency, TPU-idiomatic).

Reproduces the reference's three builders (``utils_g_mil.py:495-605``) —
grid (4-neighborhood ± diagonals, self loops, row-normalized D⁻¹A), feature
kNN, and random-degree — but as dense [N, N] adjacencies: at N = 196 patch
nodes, dense matmul message passing is the TPU-native formulation (SURVEY.md
§2.2); ``edge_index`` conversion is provided for API parity.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def build_grid_adj(num_nodes: int, connect_diagonals: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(adj_norm = D⁻¹(A+I) row-normalized, adj_mask binary incl. self loops)
    — exact semantics of ``utils_g_mil.py:495-520`` (cached like the
    reference's module-level cache)."""
    s = int(np.sqrt(num_nodes))
    if s * s != num_nodes:
        raise ValueError("num_nodes must be a perfect square to build grid adjacency")
    idx = np.arange(num_nodes).reshape(s, s)
    adj = np.zeros((num_nodes, num_nodes), np.float32)
    offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connect_diagonals:
        offsets += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    for dr, dc in offsets:
        rr = np.arange(s)
        for r in range(s):
            for c in range(s):
                r2, c2 = r + dr, c + dc
                if 0 <= r2 < s and 0 <= c2 < s:
                    adj[idx[r, c], idx[r2, c2]] = 1.0
    adj = adj + np.eye(num_nodes, dtype=np.float32)
    deg = adj.sum(axis=1)
    adj_norm = adj / deg[:, None]
    # cache plain numpy: jnp arrays created inside a jit trace are tracers and
    # must not be memoized across traces
    return adj_norm, (adj > 0).astype(np.float32)


def build_grid_adj_dynamic(valid: jnp.ndarray, connect_diagonals: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid adjacency over the TRUE bag size inside a padded [N] array
    (jit-compatible: the bag size ``valid.sum()`` may be a tracer).

    The reference builds the grid over the real node count
    (``utils_g_mil.py:549-565`` calls ``build_grid_adj(x.size(0))``), so a bag
    of n < N nodes must get an s×s grid with s = √n, not the first n nodes of
    a √N grid.  ``valid`` must be a prefix mask (pad_bags appends padding).
    For non-perfect-square n — where the reference raises — the grid covers
    the first ⌊√n⌋² nodes and the remaining valid nodes keep self-loops only.
    → (adj_norm D⁻¹(A+I), adj_mask incl. self loops), both [N, N] float32.
    """
    n = valid.shape[0]
    n_valid = valid.astype(jnp.int32).sum()
    s = jnp.floor(jnp.sqrt(n_valid.astype(jnp.float32) + 0.5)).astype(jnp.int32)
    s = jnp.maximum(s, 1)
    idx = jnp.arange(n)
    r = idx // s
    c = idx % s
    in_grid = idx < s * s
    dr = jnp.abs(r[:, None] - r[None, :])
    dc = jnp.abs(c[:, None] - c[None, :])
    neigh = (dr + dc) == 1
    if connect_diagonals:
        neigh = neigh | ((dr == 1) & (dc == 1))
    adj = neigh & in_grid[:, None] & in_grid[None, :]
    adj_mask = (adj | jnp.eye(n, dtype=bool)).astype(jnp.float32)
    deg = adj_mask.sum(axis=1)
    return adj_mask / deg[:, None], adj_mask


@partial(jax.jit, static_argnames=("k",))
def build_knn_adj(x: jnp.ndarray, k: int = 8,
                  valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Directed kNN adjacency mask [N, N] from node features (squared
    euclidean, self excluded) — the dense form of ``build_knn_edge_index``
    (``utils_g_mil.py:527-546``).

    With ``valid`` given, neighbors are selected among the TRUE bag nodes
    only (the reference computes kNN over the real N_i instances); each valid
    node gets min(k, n_valid−1) neighbors, invalid rows stay empty."""
    n = x.shape[0]
    x2 = (x ** 2).sum(axis=1)
    # true-f32 matmul: TPU MXU default precision can flip near-tie neighbor
    # choices vs the torch-f32 reference (see analysis/ann.py::_EXACT)
    d2 = x2[:, None] + x2[None, :] - 2.0 * jnp.matmul(
        x, x.T, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(d2, 0.0)
    d2 = d2.at[jnp.arange(n), jnp.arange(n)].set(jnp.inf)
    if valid is not None:
        d2 = jnp.where(valid[None, :].astype(bool), d2, jnp.inf)
    kk = min(k, n - 1)
    neg_vals, nbr = jax.lax.top_k(-d2, kk)  # smallest distances
    keep = jnp.isfinite(neg_vals).astype(jnp.float32)  # drop +inf "neighbors"
    adj = jnp.zeros((n, n)).at[jnp.arange(n)[:, None], nbr].max(keep)
    if valid is not None:
        adj = adj * valid.astype(adj.dtype)[:, None]
    return adj


@partial(jax.jit, static_argnames=("num_nodes", "k"))
def build_random_adj(key: jax.Array, num_nodes: int, k: int = 4,
                     valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Each node samples ≤k distinct non-self targets; symmetrized
    (``utils_g_mil.py:581-602``).  With ``valid`` given, targets are sampled
    only among the true bag nodes (the reference samples among the real N_i
    candidates), giving min(k, n_valid−1) targets per valid node."""
    keys = jax.random.split(key, num_nodes)
    v = (jnp.ones(num_nodes, bool) if valid is None
         else valid.astype(bool))

    def row(i, key):
        u = jax.random.uniform(key, (num_nodes,))
        score = jnp.where(v & (jnp.arange(num_nodes) != i), u, jnp.inf)
        order = jnp.argsort(score)
        chosen = order[:k]
        keep = jnp.isfinite(score[chosen]).astype(jnp.float32)
        return jnp.zeros(num_nodes).at[chosen].max(keep)

    adj = jax.vmap(row)(jnp.arange(num_nodes), keys)
    adj = adj * v.astype(adj.dtype)[:, None]  # invalid sources emit nothing
    adj = jnp.maximum(adj, adj.T)  # undirected
    return adj.at[jnp.arange(num_nodes), jnp.arange(num_nodes)].set(0.0)


def build_graph(x: jnp.ndarray, graph_type: str = "grid",
                k: Optional[int] = None, connect_diagonals: bool = False,
                key: Optional[jax.Array] = None,
                valid: Optional[jnp.ndarray] = None):
    """Dispatch matching ``build_graph`` (``utils_g_mil.py:549-605``):
    → (adj_norm or None, adj_mask [N, N]).  For 'grid' both are returned; for
    'knn'/'random' the mask alone (the reference passes edge_index only).
    ``valid`` restricts the topology to the true bag nodes (see the
    individual builders)."""
    n = x.shape[0]
    if graph_type == "grid":
        if valid is not None:
            return build_grid_adj_dynamic(valid, connect_diagonals)
        return build_grid_adj(n, connect_diagonals)
    if graph_type == "knn":
        return None, build_knn_adj(x, 8 if k is None else int(k), valid=valid)
    if graph_type == "random":
        if key is None:
            key = jax.random.PRNGKey(0)
        return None, build_random_adj(key, n, 4 if k is None else int(k),
                                      valid=valid)
    raise ValueError(
        f"Unsupported graph_type='{graph_type}'. Supported types: 'grid', 'knn'.")


def adj_to_edge_index(adj_mask) -> np.ndarray:
    """[2, E] edge list (row-major order) for reference-API parity."""
    src, dst = np.nonzero(np.asarray(adj_mask))
    return np.stack([src, dst])
