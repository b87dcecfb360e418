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
- :func:`hdbscan_cluster` — the full hierarchical/stability semantics: one
  vmapped connected-components sweep over a ladder of density levels (the
  TPU-friendly stand-in for a mutual-reachability MST), then condensed-tree
  construction and excess-of-mass cluster selection on host — per-cluster
  density levels chosen by stability, exactly the rule HDBSCAN applies
  (``cluster_latents.py:32``: HDBSCAN(min_cluster_size=50, min_samples=10)).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import pca as PCA
from .ann import FINITE


# True-f32 distance matmuls: the TPU MXU's default f32 precision rounds the
# -2x·yᵀ term at ~0.4% of the squared magnitude, corrupting neighbor order
# for tightly clustered data (see analysis/ann.py::_EXACT for the measured
# failure).  CPU is unaffected; TPU needs the explicit precision.
_EXACT = jax.lax.Precision.HIGHEST


def _pairwise_sq(x, y=None):
    y = x if y is None else y
    x2 = (x ** 2).sum(1)[:, None]
    y2 = (y ** 2).sum(1)[None, :]
    return jnp.maximum(
        x2 - 2.0 * jnp.matmul(x, y.T, precision=_EXACT) + y2, 0.0)


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
        d2 = jnp.maximum(
            (rows ** 2).sum(1)[:, None]
            - 2.0 * jnp.matmul(rows, x.T, precision=_EXACT) + x2, 0.0)
        idx = i * block + jnp.arange(block)
        d2 = jnp.where(col == idx[:, None], jnp.inf, d2)
        neg, nbr = jax.lax.top_k(-d2, kk)
        return nbr, jnp.sqrt(jnp.maximum(-neg, 0.0))

    nbrs, dists = jax.lax.map(chunk, jnp.arange(nb))
    return (nbrs.reshape(nb * block, kk)[:n],
            dists.reshape(nb * block, kk)[:n])


def knn(x, k: int = 15, metric: str = "euclidean", method: str = "exact",
        **ann_kwargs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN dispatcher: ``method='exact'`` → :func:`knn_graph` (O(N²·D));
    ``'approx'`` → :func:`..analysis.ann.approx_knn_graph` (IVF-style
    k-means bucketing + exact rerank, O(N^1.5·D)) — required at the
    reference's full 2M-row patch-latent table
    (``cluster_latents.py:26-32``).  ``ann_kwargs`` (nprobe, n_buckets,
    seed, ...) pass through to the approximate path."""
    if method == "approx":
        from .ann import approx_knn_graph
        nbr, dist = approx_knn_graph(np.asarray(x), k, metric, **ann_kwargs)
        return jnp.asarray(nbr), jnp.asarray(dist)
    if method != "exact":
        raise ValueError(f"method must be exact|approx, got {method!r}")
    if ann_kwargs:
        raise TypeError(  # loud, not silent: the knob would do nothing
            f"ann kwargs {sorted(ann_kwargs)} only apply to method='approx'")
    return knn_graph(jnp.asarray(x), k, metric)


# ------------------------------------------------------------- embedding

def _core_distance(dist: jnp.ndarray, min_samples: int) -> jnp.ndarray:
    """hdbscan/cuML core distance: the distance to the ``min_samples``-th
    nearest neighbor COUNTING the point itself (the libraries take
    ``knn_dists[:, min_samples-1]`` with self at column 0) — i.e. the
    (min_samples-1)-th OTHER point.  ``dist`` here excludes self, so the
    column is ``min_samples-2``; ``min_samples<=1`` degenerates to 0."""
    if min_samples <= 1:
        return jnp.zeros(dist.shape[0], dist.dtype)
    return dist[:, min(min_samples - 1, dist.shape[1]) - 1]


def _fuzzy_weights(dist: jnp.ndarray) -> jnp.ndarray:
    """UMAP-style local kernel: w = exp(-(d - rho)/sigma), rho = nearest
    distance, sigma = mean excess distance (a cheap closed form standing in
    for UMAP's per-point binary search).  Approx-kNN sentinel slots
    (``ann.BIG`` distances on rows the probe lists couldn't fill) are absent
    edges: weight 0, excluded from rho/sigma so one sentinel can't inflate
    the local scale and flatten the real neighbors' weights."""
    valid = dist < FINITE
    rho = jnp.where(valid[:, :1], dist[:, :1], 0.0)
    excess = jnp.maximum(dist - rho, 0.0)
    denom = jnp.maximum(valid.sum(axis=1, keepdims=True), 1)
    sigma = jnp.maximum(
        jnp.where(valid, excess, 0.0).sum(axis=1, keepdims=True) / denom, 1e-6)
    return jnp.where(valid, jnp.exp(-excess / sigma), 0.0)


@partial(jax.jit, static_argnames=("n_neg", "n_seg"))
def _layout_chunk(carry, keys, nbr, w, n_neg: int = 5, lr: float = 0.1,
                  repulsion: float = 1.0, n_seg: int = 1):
    """A chunk of layout epochs: attraction along kNN edges, repulsion
    against per-epoch negative samples, student-t kernel q = 1/(1+d²),
    full-batch Adam; the (y, m, v, t) carry crosses chunk boundaries, so a
    sequence of chunks is bit-identical to one scan over all epochs
    (tested).  Chunking exists because ONE scan over 200 epochs at the
    reference's 2M-row table is a ~35-minute single device program — r5
    measured the tunneled TPU worker crashing mid-program on exactly that;
    bounded dispatches also give the host loop progress visibility.

    ``n_seg > 1`` evaluates the loss in ``n_seg`` rematerialized edge/row
    segments (``jax.checkpoint`` over a ``lax.scan``): at the reference's
    2M×15 graph the fused edge-gather tensors are ~2.4 GB EACH in forward
    and backward, and the unsegmented epoch peaks within reach of the 16 GB
    chip — segmenting bounds peak HBM at ~1/n_seg of that for 2×
    recompute of the (cheap) gathers.  Values differ from ``n_seg=1`` only
    by float summation order (tested ~1e-6)."""
    n, k = nbr.shape
    rows = jnp.repeat(jnp.arange(n), k)
    cols = nbr.reshape(-1)
    wf = w.reshape(-1)

    if n_seg > 1:
        e_pad = -(-(n * k) // n_seg) * n_seg
        r_pad = -(-n // n_seg) * n_seg

        def pad_to(a, m, fill):
            return jnp.concatenate(
                [a, jnp.full((m - a.shape[0],) + a.shape[1:], fill, a.dtype)])

        # padded edges carry w=0 (zero loss and gradient); padded repulsion
        # rows are masked out below
        seg_rows = pad_to(rows, e_pad, 0).reshape(n_seg, -1)
        seg_cols = pad_to(cols, e_pad, 0).reshape(n_seg, -1)
        seg_w = pad_to(wf, e_pad, 0.0).reshape(n_seg, -1)
        row_ids = pad_to(jnp.arange(n), r_pad, n).reshape(n_seg, -1)

    def loss_fn(y, neg_idx):
        if n_seg == 1:
            d2e = ((y[rows] - y[cols]) ** 2).sum(-1)
            attract = (wf * jnp.log1p(d2e)).sum()
            d2n = ((y[:, None, :] - y[neg_idx]) ** 2).sum(-1)  # [N, n_neg]
            repel = -jnp.log(d2n / (1.0 + d2n) + 1e-6).sum()
            return (attract + repulsion * repel) / n

        neg_pad = jnp.concatenate(
            [neg_idx, jnp.zeros((r_pad - n, n_neg), neg_idx.dtype)]
        ).reshape(n_seg, -1, n_neg)

        @jax.checkpoint
        def seg_loss(y, seg):
            r, c, ww, rid, neg = seg
            d2e = ((y[r] - y[c]) ** 2).sum(-1)
            attract = (ww * jnp.log1p(d2e)).sum()
            d2n = ((y[jnp.minimum(rid, n - 1), None, :] - y[neg]) ** 2).sum(-1)
            rep = jnp.where(rid[:, None] < n,
                            -jnp.log(d2n / (1.0 + d2n) + 1e-6), 0.0).sum()
            return attract + repulsion * rep

        def body(acc, seg):
            return acc + seg_loss(y, seg), None

        total, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            (seg_rows, seg_cols, seg_w, row_ids, neg_pad))
        return total / n

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

    carry, _ = jax.lax.scan(step, carry, keys)
    return carry


def _optimize_layout(y0, nbr, w, key, n_epochs: int = 200, n_neg: int = 5,
                     lr: float = 0.1, repulsion: float = 1.0,
                     epoch_chunk: int = 50, n_seg: int = 1,
                     checkpoint_dir: Optional[str] = None,
                     checkpoint_every: int = 50, verbose: bool = False):
    """Epoch loop over :func:`_layout_chunk` dispatches; same per-epoch key
    stream as a single scan (split once, sliced per chunk — resuming from a
    checkpoint therefore replays the identical epoch keys).

    ``checkpoint_dir`` persists the full Adam carry every
    ``checkpoint_every`` epochs (atomic npz) and resumes from it: the r5
    2M-row runs saw the tunneled TPU worker die mid-stage, and without the
    carry a restart repays every completed epoch."""
    import os

    keys = jax.random.split(key, n_epochs)
    carry = (y0, jnp.zeros_like(y0), jnp.zeros_like(y0), jnp.float32(0.0))
    start = 0
    ck = (os.path.join(checkpoint_dir, "layout_carry.npz")
          if checkpoint_dir else None)
    if ck and os.path.exists(ck):
        blob = np.load(ck)
        if int(blob["n_epochs"]) == n_epochs and blob["y"].shape == y0.shape:
            carry = (jnp.asarray(blob["y"]), jnp.asarray(blob["m"]),
                     jnp.asarray(blob["v"]), jnp.float32(blob["t"]))
            start = int(blob["epoch"])
            if verbose:
                print(f"layout: resumed at epoch {start}", flush=True)
    s, last_saved = start, start
    while s < n_epochs:
        e = min(s + epoch_chunk, n_epochs)
        carry = _layout_chunk(carry, keys[s:e], nbr, w, n_neg=n_neg, lr=lr,
                              repulsion=repulsion, n_seg=n_seg)
        s = e
        if verbose:
            jax.block_until_ready(carry[0])
            print(f"layout epochs {s}/{n_epochs}", flush=True)
        if ck and s < n_epochs and s - last_saved >= checkpoint_every:
            blob = {k2: np.asarray(c) for k2, c in
                    zip(("y", "m", "v", "t"), carry)}
            np.savez(ck + ".tmp.npz", epoch=s, n_epochs=n_epochs, **blob)
            os.replace(ck + ".tmp.npz", ck)
            last_saved = s
            if verbose:
                print(f"layout: checkpointed epoch {s}", flush=True)
    return carry[0]


def neighbor_embedding(x: np.ndarray, n_components: int = 2,
                       n_neighbors: int = 15, n_epochs: int = 500,
                       metric: str = "euclidean", seed: int = 0,
                       lr: float = 0.05,
                       knn_method: str = "exact",
                       knn_kwargs: Optional[dict] = None,
                       precomputed_knn: Optional[tuple] = None,
                       epoch_chunk: int = 50,
                       grad_segments: Optional[int] = None,
                       layout_checkpoint_dir: Optional[str] = None,
                       checkpoint_every: int = 50,
                       verbose: bool = False) -> np.ndarray:
    """kNN-graph layout → [N, n_components].  PCA init (scaled to ~1e-1 std,
    the UMAP convention) keeps global structure; the optimization recovers
    local neighborhoods the linear projection loses.  ``knn_method='approx'``
    switches the graph construction to the IVF path for reference-scale
    tables (see :func:`knn`); ``knn_kwargs`` (nprobe, n_buckets, seed —
    recall-critical runs raise nprobe, see ``ann.approx_knn_graph``) pass
    through to it.  ``precomputed_knn=(nbr, dist)`` skips the graph build
    entirely (cuML UMAP's ``precomputed_knn``): at the reference's 2M-row
    table the ANN graph is the dominant cost and the SAME graph also feeds
    the downstream clustering — compute it once, pass it to both."""
    x = np.asarray(x, np.float32)
    if precomputed_knn is not None:
        nbr, dist = (jnp.asarray(precomputed_knn[0]),
                     jnp.asarray(precomputed_knn[1]))
        nbr = nbr[:, :n_neighbors]
        dist = dist[:, :n_neighbors]
    else:
        nbr, dist = knn(x, n_neighbors, metric, method=knn_method,
                        **(knn_kwargs or {}))
    w = _fuzzy_weights(dist)
    comps = min(n_components, x.shape[1], x.shape[0])
    state = PCA.fit(x, comps)
    y0 = np.asarray(PCA.transform(state, x))[:, :n_components]
    if y0.shape[1] < n_components:
        y0 = np.pad(y0, ((0, 0), (0, n_components - y0.shape[1])))
    y0 = y0 / max(float(y0.std()), 1e-9) * 0.1
    if grad_segments is None:
        # bound each rematerialized segment's edge gathers to ~8M edges
        # (~0.6 GB of 20-d f32 tensors) — see _layout_chunk's n_seg note
        grad_segments = max(1, int(nbr.shape[0]) * int(nbr.shape[1])
                            // 8_000_000)
    y = _optimize_layout(jnp.asarray(y0), nbr, w, jax.random.PRNGKey(seed),
                         n_epochs=n_epochs, lr=lr, epoch_chunk=epoch_chunk,
                         n_seg=grad_segments,
                         checkpoint_dir=layout_checkpoint_dir,
                         checkpoint_every=checkpoint_every, verbose=verbose)
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
                    metric: str = "euclidean",
                    knn_method: str = "exact",
                    knn_kwargs: Optional[dict] = None,
                    precomputed_knn: Optional[tuple] = None) -> np.ndarray:
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
    # keep x on host: knn() moves it to device itself on the exact path, and
    # the approx path wants numpy — converting here would ship the FULL
    # table device→host→device (~12 GB of wasted transfer at the 2M-row
    # target geometry) and pin a second device copy alongside ann's buffers
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    if precomputed_knn is not None:
        nbr, dist = (jnp.asarray(precomputed_knn[0]),
                     jnp.asarray(precomputed_knn[1]))
    else:
        kk = k or max(min_samples + 1, 16)
        nbr, dist = knn(x, min(kk, n - 1), metric, method=knn_method,
                        **(knn_kwargs or {}))
    core = _core_distance(dist, min_samples)
    if eps is None:
        # approx kNN marks unfilled neighbor slots with a huge finite
        # distance (ann.BIG); a BIG core distance means the point is
        # unreachable at any sane density level (→ noise below), and it must
        # not poison the median that sets the level (same guard as
        # hdbscan_cluster's eps grid).
        core_np = np.asarray(core)
        finite = core_np[core_np < FINITE]
        if len(finite) == 0:
            return np.full(n, -1, int)
        eps = jnp.float32(eps_scale * np.median(finite))
    else:
        eps = jnp.float32(eps)

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


# ------------------------------------------- hierarchical (HDBSCAN) variant

@partial(jax.jit, static_argnames=("n_iters",))
def _labels_at_levels(nbr, dist, core, eps_levels, n_iters: int):
    """Connected-component labels of the mutual-reachability graph at every
    eps in ``eps_levels`` → [L, N].  One vmap over levels: the kNN structure
    is shared, only the edge mask changes, so all L labelings run as one
    batched program on device."""
    mreach = jnp.maximum(dist, jnp.maximum(core[:, None], core[nbr]))

    def at_eps(eps):
        is_core = core <= eps
        edge_ok = (mreach <= eps) & is_core[:, None] & is_core[nbr]
        lab = _connected_components(nbr, edge_ok, n_iters)
        return jnp.where(is_core, lab, -1)

    return jax.vmap(at_eps)(eps_levels)


def _condense_and_select(levels_labels: np.ndarray, lam: np.ndarray,
                         min_cluster_size: int,
                         allow_single_cluster: bool = False) -> np.ndarray:
    """Condensed tree + excess-of-mass selection over discrete density levels.

    ``levels_labels[l]`` are component labels at level ``l`` (coarse → fine,
    ``lam`` = 1/eps strictly increasing); a cluster node persists while it
    keeps ≥ ``min_cluster_size`` points and splits only when ≥ 2 children
    clear that bar (HDBSCAN's condensed-tree rule).  Node stability
    accumulates Σ |alive members| · Δλ; a parent is selected iff its own
    stability beats the summed selected-stability of its children."""
    n_levels, n = levels_labels.shape

    # ---- build nodes: birth members, per-level alive counts, children
    nodes = []  # dict(parent, birth_level, members, alive_hist=[(level,count)])
    cur = np.full(n, -1, np.int64)       # point -> node id
    roots = []
    for comp in np.unique(levels_labels[0]):
        if comp < 0:
            continue
        members = np.where(levels_labels[0] == comp)[0]
        if len(members) < min_cluster_size:
            continue
        nodes.append({"parent": -1, "birth": 0, "members": members,
                      "children": [], "stab": 0.0})
        cur[members] = len(nodes) - 1
        roots.append(len(nodes) - 1)

    for l in range(1, n_levels):
        dlam = lam[l] - lam[l - 1]
        lab = levels_labels[l]
        for nid in [i for i in np.unique(cur) if i >= 0]:
            pts = np.where(cur == nid)[0]
            nodes[nid]["stab"] += len(pts) * dlam  # alive over [λ_{l-1}, λ_l)
            sub = lab[pts]
            comps, counts = np.unique(sub[sub >= 0], return_counts=True)
            big = comps[counts >= min_cluster_size]
            if len(big) >= 2:               # true split: node dies here
                for comp in big:
                    members = pts[sub == comp]
                    nodes.append({"parent": nid, "birth": l,
                                  "members": members, "children": [],
                                  "stab": 0.0})
                    cid = len(nodes) - 1
                    nodes[nid]["children"].append(cid)
                    cur[members] = cid
                cur[pts[~np.isin(sub, big)]] = -1   # fall-outs
            elif len(big) == 1:             # continuation; shed fall-outs
                cur[pts[sub != big[0]]] = -1
            else:                           # node evaporates
                cur[pts] = -1

    if not nodes:
        return np.full(n, -1, int)

    # ---- excess-of-mass selection (children processed before parents)
    selected = np.zeros(len(nodes), bool)
    sel_stab = np.zeros(len(nodes))
    for nid in range(len(nodes) - 1, -1, -1):
        node = nodes[nid]
        child_sum = sum(sel_stab[c] for c in node["children"])
        # HDBSCAN's allow_single_cluster=False: a lone root is never selected
        # (its points are noise unless a selected descendant claims them)
        root_barred = (node["parent"] == -1 and len(roots) == 1
                       and not allow_single_cluster)
        if root_barred or (node["children"] and node["stab"] <= child_sum):
            sel_stab[nid] = child_sum     # keep the children (possibly none)
        else:
            sel_stab[nid] = node["stab"]
            selected[nid] = True
            # deselect all descendants
            stack = list(node["children"])
            while stack:
                c = stack.pop()
                selected[c] = False
                stack.extend(nodes[c]["children"])

    out = np.full(n, -1, int)
    next_id = 0
    for nid in range(len(nodes)):
        if selected[nid]:
            out[nodes[nid]["members"]] = next_id
            next_id += 1
    return out


def hdbscan_cluster(x: np.ndarray, min_cluster_size: int = 50,
                    min_samples: int = 10, n_levels: int = 24,
                    k: Optional[int] = None, metric: str = "euclidean",
                    allow_single_cluster: bool = False,
                    knn_method: str = "exact",
                    knn_kwargs: Optional[dict] = None,
                    precomputed_knn: Optional[tuple] = None) -> np.ndarray:
    """Hierarchical density clustering → labels [N] with -1 noise.

    The reference's cuML ``HDBSCAN(min_cluster_size=50, min_samples=10)``
    (``cluster_latents.py:32``), built TPU-first: instead of a sequential
    single-linkage MST, the density hierarchy is materialised as connected
    components at ``n_levels`` geometrically spaced eps levels — one vmapped
    batched program — and HDBSCAN's condensed-tree / excess-of-mass stability
    selection then picks a per-cluster density level on host.  Two-density
    data where any single eps either merges the dense pair or drops the
    sparse cluster is resolved correctly (tested).
    """
    # host-side x: see density_cluster — avoids a full-table device
    # round-trip on the approx path at reference scale
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    if precomputed_knn is not None:
        nbr, dist = (jnp.asarray(precomputed_knn[0]),
                     jnp.asarray(precomputed_knn[1]))
    else:
        kk = k or max(min_samples + 1, 16)
        nbr, dist = knn(x, min(kk, n - 1), metric, method=knn_method,
                        **(knn_kwargs or {}))
    core = _core_distance(dist, min_samples)

    core_np = np.asarray(core)
    # approx kNN marks unfilled neighbor slots with a huge finite distance
    # (ann.BIG); such points are unreachable at any sane eps (→ noise) and
    # must not stretch the ladder
    finite = core_np[core_np < FINITE]
    if len(finite) == 0:
        return np.full(int(n), -1, int)
    # geometric eps ladder spanning every core-distance scale in the data:
    # coarsest level connects nearly everything (root), finest sits below
    # the densest cluster's working level
    lo = max(float(np.quantile(finite, 0.05)), 1e-6)
    hi = max(float(finite.max()) * 1.5, lo * 2.0)
    eps_levels = np.geomspace(hi, lo, n_levels).astype(np.float32)

    n_iters = max(8, int(np.ceil(np.log2(max(n, 2)))) * 4)
    labels = np.asarray(_labels_at_levels(nbr, dist, core,
                                          jnp.asarray(eps_levels), n_iters))
    lam = 1.0 / eps_levels  # increasing: coarse → fine
    return _condense_and_select(labels, lam, min_cluster_size,
                                allow_single_cluster)
