"""Approximate k-nearest-neighbors at reference scale, TPU-first.

The reference clusters the FULL train patch-latent table — ~10k images × 196
patches ≈ 2M rows × 768 dims — with cuML UMAP/HDBSCAN
(``/root/reference/cluster_latents.py:26-32``).  The exact kNN in
``analysis.embed.knn_graph`` is O(N²·D): chunked for memory but ~10¹⁸ FLOPs at
that geometry.  This module is the scalable path: an IVF-style scheme whose
every hot step is a dense batched matmul (MXU) with static shapes —

1. **Bucketing** — light k-means (random-subset init + a few chunked Lloyd
   iterations) into C ≈ √N buckets; assignment is the ‖x‖²−2x·c+‖c‖² matmul.
2. **Bucket-shared probes** — each bucket probes its ``nprobe`` nearest
   buckets by centroid distance (self included).  Sharing the probe list
   across a bucket's queries is what makes the rerank a single rectangular
   matmul per bucket instead of a ragged per-query gather — the TPU trade;
   per-query probes would be marginally more accurate but unbatchable.
3. **Exact rerank** — per bucket, [cap, cap] distance blocks between the
   bucket's queries and each probed bucket's members, folded into a running
   top-k (``lax.scan`` over probes, so memory never holds the full
   [cap, nprobe·cap] block).  Buckets are padded to the max occupancy with a
   sentinel row whose coordinates are huge, so pads never win and shapes
   stay static; occupancy itself is hard-capped at 2× the mean by splitting
   oversized buckets (``_balance_buckets``), so the padding factor — which
   multiplies both memory and compute — is bounded on skewed data.

Recall@k vs exact on 20k clustered rows: 0.86 at nprobe=8, 0.96 at 12,
0.996 at the default 16 (tested ≥ 0.9); ``nprobe`` trades recall for compute.  Cost: O(N·nprobe·cap·D) ≈
O(N^1.5·nprobe·D) — at the reference's 2M×768 (after PCA → ~50-100 dims this
drops further) that is ~10¹³ FLOPs, seconds on one chip, vs the exact path's
~10¹⁸.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e15  # finite stand-in for "no neighbor found" distances
# Distances below FINITE are real edges; at/above, sentinel slots.  Every
# downstream guard (fuzzy weights, density eps, hdbscan ladder, recall)
# compares against THIS constant so BIG can move without any guard silently
# passing sentinels through.  Real squared distances stay far below it: the
# sentinel row's coordinates are 1e18, genuine latent distances ≤ ~1e4.
FINITE = BIG / 10.0

# Distance matmuls MUST run at true f32: the TPU MXU's default f32 precision
# (bf16-passes) rounds ‖x‖²−2x·yᵀ+‖y‖² at ~0.4% of the squared MAGNITUDE,
# which swamps in-cluster distance differences and silently corrupts the
# neighbor ordering (measured: recall@15 0.998 on CPU → 0.18 on TPU at
# default precision on 24-d clustered data).
_EXACT = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("block",))
def _assign_chunked(x, centers, block: int = 8192):
    """Nearest-centroid assignment in row chunks → labels [N]."""
    n = x.shape[0]
    nb = -(-n // block)
    xp = jnp.pad(x, ((0, nb * block - n), (0, 0)))
    c2 = (centers ** 2).sum(1)[None, :]

    def chunk(i):
        rows = jax.lax.dynamic_slice_in_dim(xp, i * block, block)
        d2 = ((rows ** 2).sum(1)[:, None]
              - 2.0 * jnp.matmul(rows, centers.T, precision=_EXACT) + c2)
        return jnp.argmin(d2, axis=1)

    return jax.lax.map(chunk, jnp.arange(nb)).reshape(-1)[:n]


@partial(jax.jit, static_argnames=("n_buckets",))
def _lloyd_step(x, centers, n_buckets: int):
    """One Lloyd iteration (empty buckets keep their previous center)."""
    labels = _assign_chunked(x, centers)
    onehot_sums = jax.ops.segment_sum(x, labels, num_segments=n_buckets)
    counts = jax.ops.segment_sum(jnp.ones(x.shape[0], jnp.float32), labels,
                                 num_segments=n_buckets)
    new = onehot_sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(counts[:, None] > 0, new, centers), labels


@partial(jax.jit, static_argnames=("k",))
def _rerank(xp, members, probes, bucket_ids, k: int):
    """Exact rerank for the buckets listed in ``bucket_ids``, streamed over
    probe buckets.

    xp [N+1, D] (last row = huge-coordinate sentinel), members [C, cap]
    int32 with N marking pads, probes [C, nprobe], bucket_ids [G] →
    (nbr [G, cap, k] indices into 0..N, dist [G, cap, k]).  One ``lax.map``
    step = one bucket; inside it a ``lax.scan`` folds one probed bucket at a
    time into a running top-k, so live memory is one [cap, cap] distance
    block (plus the [cap, k] state) instead of the full [cap, nprobe·cap]
    block — which at the reference's 2M-row geometry is the difference
    between ~35 MB and an unallocatable 40 GB.  Candidate matmuls still run
    full-width on the MXU.  The caller dispatches bucket GROUPS (one jit
    call per ``bucket_ids`` slice) rather than all C buckets in one program:
    a single multi-minute XLA program crashed the tunneled TPU worker at the
    2M-row geometry, and host-side chunking also buys progress reporting.
    """
    n_sentinel = xp.shape[0] - 1

    def one(c):
        q_idx = members[c]                                   # [cap]
        q = xp[q_idx]                                        # [cap, D]
        qn = (q ** 2).sum(1)[:, None]
        cap = q_idx.shape[0]

        def fold(carry, p):
            best_d, best_i = carry                           # [cap, k] each
            cand = members[p]                                # [cap]
            cx = xp[cand]
            d2 = (qn - 2.0 * jnp.matmul(q, cx.T, precision=_EXACT)
                  + (cx ** 2).sum(1)[None, :])
            d2 = jnp.where(cand[None, :] == q_idx[:, None], jnp.inf, d2)
            d2 = jnp.where(cand[None, :] == n_sentinel, jnp.inf, d2)
            cd = jnp.concatenate([best_d, d2], axis=1)
            ci = jnp.concatenate(
                [best_i, jnp.broadcast_to(cand[None, :], (cap, cap))], axis=1)
            neg, sel = jax.lax.top_k(-cd, k)
            return (-neg, jnp.take_along_axis(ci, sel, axis=1)), None

        init = (jnp.full((cap, k), jnp.inf, xp.dtype),
                jnp.zeros((cap, k), jnp.int32))
        (best_d, best_i), _ = jax.lax.scan(fold, init, probes[c])
        return best_i, jnp.sqrt(jnp.maximum(best_d, 0.0))

    return jax.lax.map(one, bucket_ids)


def _balance_buckets(x: np.ndarray, labels: np.ndarray, centers: np.ndarray,
                     limit: int, rs: np.random.RandomState):
    """Split every bucket with more than ``limit`` members into random
    equal pieces of ≤ ``limit``, each with its own centroid (the piece
    mean).  k-means occupancy on clustered data is heavily skewed (measured
    7× over the mean at 2M rows), and both the rerank's padded compute and
    its memory scale with the MAX occupancy — a hard cap keeps them at the
    balanced cost.  Random pieces of one tight bucket have near-identical
    centroids, so they land at the top of each other's probe lists and the
    effective candidate pool (hence recall) is unchanged.

    → (labels, centers) with ``bincount(labels).max() <= limit``."""
    counts = np.bincount(labels, minlength=len(centers))
    big = np.where(counts > limit)[0]
    if len(big) == 0:
        return labels, centers
    extra = []
    next_id = len(centers)
    for b in big:
        idx = np.where(labels == b)[0]
        rs.shuffle(idx)
        parts = int(np.ceil(len(idx) / limit))
        for p, chunk in enumerate(np.array_split(idx, parts)):
            mean = x[chunk].mean(axis=0)
            if p == 0:
                centers[b] = mean
            else:
                labels[chunk] = next_id
                extra.append(mean)
                next_id += 1
    if extra:
        centers = np.vstack([centers, np.asarray(extra, centers.dtype)])
    return labels, centers


def approx_knn_graph(
    x: np.ndarray,
    k: int = 15,
    metric: str = "euclidean",
    nprobe: Optional[int] = None,
    n_buckets: Optional[int] = None,
    n_iters: int = 4,
    seed: int = 0,
    verbose: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (nbr [N, k] int32, dist [N, k] f32), self excluded — the same
    contract as :func:`..analysis.embed.knn_graph` up to approximation.

    Entries that could not be filled (fewer than k candidates reachable
    through the probed buckets — only possible at degenerate geometries)
    carry index 0 and distance ``BIG``; downstream consumers (mutual-
    reachability edge masks, fuzzy weights) treat them as absent edges.
    'cosine' normalizes rows first and returns unit-sphere euclidean
    distances, exactly like the exact path.
    """
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    if metric == "cosine":
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    elif metric != "euclidean":
        raise ValueError(f"unsupported metric {metric!r}")

    c = n_buckets or max(int(np.sqrt(n)), 4)
    c = min(c, n)
    if n <= max(4 * k, 256) or c < 2:
        # tiny inputs: exact is cheaper than the machinery
        from .embed import knn_graph
        nbr, dist = knn_graph(jnp.asarray(x), k)
        return np.asarray(nbr), np.asarray(dist)
    xd = jnp.asarray(x)
    rs = np.random.RandomState(seed)
    centers = jnp.asarray(x[rs.choice(n, c, replace=False)])
    for _ in range(n_iters):
        centers, _ = _lloyd_step(xd, centers, c)
    labels = np.asarray(_assign_chunked(xd, centers)).copy()

    # hard-cap bucket occupancy at 2× the mean (skew-proofing: rerank
    # memory and padded compute scale with MAX occupancy, see
    # _balance_buckets) before choosing probe counts — splitting grows C
    cen = np.asarray(centers).copy()
    limit = max(2 * int(np.ceil(n / c)), 4 * (k + 1), 128)
    labels, cen = _balance_buckets(x, labels, cen, limit, rs)
    c = len(cen)
    if nprobe is None:
        # a FIXED probe count loses recall as the bucket count grows
        # (measured: recall@15 0.996 at C=141/nprobe=16 but 0.85 at C=224):
        # a natural cluster spans ~C/n_clusters buckets and the probed
        # fraction shrinks.  Default scales probes with C up to a cap of 96
        # so total rerank work stays O(96·cap·N·D) = O(96·N^1.5·D) —
        # at large C the probed fraction shrinks again, which is the
        # standard IVF trade; raise nprobe explicitly for recall-critical
        # runs.
        nprobe = min(max(16, c // 8), 96)
    nprobe = min(nprobe, c)

    # bucket member table, padded with the sentinel index N.  cap rounds up
    # to a multiple of 128 (lane width): the raw max occupancy is data- and
    # seed-dependent, and every distinct cap is a fresh XLA compile of the
    # rerank — rounding collapses near-identical shapes into one program.
    order = np.argsort(labels, kind="stable")
    counts = np.bincount(labels, minlength=c)
    cap = max(int(counts.max()), 1)
    cap = ((cap + 127) // 128) * 128
    members = np.full((c, cap), n, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for b in range(c):
        members[b, : counts[b]] = order[starts[b]: starts[b] + counts[b]]

    # bucket-level probe lists by centroid distance (self is at distance 0)
    cd2 = ((cen ** 2).sum(1)[:, None] - 2.0 * (cen @ cen.T)
           + (cen ** 2).sum(1)[None, :])
    probes = np.argsort(cd2, axis=1)[:, :nprobe].astype(np.int32)

    xp = jnp.asarray(np.vstack([x, np.full((1, d), 1e18, np.float32)]))
    members_d, probes_d = jnp.asarray(members), jnp.asarray(probes)
    # dispatch bucket groups sized to a few seconds of MXU work each (one
    # compile: the [G] id slice is padded to a fixed shape); see _rerank for
    # why one monolithic program is not an option
    fpb = 2.0 * cap * nprobe * cap * d
    group = int(min(max(3e14 // max(fpb, 1.0), 1), 1024, c))
    nbr_b = np.zeros((c, cap, k), np.int32)
    dist_b = np.zeros((c, cap, k), np.float32)
    for g0 in range(0, c, group):
        ids = np.arange(g0, g0 + group, dtype=np.int32)
        ids = np.minimum(ids, c - 1)  # pad tail by recomputing the last row
        nb, db = _rerank(xp, members_d, probes_d, jnp.asarray(ids), k)
        take = min(group, c - g0)
        nbr_b[g0: g0 + take] = np.asarray(nb)[:take]
        dist_b[g0: g0 + take] = np.asarray(db)[:take]
        if verbose:
            print(f"ann rerank: {min(g0 + group, c)}/{c} buckets", flush=True)

    out_nbr = np.zeros((n, k), np.int32)
    out_dist = np.full((n, k), BIG, np.float32)
    valid = members < n
    out_nbr[members[valid]] = nbr_b[valid]
    out_dist[members[valid]] = dist_b[valid]
    # unfilled slots (inf from the rerank) → index 0 / BIG
    bad = ~np.isfinite(out_dist) | (out_nbr >= n)
    out_nbr[bad] = 0
    out_dist[bad] = BIG
    return out_nbr, out_dist


def knn_recall(nbr_approx: np.ndarray, nbr_exact: np.ndarray,
               dist_approx: Optional[np.ndarray] = None) -> float:
    """Mean fraction of true k-neighbors recovered per row.

    Pass ``dist_approx`` (the distances returned alongside ``nbr_approx``)
    so unfilled sentinel slots (index 0 / distance ``BIG``) count as misses —
    without it, a filler index 0 would score as a hit on exactly the rows
    where the approximation failed, whenever 0 is a true neighbor."""
    hits = 0
    for r, (a, b) in enumerate(zip(nbr_approx, nbr_exact)):
        if dist_approx is not None:
            a = a[dist_approx[r] < FINITE]
        hits += len(np.intersect1d(a, b, assume_unique=False))
    return hits / nbr_exact.size
