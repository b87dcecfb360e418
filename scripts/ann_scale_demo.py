"""Reference-scale approximate-kNN wall-clock demo on one TPU chip.

The reference clusters the FULL train patch-latent table — ~10k images × 196
patches ≈ 2M rows × 768 dims — with cuML UMAP/HDBSCAN
(``/root/reference/cluster_latents.py:26-32``).  This script builds the k=15
neighbor graph for synthetic clustered data at that geometry through
``analysis.ann.approx_knn_graph`` and reports wall-clock plus recall@15
against exact neighbors on 2048 sampled queries (the exact check itself is a
chunked device top-k fold).

    ANN_N=2000000 [ANN_NPROBE=32] python scripts/ann_scale_demo.py

Recorded runs (one v5e chip; README "Measured performance"):
  500k × 768, default nprobe:  262 s wall, recall@15 1.000
  2M × 768 (see README for the r4 entry recorded from this script)
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from multimodal_isic_tpu.analysis.ann import (  # noqa: E402
    approx_knn_graph, knn_recall)

N, D, K = int(os.environ.get("ANN_N", 500_000)), 768, 15
NPROBE = int(os.environ["ANN_NPROBE"]) if "ANN_NPROBE" in os.environ else None
NCLUST = 200
NQ = 2048

rs = np.random.RandomState(0)
print(f"devices: {jax.devices()}", flush=True)

# clustered data like patch latents: 200 gaussian blobs in 768-d
t0 = time.time()
centers = rs.randn(NCLUST, D).astype(np.float32) * 3.0
lab = rs.randint(0, NCLUST, N)
x = centers[lab] + rs.randn(N, D).astype(np.float32)
print(f"data gen: {time.time()-t0:.1f}s ({x.nbytes/1e9:.2f} GB)", flush=True)

t0 = time.time()
nbr, dist = approx_knn_graph(x, k=K, seed=0, nprobe=NPROBE, verbose=True)
wall = time.time() - t0
print(f"approx_knn_graph N={N} D={D} k={K} nprobe={NPROBE}: {wall:.1f}s wall",
      flush=True)

# exact neighbors for NQ sampled queries, chunked over the corpus on device
q_idx = rs.choice(N, NQ, replace=False)
q = jnp.asarray(x[q_idx])
qn = (q ** 2).sum(1)[:, None]
CH = 50_000
best_d = jnp.full((NQ, K + 1), np.inf, jnp.float32)
best_i = jnp.zeros((NQ, K + 1), jnp.int32)


@jax.jit
def fold(best_d, best_i, xc, base):
    d2 = (qn - 2.0 * jnp.dot(q, xc.T, precision=jax.lax.Precision.HIGHEST)
          + (xc ** 2).sum(1)[None, :])
    cand_d = jnp.concatenate([best_d, d2], axis=1)
    cand_i = jnp.concatenate(
        [best_i, jnp.broadcast_to(base + jnp.arange(xc.shape[0]), d2.shape)],
        axis=1).astype(jnp.int32)
    nd, sel = jax.lax.top_k(-cand_d, K + 1)
    return -nd, jnp.take_along_axis(cand_i, sel, axis=1)


t0 = time.time()
for s in range(0, N, CH):
    xc = jnp.asarray(x[s: s + CH])
    best_d, best_i = fold(best_d, best_i, xc, s)
best_i = np.asarray(best_i)
print(f"exact check pass: {time.time()-t0:.1f}s", flush=True)

# drop self from the exact K+1 list
exact = np.zeros((NQ, K), np.int32)
for r in range(NQ):
    row = [i for i in best_i[r] if i != q_idx[r]][:K]
    exact[r] = row

# knn_recall masks sentinel filler slots (index 0 / dist BIG) via the
# returned distances, so an unfilled slot can never score as a hit on rows
# where 0 happens to be a true neighbor.
recall = knn_recall(nbr[q_idx], exact, dist_approx=dist[q_idx])
print(f"recall@{K} on {NQ} sampled queries: {recall:.4f}", flush=True)
print(f"RESULT wall={wall:.1f}s recall={recall:.4f}", flush=True)
