"""FULL clustering chain at the reference's 2M-row geometry on one TPU chip.

The reference runs, on the complete train patch-latent table (~10k images ×
196 patches ≈ 2M rows), the chain UMAP(n_neighbors=15, n_components=20) →
HDBSCAN(min_cluster_size=50, min_samples=10) on the 20-D embedding → purity
statistics (``/root/reference/cluster_latents.py:26-138``).  r4 demoed only
the kNN stage at this scale; this script runs all four stages and records
per-stage wall-clock and peak host memory:

  1. approx kNN graph on the raw table (k=15) — ``analysis.ann``;
  2. 20-D neighbor embedding REUSING that graph
     (``neighbor_embedding(precomputed_knn=...)``, the cuML
     ``precomputed_knn`` contract) + sampled trustworthiness;
  3. approx kNN on the 20-D embedding (k=16) → ``hdbscan_cluster``
     (precomputed) — HDBSCAN semantics over the embedding, as the reference
     clusters X_red, not X;
  4. ``cluster_purity_stats`` (the reference's same/other-count loops,
     vectorized) + the 10th-percentile weighted-purity threshold.

    ANN_N=2000000 python scripts/cluster_scale_demo.py

Smaller sanity geometry: ANN_N=200000 (≈ the r4 500k demo's budget).
"""
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if os.environ.get("DEMO_PLATFORM"):  # e.g. cpu for smoke runs — the
    # sitecustomize pre-imports jax, so plain JAX_PLATFORMS can't stick
    jax.config.update("jax_platforms", os.environ["DEMO_PLATFORM"])

import jax.numpy as jnp  # noqa: E402

from multimodal_isic_tpu.analysis.ann import approx_knn_graph  # noqa: E402
from multimodal_isic_tpu.analysis.cluster import (  # noqa: E402
    cluster_purity_stats, filter_low_purity_clusters, patient_class_weights,
    trustworthiness)
from multimodal_isic_tpu.analysis.embed import (  # noqa: E402
    hdbscan_cluster, neighbor_embedding)

N = int(os.environ.get("ANN_N", 2_000_000))
D, K = 768, 15
NCLUST = 200
EPOCHS = int(os.environ.get("EMB_EPOCHS", 200))
# stage outputs cache here so a crashed run (r5 hit a TPU-worker crash
# 33 min in, mid-embedding) resumes instead of repaying completed stages
CACHE = os.environ.get("CLUSTER_DEMO_CACHE", f"/tmp/cluster_demo_{N}")
os.makedirs(CACHE, exist_ok=True)

stages = {}
_STAGE_JSON = os.path.join(CACHE, "stages.json")
if os.path.exists(_STAGE_JSON):
    stages = json.load(open(_STAGE_JSON))


def mark(name, t0):
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # GB
    stages[name] = {"wall_s": round(dt, 1), "peak_rss_gb": round(rss, 2)}
    json.dump(stages, open(_STAGE_JSON, "w"))
    print(f"[stage] {name}: {dt:.1f}s (peak RSS {rss:.1f} GB)", flush=True)


def cached(name, fn):
    """np.savez-backed stage cache; wall/RSS recorded only on the live run."""
    path = os.path.join(CACHE, f"{name}.npz")
    if os.path.exists(path):
        blob = np.load(path)
        out = tuple(blob[k] for k in sorted(blob.files))
        print(f"[stage] {name}: cached ({stages.get(name, {}).get('wall_s', '?')}s recorded)",
              flush=True)
        return out[0] if len(out) == 1 else out
    t0 = time.time()
    out = fn()
    mark(name, t0)
    arrs = out if isinstance(out, tuple) else (out,)
    np.savez(path, **{f"a{i}": np.asarray(a) for i, a in enumerate(arrs)})
    return out


print(f"devices: {jax.devices()}", flush=True)

# clustered data like patch latents: NCLUST gaussian blobs in 768-d, with
# blob ids as the 'target' so purity has ground truth to recover
rs = np.random.RandomState(0)
t0 = time.time()
centers = rs.randn(NCLUST, D).astype(np.float32) * 3.0
lab = rs.randint(0, NCLUST, N)
x = (centers[lab] + rs.randn(N, D).astype(np.float32))
targets = lab % 7  # 7 dx classes, as the reference's target column
mark("datagen", t0)

# ---- stage 1: approx kNN on the raw table --------------------------------
nbr, dist = cached("knn_raw",
                   lambda: approx_knn_graph(x, k=K, seed=0, verbose=True))

# ---- stage 2: 20-D neighbor embedding on the precomputed graph -----------
emb = cached("embed_20d",
             lambda: neighbor_embedding(x, n_components=20, n_neighbors=K,
                                        n_epochs=EPOCHS, seed=0,
                                        precomputed_knn=(nbr, dist),
                                        epoch_chunk=int(os.environ.get(
                                            "EMB_CHUNK", 5)),
                                        layout_checkpoint_dir=CACHE,
                                        checkpoint_every=int(os.environ.get(
                                            "EMB_CKPT_EVERY", 25)),
                                        verbose=True))

# trustworthiness on a sample (the full N² statistic is out of reach for any
# implementation; the reference's cuML call computes it on its GPU table)
t0 = time.time()
sel = rs.choice(N, 4096, replace=False)
tw = float(trustworthiness(x[sel], np.asarray(emb)[sel], n_neighbors=5))
mark("trustworthiness_4k", t0)
print(f"trustworthiness (4096-sample): {tw:.4f}", flush=True)

del nbr, dist

# ---- stage 3: HDBSCAN on the embedding ------------------------------------
nbr_e, dist_e = cached(
    "knn_embedding",
    lambda: approx_knn_graph(np.asarray(emb, np.float32), k=16, seed=1,
                             verbose=True))

labels = cached(
    "hdbscan",
    lambda: hdbscan_cluster(np.asarray(emb, np.float32), min_cluster_size=50,
                            min_samples=10, precomputed_knn=(nbr_e, dist_e)))
n_clusters = len(np.unique(labels[labels >= 0]))
noise_frac = float((labels < 0).mean())
print(f"clusters: {n_clusters}, noise fraction: {noise_frac:.4f}", flush=True)

# ---- stage 4: purity statistics (reference :58-138) -----------------------
t0 = time.time()
# patient-frequency class weights: 196 consecutive rows = one synthetic
# patient (the reference's 196-patch images), patient target = modal row
n_pat = N // 196
pat_targets = np.array([np.bincount(targets[i * 196:(i + 1) * 196]).argmax()
                        for i in range(n_pat)])
weights = patient_class_weights(pat_targets, num_classes=7)
stats = cluster_purity_stats(labels, targets, num_classes=7,
                             class_weights=weights)
keep_mask, threshold = filter_low_purity_clusters(stats, percentile=10.0)
mark("purity_stats", t0)
print(f"10th-percentile weighted purity threshold: {threshold:.4f}; "
      f"{int(keep_mask.sum())}/{N} patches kept", flush=True)
valid = labels >= 0
med_purity = float(np.median(stats["cluster_prop_same"][valid])) if valid.any() else float("nan")
print(f"median per-point cluster_prop_same: {med_purity:.4f}", flush=True)

total = sum(s["wall_s"] for s in stages.values())
out = {"n": N, "d": D, "k": K, "stages": stages, "total_wall_s": round(total, 1),
       "n_clusters": n_clusters, "noise_frac": round(noise_frac, 4),
       "trustworthiness_4k": round(tw, 4),
       "median_prop_same": round(med_purity, 4)}
print("RESULT " + json.dumps(out), flush=True)
