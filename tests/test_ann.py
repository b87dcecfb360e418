"""Approximate kNN (analysis/ann.py): recall vs the exact graph, contract
invariants, and the clustering pipeline running end-to-end on the approx path
— the scalability requirement set by the reference's full-table cuML stage
(``cluster_latents.py:26-32``, ~2M patch rows)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_isic_tpu.analysis.ann import approx_knn_graph, knn_recall
from multimodal_isic_tpu.analysis.embed import knn_graph


def _clustered(rng, n, d=16, n_clusters=12, spread=0.15):
    centers = rng.randn(n_clusters, d) * 3.0
    which = rng.randint(0, n_clusters, n)
    return (centers[which] + rng.randn(n, d) * spread).astype(np.float32), which


def test_recall_at_15_on_clustered_data(rng):
    """Default settings reach recall@15 ≥ 0.9 against the exact graph on
    clustered data (the latent-table geometry the reference clusters)."""
    x, _ = _clustered(rng, 20_000)
    nbr_a, dist_a = approx_knn_graph(x, k=15)
    nbr_e, dist_e = knn_graph(jnp.asarray(x), k=15)
    rec = knn_recall(nbr_a, np.asarray(nbr_e))
    assert rec >= 0.9, f"recall@15 = {rec:.3f}"
    # distances of recovered neighbors are EXACT (rerank is exact)
    row = nbr_a[0]
    true = {int(i): float(d) for i, d in zip(np.asarray(nbr_e)[0],
                                             np.asarray(dist_e)[0])}
    for i, d in zip(row, dist_a[0]):
        if int(i) in true:
            assert float(d) == pytest.approx(true[int(i)], abs=1e-4)


def test_contract_invariants(rng):
    """Self excluded, k columns, indices in range, distances sorted."""
    x, _ = _clustered(rng, 3_000, d=8)
    nbr, dist = approx_knn_graph(x, k=10)
    n = x.shape[0]
    assert nbr.shape == (n, 10) and dist.shape == (n, 10)
    assert (nbr >= 0).all() and (nbr < n).all()
    rows = np.arange(n)[:, None]
    finite = dist < 1e14
    assert (nbr[finite.all(1)] != rows[finite.all(1)]).all()
    d = np.where(finite, dist, np.inf)
    assert (np.diff(d, axis=1) >= -1e-5).all()


def test_cosine_matches_exact_semantics(rng):
    """cosine = euclidean on the unit sphere; scale-invariant like the exact
    path."""
    x, _ = _clustered(rng, 2_000, d=8)
    scales = rng.uniform(0.5, 2.0, (x.shape[0], 1)).astype(np.float32)
    nbr1, _ = approx_knn_graph(x, k=5, metric="cosine", seed=3)
    nbr2, _ = approx_knn_graph(x * scales, k=5, metric="cosine", seed=3)
    agree = np.mean([len(np.intersect1d(a, b)) / 5 for a, b in zip(nbr1, nbr2)])
    assert agree > 0.95


def test_tiny_inputs_fall_back_to_exact(rng):
    x = rng.randn(40, 6).astype(np.float32)
    nbr_a, dist_a = approx_knn_graph(x, k=5)
    nbr_e, dist_e = knn_graph(jnp.asarray(x), k=5)
    np.testing.assert_array_equal(nbr_a, np.asarray(nbr_e))
    np.testing.assert_allclose(dist_a, np.asarray(dist_e), rtol=1e-5)


def test_hdbscan_on_approx_graph_recovers_blobs(rng):
    """The full hierarchical clusterer accepts knn_method='approx' and
    recovers the same blob structure as the exact path."""
    from multimodal_isic_tpu.analysis.embed import hdbscan_cluster

    x, which = _clustered(rng, 4_000, d=8, n_clusters=4, spread=0.05)
    lab_e = hdbscan_cluster(x, min_cluster_size=100, min_samples=5)
    lab_a = hdbscan_cluster(x, min_cluster_size=100, min_samples=5,
                            knn_method="approx")
    for lab in (lab_e, lab_a):
        found = set(lab) - {-1}
        assert len(found) == 4
    # cluster assignments agree up to relabeling: same partition of points
    ok = 0
    for c in set(lab_e) - {-1}:
        members = lab_e == c
        vals, counts = np.unique(lab_a[members], return_counts=True)
        ok += counts.max()
    assert ok / (lab_e >= 0).sum() > 0.98


def test_neighbor_embedding_accepts_approx(rng):
    from multimodal_isic_tpu.analysis.embed import neighbor_embedding

    x, _ = _clustered(rng, 1_500, d=8, n_clusters=3, spread=0.05)
    emb = neighbor_embedding(x, n_components=2, n_neighbors=10, n_epochs=50,
                             knn_method="approx")
    assert emb.shape == (1_500, 2)
    assert np.isfinite(emb).all()
