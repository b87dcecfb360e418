"""MIL & Graph-MIL: torch parity for AttentionMIL, graph-builder and layer
goldens, padded-bag invariance, the bs=1-scan trainable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from multimodal_isic_tpu.models import graphs as G
from multimodal_isic_tpu.models.graph_mil import (
    GCNLayer, GINLayer, GraphMIL, GraphSAGELayer,
)
from multimodal_isic_tpu.models.mil import AttentionMIL, mil_loss
from multimodal_isic_tpu.train.mil import pad_bags, train_graph_mil, train_mil

NC = 7


# ------------------------------------------------- AttentionMIL torch parity

def test_attention_mil_parity_vs_torch(rng):
    model = AttentionMIL(input_dim=12, hidden_dim=16, att_dim=8, dropout=0.5)
    x = rng.randn(20, 12).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, jnp.asarray(x))["params"]

    # torch oracle with the reference's exact architecture (utils_g_mil.py:15-36)
    tfe = tnn.Linear(12, 16)
    ta1, ta2 = tnn.Linear(16, 8), tnn.Linear(8, 1)
    tcls = tnn.Linear(16, NC)
    def port(tmod, p):
        tmod.weight.data = torch.tensor(np.asarray(p["kernel"]).T)
        tmod.bias.data = torch.tensor(np.asarray(p["bias"]))
    port(tfe, params["feat_fc"]); port(ta1, params["att_fc1"])
    port(ta2, params["att_fc2"]); port(tcls, params["classifier"])

    with torch.no_grad():
        h = F.relu(tfe(torch.tensor(x)))
        a = torch.softmax(ta2(torch.tanh(ta1(h))), dim=0)
        z = torch.sum(a * h, dim=0)
        probs_t = torch.softmax(tcls(z), dim=0)

    probs, att = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(probs), probs_t.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(att), a.numpy(), rtol=1e-4, atol=1e-6)


def test_mil_loss_matches_torch_idiom(rng):
    probs = np.abs(rng.rand(NC).astype(np.float32))
    probs = probs / probs.sum()
    y = 3
    expected = F.cross_entropy(torch.log(torch.tensor(probs) + 1e-9).unsqueeze(0),
                               torch.tensor([y])).item()
    assert float(mil_loss(jnp.asarray(probs), jnp.int32(y))) == pytest.approx(
        expected, rel=1e-5)


def test_padded_bag_invariance(rng):
    """Padding instances must not change the bag's probabilities."""
    model = AttentionMIL(input_dim=8, hidden_dim=16, att_dim=8, dropout=0.0)
    x = rng.randn(10, 8).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, jnp.asarray(x))["params"]
    p_plain, _ = model.apply({"params": params}, jnp.asarray(x), train=False)
    xp = np.concatenate([x, 999.0 * np.ones((6, 8), np.float32)])
    valid = np.array([True] * 10 + [False] * 6)
    p_padded, att = model.apply({"params": params}, jnp.asarray(xp),
                                valid=jnp.asarray(valid), train=False)
    np.testing.assert_allclose(np.asarray(p_padded), np.asarray(p_plain),
                               rtol=1e-5, atol=1e-6)
    assert np.asarray(att)[10:].sum() == pytest.approx(0.0, abs=1e-12)


# ------------------------------------------------------------ graph builders

def test_grid_adjacency_matches_reference_loops():
    adj_norm, adj_mask = G.build_grid_adj(16)
    an, am = np.asarray(adj_norm), np.asarray(adj_mask)
    # reference semantics: 4-neighborhood + self loops, row-normalized D^-1 A
    assert am[0, 1] == 1 and am[0, 4] == 1 and am[0, 0] == 1
    assert am[0, 5] == 0  # no diagonal
    assert am.sum() == 16 + 2 * (2 * 4 * 3)  # self + undirected grid edges
    np.testing.assert_allclose(an.sum(axis=1), 1.0, rtol=1e-6)
    # diagonals variant
    _, amd = G.build_grid_adj(16, connect_diagonals=True)
    assert np.asarray(amd)[0, 5] == 1


def test_knn_adjacency_matches_sklearn(rng):
    from sklearn.neighbors import NearestNeighbors
    x = rng.randn(30, 6).astype(np.float32)
    adj = np.asarray(G.build_knn_adj(jnp.asarray(x), k=5))
    nn = NearestNeighbors(n_neighbors=6).fit(x)  # includes self
    _, nbrs = nn.kneighbors(x)
    for i in range(30):
        expected = set(nbrs[i][nbrs[i] != i][:5])
        assert set(np.where(adj[i] > 0)[0]) == expected, i


def test_random_adjacency_degree_and_symmetry():
    adj = np.asarray(G.build_random_adj(jax.random.PRNGKey(0), 20, k=4))
    assert (adj == adj.T).all()
    assert np.diag(adj).sum() == 0
    assert (adj.sum(1) >= 4).all()  # symmetrization can only add edges


def test_knn_adjacency_valid_aware(rng):
    """Padded bags: kNN must be computed over the TRUE instances only — the
    reference builds it from the real N_i nodes (utils_g_mil.py:527-546), so
    padding zero-rows may never occupy neighbor slots."""
    n_real, n_pad, k = 12, 20, 5
    x_real = 10.0 + rng.randn(n_real, 6).astype(np.float32)  # far from zero
    x_pad = np.zeros((n_pad, 6), np.float32)
    x_pad[:n_real] = x_real
    valid = np.zeros(n_pad, bool)
    valid[:n_real] = True

    adj_pad = np.asarray(G.build_knn_adj(jnp.asarray(x_pad), k=k,
                                         valid=jnp.asarray(valid)))
    adj_real = np.asarray(G.build_knn_adj(jnp.asarray(x_real), k=k))
    # identical topology on the real block, nothing anywhere else
    np.testing.assert_array_equal(adj_pad[:n_real, :n_real], adj_real)
    assert adj_pad[n_real:].sum() == 0 and adj_pad[:, n_real:].sum() == 0
    # every valid node keeps its full k neighbors (not silently fewer)
    assert (adj_pad[:n_real].sum(1) == k).all()
    # tiny bag: n_valid-1 < k degrades gracefully to n_valid-1 neighbors
    small_valid = np.zeros(n_pad, bool)
    small_valid[:3] = True
    adj_small = np.asarray(G.build_knn_adj(jnp.asarray(x_pad), k=k,
                                           valid=jnp.asarray(small_valid)))
    assert (adj_small[:3].sum(1) == 2).all()
    assert adj_small[3:].sum() == 0


def test_random_adjacency_valid_aware():
    n_real, n_pad, k = 9, 16, 4
    valid = np.zeros(n_pad, bool)
    valid[:n_real] = True
    adj = np.asarray(G.build_random_adj(jax.random.PRNGKey(3), n_pad, k=4,
                                        valid=jnp.asarray(valid)))
    assert (adj == adj.T).all()
    assert np.diag(adj).sum() == 0
    # no edge touches a padded node; every valid node sampled k targets
    assert adj[n_real:].sum() == 0 and adj[:, n_real:].sum() == 0
    assert (adj[:n_real].sum(1) >= k).all()


def test_grid_adjacency_dynamic_true_bag_size():
    """A bag of 9 valid nodes in a 16-padded array gets a 3x3 grid (the
    reference builds the grid over the real node count), NOT the first 9
    nodes of a 4x4 grid."""
    valid = np.zeros(16, bool)
    valid[:9] = True
    adj_norm, adj_mask = G.build_grid_adj_dynamic(jnp.asarray(valid))
    ref_norm, ref_mask = G.build_grid_adj(9)
    np.testing.assert_array_equal(np.asarray(adj_mask)[:9, :9],
                                  np.asarray(ref_mask))
    np.testing.assert_allclose(np.asarray(adj_norm)[:9, :9],
                               np.asarray(ref_norm), rtol=1e-6)
    # padded nodes: self-loop only
    off = np.asarray(adj_mask)[9:]
    assert (off.sum(1) == 1).all() and (np.diag(np.asarray(adj_mask))[9:] == 1).all()
    # full bag reproduces the static builder exactly
    _, m16 = G.build_grid_adj_dynamic(jnp.ones(16, bool),
                                      connect_diagonals=True)
    _, ref16 = G.build_grid_adj(16, connect_diagonals=True)
    np.testing.assert_array_equal(np.asarray(m16), np.asarray(ref16))


# ------------------------------------------------------------- graph layers

def test_gcn_layer_matches_formula(rng):
    x = rng.randn(6, 4).astype(np.float32)
    adj = (rng.rand(6, 6) > 0.5).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 0)
    layer = GCNLayer(5)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(adj))
    out = np.asarray(layer.apply(params, jnp.asarray(x), jnp.asarray(adj)))

    w = np.asarray(params["params"]["lin"]["kernel"])
    b = np.asarray(params["params"]["lin"]["bias"])
    a = adj + np.eye(6)
    d = 1 / np.sqrt(a.sum(1))
    expected = (a * d[:, None] * d[None, :]) @ (x @ w + b)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_gin_layer_matches_formula(rng):
    x = rng.randn(5, 3).astype(np.float32)
    adj = np.ones((5, 5), np.float32) - np.eye(5, dtype=np.float32)
    layer = GINLayer(4)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(adj))
    out = np.asarray(layer.apply(variables, jnp.asarray(x), jnp.asarray(adj)))
    p = variables["params"]
    agg = adj @ x + (1.0 + 0.0) * x  # eps initialized to 0
    h = agg @ np.asarray(p["mlp_fc1"]["kernel"]) + np.asarray(p["mlp_fc1"]["bias"])
    mu, var = h.mean(-1, keepdims=True), h.var(-1, keepdims=True)
    h = (h - mu) / np.sqrt(var + 1e-6)
    h = h * np.asarray(p["mlp_ln"]["scale"]) + np.asarray(p["mlp_ln"]["bias"])
    h = np.maximum(h, 0)
    expected = h @ np.asarray(p["mlp_fc2"]["kernel"]) + np.asarray(p["mlp_fc2"]["bias"])
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_sage_layer_l2_normalized(rng):
    x = rng.randn(6, 4).astype(np.float32)
    adj = np.maximum((rng.rand(6, 6) > 0.5), np.eye(6) == 2).astype(np.float32)
    layer = GraphSAGELayer(5)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(adj))
    out = np.asarray(layer.apply(variables, jnp.asarray(x), jnp.asarray(adj)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("gnn_type", ["gcn", "gin", "graphsage", "gat", "transformer"])
def test_graph_mil_forward_all_types(rng, gnn_type):
    model = GraphMIL(input_dim=16, gnn_type=gnn_type, gnn_hidden=8,
                     gnn_layers=2, gnn_heads=2, att_dim=8, att_heads=3,
                     classifier_dim=8, num_classes=NC)
    x = rng.randn(9, 16).astype(np.float32)
    _, adj = G.build_grid_adj(9)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.asarray(x), adj)
    probs, att = model.apply(variables, jnp.asarray(x), adj, train=False)
    assert probs.shape == (NC,)
    assert att.shape == (9, 3)
    assert float(probs.sum()) == pytest.approx(1.0, rel=1e-5)


# ---------------------------------------------------------------- trainables

def _bags(rng, n_bags=40, bag_n=12, f=10):
    labels = rng.randint(0, 3, n_bags)
    bags = []
    for i in range(n_bags):
        b = rng.randn(bag_n - rng.randint(0, 4), f).astype(np.float32)
        b[:, labels[i]] += 2.0  # informative feature per class
        bags.append(b)
    return bags, labels


def test_train_mil_learns_and_reports(rng):
    bags, labels = _bags(rng)
    te_bags, te_labels = _bags(rng, n_bags=15)
    data = {"train_feats": bags, "train_labels": labels,
            "test_feats": te_bags, "test_labels": te_labels}
    reports = []
    cfg = {"hidden_dim": 32, "att_dim": 16, "dropout": 0.1,
           "optimizer": "adamw", "lr": 3e-3, "weight_decay": 1e-4}
    out = train_mil(cfg, data, seed=42, num_classes=3, patience=10,
                    max_epochs=12, report_fn=reports.append)
    assert out["val_bacc"] > 0.8
    assert out["test_bacc"] > 0.6
    assert len(reports) >= 2
    assert "test_weighted_f1" in out


@pytest.mark.parametrize("graph_type", ["grid", "knn"])
def test_train_graph_mil_runs(rng, graph_type):
    bags, labels = _bags(rng, n_bags=24, bag_n=9, f=8)
    bags = [b[:9] if len(b) >= 9 else np.pad(b, ((0, 9 - len(b)), (0, 0)))
            for b in bags]  # grid graphs need a square node count
    data = {"train_feats": bags, "train_labels": labels}
    cfg = {"gnn_type": "gcn", "gnn_hidden": 8, "gnn_layers": 2,
           "att_dim": 8, "classifier_dim": 8, "classifier_light": True,
           "optimizer": "adam", "lr": 1e-3, "graph_type": graph_type,
           "k_neighbors": 4}
    out = train_graph_mil(cfg, data, seed=1, num_classes=3, patience=3,
                          max_epochs=3)
    assert np.isfinite(out["val_bacc"])
    assert out["_best_by_bacc_params"] is not None
