"""MIL / Graph-MIL trainables (the reference's ``train_mil`` /
``train_graph_mil`` harness, ``utils_g_mil.py:70-285,608-852``).

Semantics preserved: stratified 80/20 train/val split off the training bags
(seeded, sklearn-identical membership), inverse-class-frequency resampling
with replacement, **per-bag optimizer steps** (the reference trains bs=1),
the CE(log(probs+1e-9)) loss idiom, per-epoch 10-metric evaluation, dual
best-checkpoint tracking (val bacc with +1e-6 margin / val loss with −1e-6),
patience early stop, and a final report with test metrics from the best-bacc
checkpoint.

TPU-first: the whole epoch of per-bag updates runs as ONE jitted
``lax.scan`` over the resampled bag array (bags padded to fixed N with
validity masks) — reproducing bs=1 dynamics without bs=1 dispatch overhead;
evaluation vmaps over all bags at once.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import metrics as M
from ..core.optim import make_optimizer
from ..core.splits import StratifiedShuffleSplit, weighted_sample_indices
from ..core.train_state import TrainState
from ..models.graph_mil import GraphMIL
from ..models.graphs import (build_grid_adj_dynamic, build_knn_adj,
                             build_random_adj)
from ..models.mil import AttentionMIL, mil_loss


def pad_bags(bags: Sequence[np.ndarray], max_n: Optional[int] = None):
    """list of [N_i, F] → (feats [B, N, F], valid [B, N])."""
    max_n = max_n or max(b.shape[0] for b in bags)
    f = bags[0].shape[1]
    feats = np.zeros((len(bags), max_n, f), np.float32)
    valid = np.zeros((len(bags), max_n), bool)
    for i, b in enumerate(bags):
        feats[i, :b.shape[0]] = b
        valid[i, :b.shape[0]] = True
    return feats, valid


def _adj_for_bag(x, valid, cfg, key):
    """Graph topology over the TRUE bag nodes: the reference builds each
    graph from the real N_i instances (``utils_g_mil.py:549-605``), so the
    builders receive ``valid`` — padded rows never occupy neighbor slots and
    the grid covers √n_valid, not √max_n."""
    gtype = cfg.get("graph_type", "grid")
    if gtype == "grid":
        _, adj_mask = build_grid_adj_dynamic(
            valid, bool(cfg.get("connect_diagonals", False)))
        return adj_mask
    if gtype == "knn":
        k = cfg.get("k_neighbors", None)
        return build_knn_adj(x, 8 if k is None else int(k), valid=valid)
    if gtype == "random":
        k = cfg.get("k_neighbors", None)
        return build_random_adj(key, x.shape[0], 4 if k is None else int(k),
                                valid=valid)
    raise ValueError(f"Unsupported graph_type='{gtype}'")


def _make_forward(model, is_graph: bool, cfg):
    def forward(params, x, valid, key, train):
        if is_graph:
            adj = _adj_for_bag(x, valid, cfg, key)
            adj = adj * valid[:, None] * valid[None, :]
            return model.apply({"params": params}, x, adj, valid=valid,
                               train=train, rngs={"dropout": key})
        return model.apply({"params": params}, x, valid=valid, train=train,
                           rngs={"dropout": key})
    return forward


def _make_eval_fn(forward):
    """Build the jitted batch-probs function ONCE per trainable — defining it
    inside the eval call would key a fresh jit cache entry every epoch."""

    @jax.jit
    def run(params, feats, valid):
        def one(x, v):
            probs, _ = forward(params, x, v, jax.random.PRNGKey(0), False)
            return probs
        return jax.vmap(one)(feats, valid)

    return run


def _evaluate_split(eval_fn, params, feats, valid, labels, num_classes):
    """The reference's ``_evaluate_split`` metric bundle
    (``utils_g_mil.py:150-187``)."""
    if len(labels) == 0:
        nan = float("nan")
        return {k: nan for k in ("loss", "acc", "bacc", "auc", "macro_p",
                                 "macro_r", "macro_f1", "weighted_p",
                                 "weighted_r", "weighted_f1")}

    probs = eval_fn(params, feats, valid)
    y = jnp.asarray(labels)
    losses = jax.vmap(mil_loss)(probs, y)
    out = M.evaluate_probs(y, probs, num_classes, loss=losses.mean())
    return {k: float(v) for k, v in out.items()}


def _train_core(model, is_graph: bool, config: Dict, data: Dict, seed: int,
                num_classes: int, patience: int, max_epochs: int,
                report_fn: Optional[Callable[[Dict], None]] = None) -> Dict:
    rng = np.random.RandomState(seed)
    train_feats = [np.asarray(a, np.float32) for a in data["train_feats"]]
    train_labels = np.asarray([int(l) for l in data["train_labels"]])
    test_feats = [np.asarray(a, np.float32) for a in data.get("test_feats", [])]
    test_labels = np.asarray([int(l) for l in data.get("test_labels", [])])

    sss = StratifiedShuffleSplit(n_splits=1, test_size=0.2, random_state=seed)
    tr_idx, va_idx = next(sss.split(np.zeros((len(train_labels), 1)), train_labels))

    max_n = max(b.shape[0] for b in train_feats + (test_feats or []))
    feats_all, valid_all = pad_bags(train_feats, max_n)
    tr_feats, tr_valid = feats_all[tr_idx], valid_all[tr_idx]
    tr_labels = train_labels[tr_idx]
    va_feats, va_valid = feats_all[va_idx], valid_all[va_idx]
    va_labels = train_labels[va_idx]
    if len(test_feats):
        te_feats, te_valid = pad_bags(test_feats, max_n)
    else:
        te_feats = te_valid = None

    forward = _make_forward(model, is_graph, config)
    eval_fn = _make_eval_fn(forward)
    optimizer = make_optimizer(
        config.get("optimizer", "adam"),
        float(config.get("lr", 1e-4)),
        weight_decay=float(config.get("weight_decay", 1e-5)))

    params = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(0)},
        jnp.asarray(tr_feats[0]),
        *((jnp.eye(max_n),) if is_graph else ()),
        valid=jnp.asarray(tr_valid[0]))["params"]
    state = TrainState.create(params, optimizer, jax.random.PRNGKey(seed + 1))

    @jax.jit
    def train_epoch_scan(state, feats, valid, labels, epoch_key):
        """One epoch of per-bag (bs=1) updates as a single scan."""
        n = feats.shape[0]
        keys = jax.random.split(epoch_key, n)

        def step(state, inputs):
            x, v, y, key = inputs
            def loss_fn(p):
                probs, _ = forward(p, x, v, key, True)
                return mil_loss(probs, y)
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads, optimizer), loss

        state, losses = jax.lax.scan(
            step, state, (feats, valid, jnp.asarray(labels), keys))
        return state, losses.mean()

    best_by_bacc = {"params": None, "val_metrics": None, "val_bacc": -np.inf}
    best_by_loss = {"params": None, "val_metrics": None, "val_loss": np.inf}
    epochs_no_improve = 0

    for epoch in range(1, max_epochs + 1):
        order = weighted_sample_indices(tr_labels, None, rng)
        state, _ = train_epoch_scan(
            state, jnp.asarray(tr_feats[order]), jnp.asarray(tr_valid[order]),
            tr_labels[order], jax.random.fold_in(jax.random.PRNGKey(seed), epoch))

        val_metrics = _evaluate_split(eval_fn, state.params, jnp.asarray(va_feats),
                                      jnp.asarray(va_valid), va_labels, num_classes)

        if val_metrics["bacc"] > best_by_bacc["val_bacc"] + 1e-6:
            best_by_bacc = {"params": state.params, "val_metrics": val_metrics,
                            "val_bacc": val_metrics["bacc"]}
            epochs_no_improve = 0
        else:
            epochs_no_improve += 1
        if val_metrics["loss"] < best_by_loss["val_loss"] - 1e-6:
            best_by_loss = {"params": state.params, "val_metrics": val_metrics,
                            "val_loss": val_metrics["loss"]}

        if report_fn is not None:
            report_fn({f"val_{k}": val_metrics[k] for k in
                       ("bacc", "acc", "auc", "loss", "macro_p", "macro_r",
                        "macro_f1", "weighted_p", "weighted_r", "weighted_f1")})
        if epochs_no_improve >= patience:
            break

    for best, key, metric in ((best_by_bacc, "val_bacc", "bacc"),
                              (best_by_loss, "val_loss", "loss")):
        if best["params"] is None:
            vm = _evaluate_split(eval_fn, state.params, jnp.asarray(va_feats),
                                 jnp.asarray(va_valid), va_labels, num_classes)
            best.update({"params": state.params, "val_metrics": vm,
                         key: vm[metric]})

    test_best_bacc = test_best_loss = None
    if te_feats is not None and len(test_labels):
        test_best_bacc = _evaluate_split(
            eval_fn, best_by_bacc["params"], jnp.asarray(te_feats),
            jnp.asarray(te_valid), test_labels, num_classes)
        test_best_loss = _evaluate_split(
            eval_fn, best_by_loss["params"], jnp.asarray(te_feats),
            jnp.asarray(te_valid), test_labels, num_classes)

    vm = best_by_bacc["val_metrics"]
    final_report = {
        "val_bacc": best_by_bacc["val_bacc"],
        "val_acc": vm["acc"], "val_auc": vm["auc"], "val_loss": vm["loss"],
        "val_macro_f1": vm["macro_f1"], "val_weighted_f1": vm["weighted_f1"],
    }
    if test_best_bacc:
        final_report.update({
            "test_bacc": test_best_bacc["bacc"], "test_acc": test_best_bacc["acc"],
            "test_auc": test_best_bacc["auc"], "test_loss": test_best_bacc["loss"],
            "test_macro_f1": test_best_bacc["macro_f1"],
            "test_weighted_f1": test_best_bacc["weighted_f1"],
        })
    if report_fn is not None:
        report_fn(final_report)
    final_report["_best_by_bacc_params"] = best_by_bacc["params"]
    final_report["_best_by_loss_params"] = best_by_loss["params"]
    final_report["_test_best_bacc"] = test_best_bacc  # full 10-metric dicts
    final_report["_test_best_loss"] = test_best_loss
    return final_report


def train_mil(config: Dict, data: Dict, seed: int = 42, num_classes: int = 7,
              patience: int = 8, max_epochs: int = 50,
              report_fn=None) -> Dict:
    input_dim = (data["train_feats"][0].shape[1] if len(data["train_feats"])
                 else data.get("input_dim", 76))
    model = AttentionMIL(input_dim=input_dim,
                         hidden_dim=int(config["hidden_dim"]),
                         att_dim=int(config["att_dim"]),
                         dropout=float(config["dropout"]),
                         num_classes=num_classes)
    return _train_core(model, False, config, data, seed, num_classes,
                       patience, max_epochs, report_fn)


def train_graph_mil(config: Dict, data: Dict, seed: int = 42,
                    num_classes: int = 7, patience: int = 8,
                    max_epochs: int = 50, report_fn=None) -> Dict:
    input_dim = (data["train_feats"][0].shape[1] if len(data["train_feats"])
                 else data.get("input_dim", 76))
    model = graph_mil_from_config(config, input_dim, num_classes)
    return _train_core(model, True, config, data, seed, num_classes,
                       patience, max_epochs, report_fn)


def graph_mil_from_config(config: Dict, input_dim: int,
                          num_classes: int) -> GraphMIL:
    """GraphMIL built from a sampled 19-dim search config
    (``tune_mil.py:170-200``) — shared by the sequential trainable and the
    packed cohort path so both construct the IDENTICAL architecture."""
    return GraphMIL(input_dim=input_dim,
                    gnn_type=config.get("gnn_type", "gcn"),
                    gnn_hidden=int(config.get("gnn_hidden", 128)),
                    gnn_layers=int(config.get("gnn_layers", 2)),
                    gnn_dropout=float(config.get("gnn_dropout", 0.0)),
                    gnn_heads=int(config.get("gnn_heads", 4)),
                    gnn_concat=bool(config.get("gnn_concat", True)),
                    att_dim=int(config.get("att_dim", 64)),
                    att_heads=int(config.get("att_heads", 4)),
                    pool_dropout=float(config.get("pool_dropout", 0.0)),
                    classifier_dim=int(config.get("classifier_dim", 64)),
                    classifier_light=bool(config.get("classifier_light", False)),
                    use_residual=bool(config.get("use_residual", True)),
                    use_layer_norm=bool(config.get("use_layer_norm", True)),
                    num_classes=num_classes)
