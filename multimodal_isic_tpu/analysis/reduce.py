"""Radiomics feature-reduction pipeline (``reduce_dim.py`` semantics).

Stages, in the reference's order (``reduce_dim.py:94-122``):
variance filter (1e-3) → train-anchored standardization → L1-logistic feature
selection with cross-validated C → |ρ| > 0.95 correlation drop → test columns
aligned to train.

TPU-first: the L1-logistic path fits all (C, class) problems as one batched
FISTA solve on device (vmap over the C grid × one-vs-rest classes), replacing
liblinear; like the reference's ``LogisticRegressionCV(..., scoring='f1',
cv=StratifiedKFold(5, shuffle, rs=42))`` under ovr, each class's binary
subproblem is scored with binary F1 across folds and keeps its own best C
(sklearn's per-class ``C_``); features are kept where the mean |coefficient|
across classes exceeds the ``SelectFromModel`` L1 threshold (1e-5).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..core.splits import StratifiedKFold


def filter_low_variance(train_df: pd.DataFrame, test_df: pd.DataFrame,
                        threshold: float = 1e-3):
    """sklearn ``VarianceThreshold``: keep features with Var(x) > threshold
    (biased variance)."""
    var = train_df.values.astype(np.float64).var(axis=0)
    keep = var > threshold
    cols = train_df.columns[keep]
    return train_df[cols], test_df[cols]


def normalize_features(train_df: pd.DataFrame, test_df: pd.DataFrame):
    """StandardScaler fit on train (ddof=0), applied to both."""
    x = train_df.values.astype(np.float64)
    mean = x.mean(axis=0)
    std = x.std(axis=0)
    std = np.where(std == 0, 1.0, std)
    return (pd.DataFrame((train_df.values - mean) / std, columns=train_df.columns),
            pd.DataFrame((test_df.values - mean) / std, columns=train_df.columns))


@partial(jax.jit, static_argnames=("iters",))
def _fista_l1_logistic(X, Y, sw, C, iters: int = 300):
    """Batched one-vs-rest L1 logistic regression with per-sample weights.

    X: [N, D] (standardized), Y: [K, N] ±1 labels, sw: [N] sample weights,
    C: inverse regularization — a scalar shared across classes or a [K]
    vector (LogisticRegressionCV keeps a per-class ``C_`` under ovr).
    Minimizes ``C·Σ_i sw_i·log(1+exp(-y_i(x_i·w+b))) + ||w||₁`` (liblinear's
    objective with ``class_weight='balanced'``), solved with FISTA; intercept
    unpenalized.  → (W [K, D], b [K])."""
    n, d = X.shape
    C = jnp.broadcast_to(jnp.asarray(C, jnp.float32), (Y.shape[0],))
    # Lipschitz bound: C/4 · λ_max(Xᵀ diag(sw) X) (+ intercept), power iteration
    Xs = X * jnp.sqrt(sw)[:, None]
    v = jnp.ones((d,)) / jnp.sqrt(d)
    def power(v, _):
        v = Xs.T @ (Xs @ v)
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12), None
    v, _ = jax.lax.scan(power, v, None, length=16)
    sq_norm = jnp.maximum(v @ (Xs.T @ (Xs @ v)), 1e-6)

    def solve_one(y, Ck):
        L = Ck * 0.25 * (sq_norm + sw.sum())
        w = jnp.zeros(d)
        b = jnp.zeros(())
        zw, zb, t = w, b, 1.0

        def step(carry, _):
            w, b, zw, zb, t = carry
            margin = y * (X @ zw + zb)
            s = sw * jax.nn.sigmoid(-margin)
            gw = -Ck * (X.T @ (y * s))
            gb = -Ck * jnp.sum(y * s)
            w_new = zw - gw / L
            b_new = zb - gb / L
            # soft threshold; liblinear L1-penalizes the intercept too (it is
            # just an appended all-ones column with intercept_scaling=1)
            w_new = jnp.sign(w_new) * jnp.maximum(jnp.abs(w_new) - 1.0 / L, 0.0)
            b_new = jnp.sign(b_new) * jnp.maximum(jnp.abs(b_new) - 1.0 / L, 0.0)
            t_new = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
            beta = (t - 1.0) / t_new
            zw_new = w_new + beta * (w_new - w)
            zb_new = b_new + beta * (b_new - b)
            return (w_new, b_new, zw_new, zb_new, t_new), None

        (w, b, _, _, _), _ = jax.lax.scan(step, (w, b, zw, zb, t), None, length=iters)
        return w, b

    return jax.vmap(solve_one)(Y, C)


def _binary_f1(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """sklearn ``f1_score`` with pos_label=1, the scorer LogisticRegressionCV
    applies to each one-vs-rest subproblem under ``scoring='f1'``."""
    tp = np.sum(y_true & y_pred)
    fp = np.sum(~y_true & y_pred)
    fn = np.sum(y_true & ~y_pred)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    return float(2 * p * r / (p + r) if p + r else 0.0)


def lasso_select(train_df: pd.DataFrame, y_train, test_df: pd.DataFrame,
                 C_values="auto", n_folds: int = 5, seed: int = 42,
                 iters: int = 300, balanced: bool = True):
    """CV-selected-C L1-logistic feature selection (``reduce_dim.py:34-58``)."""
    Cs = np.logspace(-2, 1, 20) if isinstance(C_values, str) else np.asarray(C_values)
    X = jnp.asarray(train_df.values, jnp.float32)
    y = np.asarray(y_train).astype(int)
    classes = np.unique(y)
    k = len(classes)

    # class_weight='balanced': per-sample weight folded into C via row scaling
    if balanced:
        counts = np.bincount(y, minlength=classes.max() + 1).astype(float)
        w_sample = len(y) / (k * counts[y])
    else:
        w_sample = np.ones(len(y))

    def fit_weighted(X_np, y_np, w_np, C):
        Y = np.stack([np.where(y_np == c, 1.0, -1.0) for c in classes])
        return _fista_l1_logistic(
            jnp.asarray(X_np, jnp.float32), jnp.asarray(Y, jnp.float32),
            jnp.asarray(w_np, jnp.float32), jnp.float32(C), iters)

    # the whole C grid solves as one batched FISTA (vmap over C on top of the
    # solver's vmap over one-vs-rest classes): 20 sequential liblinear fits
    # per fold collapse to a single device program
    fit_grid = jax.jit(jax.vmap(
        lambda X, Y, w, C: _fista_l1_logistic(X, Y, w, C, iters),
        in_axes=(None, None, None, 0)), static_argnames=())

    kf = StratifiedKFold(n_folds, shuffle=True, random_state=seed)
    folds = list(kf.split(np.zeros((len(y), 1)), y))
    # LogisticRegressionCV under ovr scores each class's BINARY subproblem
    # with binary F1 and keeps a per-class best C (its per-class ``C_``)
    scores = np.zeros((len(Cs), k))
    cs_dev = jnp.asarray(Cs, jnp.float32)
    for tr_idx, va_idx in folds:
        Y = np.stack([np.where(y[tr_idx] == c, 1.0, -1.0) for c in classes])
        W_all, b_all = fit_grid(jnp.asarray(train_df.values[tr_idx], jnp.float32),
                                jnp.asarray(Y, jnp.float32),
                                jnp.asarray(w_sample[tr_idx], jnp.float32),
                                cs_dev)  # [n_C, K, D], [n_C, K]
        logits = np.einsum("nd,ckd->cnk", train_df.values[va_idx],
                           np.asarray(W_all)) + np.asarray(b_all)[:, None, :]
        for ci in range(len(Cs)):
            for ki, c in enumerate(classes):
                scores[ci, ki] += _binary_f1(y[va_idx] == c,
                                             logits[ci, :, ki] > 0)
    best_C = Cs[np.argmax(scores, axis=0)]  # [K] per-class C_

    W, b = fit_weighted(train_df.values, y, w_sample, best_C)
    importance = np.abs(np.asarray(W)).mean(axis=0)
    keep = importance > 1e-5  # SelectFromModel threshold for L1 models
    cols = train_df.columns[keep]
    return train_df[cols], test_df[cols]


def drop_correlated_features(df: pd.DataFrame, threshold: float = 0.95):
    """Upper-triangle |ρ| > threshold column drop (``reduce_dim.py:60-64``)."""
    corr = np.abs(np.corrcoef(df.values.astype(np.float64), rowvar=False))
    upper = np.triu(corr, k=1)
    to_drop = [df.columns[j] for j in range(len(df.columns))
               if np.any(upper[:, j] > threshold)]
    return df.drop(columns=to_drop), to_drop


def reduce_features(rad_train: pd.DataFrame, rad_test: pd.DataFrame,
                    y_train, variance_threshold: float = 1e-3,
                    corr_threshold: float = 0.95, seed: int = 42,
                    log=print) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """The full ``reduce_dim.py`` workload with its per-channel drop logging."""
    num_features = len(rad_train.columns) // 4
    log(f"Initial features: {rad_train.shape[1]}")

    tr, te = filter_low_variance(rad_train, rad_test, variance_threshold)
    log(f"Features after variance filtering: {tr.shape[1]}")
    _log_channel_drops(log, "variance filtering", tr.columns, num_features)

    tr, te = normalize_features(tr, te)
    tr, te = lasso_select(tr, y_train, te, seed=seed)
    log(f"Features after Lasso selection: {tr.shape[1]}")
    _log_channel_drops(log, "Lasso selection", tr.columns, num_features)

    tr, dropped = drop_correlated_features(tr, corr_threshold)
    log(f"Features after dropping correlated features: {tr.shape[1]}")
    te = te[tr.columns]
    return tr, te


def _log_channel_drops(log, stage, columns, num_features):
    for tag in ("_gs", "_red", "_green", "_blue"):
        kept = len([c for c in columns if tag in c])
        log(f"Dropped due to {stage} - {tag[1:]}: {num_features - kept}")
