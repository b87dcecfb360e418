"""Classification metrics with sklearn-equivalent semantics, jit-friendly.

Reimplements exactly the metric definitions used by the reference —
``balanced_accuracy_score``/``classification_report`` (``net_utils.py:110-123``),
``roc_auc_score(multi_class='ovr')`` / ``precision_recall_fscore_support``
(``utils_g_mil.py:172-187``) — as pure JAX functions over fixed-size class
axes, so they run on device inside jitted eval loops.  ``classification_report``
renders the same text layout as sklearn's (digits configurable).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def confusion_matrix(y_true: Array, y_pred: Array, num_classes: int) -> Array:
    """[num_classes, num_classes] counts, rows = true class."""
    idx = y_true * num_classes + y_pred
    flat = jnp.bincount(idx, length=num_classes * num_classes)
    return flat.reshape(num_classes, num_classes)


def accuracy(y_true: Array, y_pred: Array) -> Array:
    return jnp.mean((y_true == y_pred).astype(jnp.float32))


def balanced_accuracy(y_true: Array, y_pred: Array, num_classes: int) -> Array:
    """Mean recall over classes present in ``y_true`` (sklearn semantics)."""
    cm = confusion_matrix(y_true, y_pred, num_classes).astype(jnp.float32)
    support = cm.sum(axis=1)
    present = support > 0
    recall = jnp.where(present, cm.diagonal() / jnp.maximum(support, 1.0), 0.0)
    return recall.sum() / jnp.maximum(present.sum(), 1)


def _tie_averaged_ranks(scores: Array) -> Array:
    """1-based average ranks with tie correction (Mann-Whitney convention)."""
    order = jnp.sort(scores)
    c_less = jnp.searchsorted(order, scores, side="left")
    c_leq = jnp.searchsorted(order, scores, side="right")
    return c_less.astype(jnp.float32) + (c_leq - c_less + 1).astype(jnp.float32) / 2.0


def binary_auc(y_true01: Array, scores: Array) -> Array:
    """ROC AUC of a binary problem via the rank statistic (tie-aware)."""
    ranks = _tie_averaged_ranks(scores)
    n_pos = jnp.sum(y_true01).astype(jnp.float32)
    n_neg = y_true01.shape[0] - n_pos
    rank_sum = jnp.sum(jnp.where(y_true01 > 0, ranks, 0.0))
    u = rank_sum - n_pos * (n_pos + 1.0) / 2.0
    denom = n_pos * n_neg
    return jnp.where(denom > 0, u / jnp.maximum(denom, 1.0), jnp.nan)


def roc_auc_ovr(y_true: Array, y_score: Array, num_classes: int) -> Array:
    """Macro one-vs-rest multiclass AUC, matching
    ``sklearn.roc_auc_score(y_true, y_score, multi_class='ovr')``.

    sklearn raises when a class is absent from ``y_true`` (the reference wraps
    the call in try/except → NaN, ``utils_g_mil.py:175-178``); we return NaN in
    that case to reproduce the observable behavior.
    """
    counts = jnp.bincount(y_true, length=num_classes)
    per_class = jnp.stack(
        [binary_auc((y_true == c).astype(jnp.int32), y_score[:, c]) for c in range(num_classes)]
    )
    macro = jnp.mean(per_class)
    return jnp.where(jnp.all(counts > 0), macro, jnp.nan)


def precision_recall_fscore(
    y_true: Array, y_pred: Array, num_classes: int, average: str = "macro"
) -> Dict[str, Array]:
    """``precision_recall_fscore_support(..., zero_division=0)`` semantics.

    Macro averages run over labels present in ``y_true`` OR ``y_pred``
    (sklearn's default label set); weighted averages weight by true support.
    """
    cm = confusion_matrix(y_true, y_pred, num_classes).astype(jnp.float32)
    tp = cm.diagonal()
    support = cm.sum(axis=1)
    predicted = cm.sum(axis=0)
    precision = jnp.where(predicted > 0, tp / jnp.maximum(predicted, 1.0), 0.0)
    recall = jnp.where(support > 0, tp / jnp.maximum(support, 1.0), 0.0)
    pr = precision + recall
    f1 = jnp.where(pr > 0, 2.0 * precision * recall / jnp.maximum(pr, 1e-38), 0.0)

    present = (support > 0) | (predicted > 0)
    n_present = jnp.maximum(present.sum(), 1)
    if average == "macro":
        avg = lambda v: jnp.where(present, v, 0.0).sum() / n_present
    elif average == "weighted":
        total = jnp.maximum(support.sum(), 1.0)
        avg = lambda v: (v * support).sum() / total
    else:
        raise ValueError(f"unsupported average={average!r}")
    return {
        "precision": avg(precision),
        "recall": avg(recall),
        "f1": avg(f1),
        "per_class_precision": precision,
        "per_class_recall": recall,
        "per_class_f1": f1,
        "support": support,
    }


def evaluate_probs(
    y_true: Array, y_score: Array, num_classes: int, loss: Optional[Array] = None
) -> Dict[str, Array]:
    """The 10-metric bundle streamed per epoch by the reference MIL trainables
    (``utils_g_mil.py:150-187``): loss/acc/bacc/auc + macro & weighted P/R/F1."""
    y_pred = jnp.argmax(y_score, axis=1)
    macro = precision_recall_fscore(y_true, y_pred, num_classes, "macro")
    weighted = precision_recall_fscore(y_true, y_pred, num_classes, "weighted")
    out = {
        "acc": accuracy(y_true, y_pred),
        "bacc": balanced_accuracy(y_true, y_pred, num_classes),
        "auc": roc_auc_ovr(y_true, y_score, num_classes),
        "macro_p": macro["precision"],
        "macro_r": macro["recall"],
        "macro_f1": macro["f1"],
        "weighted_p": weighted["precision"],
        "weighted_r": weighted["recall"],
        "weighted_f1": weighted["f1"],
    }
    if loss is not None:
        out["loss"] = loss
    return out


def classification_report(
    y_true: np.ndarray, y_pred: np.ndarray, digits: int = 5, target_names=None
) -> str:
    """sklearn-layout text report (reference uses digits=5, ``net_utils.py:112``)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    labels = np.unique(np.concatenate([y_true, y_pred]))
    if target_names is None:
        target_names = [str(l) for l in labels]

    rows = []
    supports = []
    for lbl in labels:
        tp = np.sum((y_true == lbl) & (y_pred == lbl))
        fp = np.sum((y_true != lbl) & (y_pred == lbl))
        fn = np.sum((y_true == lbl) & (y_pred != lbl))
        p = tp / (tp + fp) if (tp + fp) > 0 else 0.0
        r = tp / (tp + fn) if (tp + fn) > 0 else 0.0
        f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
        s = int(np.sum(y_true == lbl))
        rows.append((p, r, f, s))
        supports.append(s)
    supports = np.array(supports, dtype=float)
    total = int(supports.sum())

    headers = ["precision", "recall", "f1-score", "support"]
    name_width = max(max(len(n) for n in target_names), len("weighted avg"), digits)
    head_fmt = "{:>{width}s} " + " {:>9}" * len(headers) + "\n"
    report = head_fmt.format("", *headers, width=name_width) + "\n"
    row_fmt = "{:>{width}s} " + " {:>9.{digits}f}" * 3 + " {:>9}\n"
    for name, (p, r, f, s) in zip(target_names, rows):
        report += row_fmt.format(name, p, r, f, s, width=name_width, digits=digits)
    report += "\n"

    acc = float(np.mean(y_true == y_pred)) if len(y_true) else 0.0
    acc_fmt = "{:>{width}s} " + " {:>9}" * 2 + " {:>9.{digits}f}" + " {:>9}\n"
    report += acc_fmt.format("accuracy", "", "", acc, total, width=name_width, digits=digits)

    ps, rs, fs, _ = zip(*rows)
    macro = (float(np.mean(ps)), float(np.mean(rs)), float(np.mean(fs)))
    if supports.sum() > 0:
        w = supports / supports.sum()
    else:
        w = supports
    weighted = (float(np.sum(w * ps)), float(np.sum(w * rs)), float(np.sum(w * fs)))
    report += row_fmt.format("macro avg", *macro, total, width=name_width, digits=digits)
    report += row_fmt.format("weighted avg", *weighted, total, width=name_width, digits=digits)
    return report
