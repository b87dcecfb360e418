"""MIL cross-validation harness (the ``use_latent.py`` workload).

Semantics preserved: patient-level 5-fold StratifiedKFold (sklearn-identical
membership), per-fold re-seeding with ``SEED + fold`` (``use_latent.py:
270-274``), model choice classic/graph from ``config['best_params*']`` with
the reference's defaults, dual best-checkpoint training (by val bacc and by
val loss), held-out-test evaluation of both checkpoints, nanmean/nanstd
aggregation across folds, and crash-safe incremental CSV persistence — one
bad fold yields NaN rows instead of killing the sweep
(``use_latent.py:157-170,472-547``).
"""

from __future__ import annotations

import os
import traceback
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..core.splits import StratifiedKFold
from .mil import train_graph_mil, train_mil

METRIC_KEYS = ("bacc", "acc", "auc", "loss", "macro_f1", "weighted_f1")


def _fold_metrics(final: Dict, test_best_loss: Optional[Dict]) -> Dict[str, float]:
    row = {}
    for k in METRIC_KEYS:
        row[f"val_{k}"] = float(final.get(f"val_{k}", np.nan))
        row[f"test_{k}_best_bacc"] = float(final.get(f"test_{k}", np.nan))
        row[f"test_{k}_best_loss"] = float(
            (test_best_loss or {}).get(k, np.nan))
    return row


def cross_validate_mil(
    bags: Sequence[np.ndarray],
    labels: Sequence[int],
    model_kind: str = "mil",            # 'mil' | 'graph-mil'
    config: Optional[Dict] = None,
    n_folds: int = 5,
    seed: int = 42,
    num_classes: int = 7,
    max_epochs: int = 200,
    patience: int = 16,
    csv_path: Optional[str] = None,
    logger=None,
) -> Dict:
    """→ {folds: [per-fold rows], summary: {metric: (nanmean, nanstd)}}."""
    config = dict(config or {})
    labels = np.asarray([int(l) for l in labels])
    trainable = train_graph_mil if model_kind == "graph-mil" else train_mil
    if model_kind == "mil":
        config.setdefault("hidden_dim", 128)
        config.setdefault("att_dim", 64)
        config.setdefault("dropout", 0.5)
        config.setdefault("optimizer", "adam")
        config.setdefault("lr", 1e-4)

    kf = StratifiedKFold(n_folds, shuffle=True, random_state=seed)
    rows: List[Dict] = []
    for fold, (tr_idx, te_idx) in enumerate(kf.split(np.zeros((len(labels), 1)),
                                                     labels)):
        fold_seed = seed + fold  # use_latent.py:270-274
        data = {
            "train_feats": [bags[i] for i in tr_idx],
            "train_labels": labels[tr_idx],
            "test_feats": [bags[i] for i in te_idx],
            "test_labels": labels[te_idx],
        }
        try:
            final = trainable(config, data, seed=fold_seed,
                              num_classes=num_classes, patience=patience,
                              max_epochs=max_epochs)
            row = {"fold": fold, "error": "",
                   **_fold_metrics(final, final.get("_test_best_loss"))}
        except Exception as e:  # NaN row keeps the sweep alive
            traceback.print_exc()
            row = {"fold": fold, "error": str(e),
                   **{k: np.nan for k in _fold_metrics({}, None)}}
        rows.append(row)
        if logger is not None:
            logger.log_dict({k: v for k, v in row.items()
                             if isinstance(v, float)}, step=fold,
                            prefix=f"fold{fold}/")
        if csv_path:  # incremental, crash-safe persistence
            pd.DataFrame(rows).to_csv(csv_path, index=False)

    frame = pd.DataFrame(rows)
    summary = {}
    for col in frame.columns:
        if col in ("fold", "error"):
            continue
        vals = frame[col].astype(float).values
        summary[col] = (float(np.nanmean(vals)), float(np.nanstd(vals)))
    return {"folds": rows, "summary": summary, "frame": frame}
