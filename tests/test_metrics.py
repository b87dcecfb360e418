"""Golden tests: metrics vs sklearn (the reference's metric definitions)."""

import numpy as np
import pytest
import sklearn.metrics as skm

from multimodal_isic_tpu.core import metrics as M

NUM_CLASSES = 7


def _random_problem(rng, n=200, num_classes=NUM_CLASSES, all_present=True):
    y_true = rng.randint(0, num_classes, size=n)
    if all_present:
        y_true[:num_classes] = np.arange(num_classes)
    logits = rng.randn(n, num_classes)
    y_score = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    y_pred = y_score.argmax(1)
    return y_true, y_pred, y_score


def test_accuracy_and_balanced_accuracy(rng):
    y_true, y_pred, _ = _random_problem(rng)
    assert float(M.accuracy(y_true, y_pred)) == pytest.approx(
        skm.accuracy_score(y_true, y_pred))
    assert float(M.balanced_accuracy(y_true, y_pred, NUM_CLASSES)) == pytest.approx(
        skm.balanced_accuracy_score(y_true, y_pred), abs=1e-6)


def test_balanced_accuracy_missing_class(rng):
    y_true = rng.randint(0, 4, size=100)  # classes 4..6 absent
    y_pred = rng.randint(0, NUM_CLASSES, size=100)
    assert float(M.balanced_accuracy(y_true, y_pred, NUM_CLASSES)) == pytest.approx(
        skm.balanced_accuracy_score(y_true, y_pred), abs=1e-6)


def test_roc_auc_ovr(rng):
    y_true, _, y_score = _random_problem(rng)
    expected = skm.roc_auc_score(y_true, y_score, multi_class="ovr")
    assert float(M.roc_auc_ovr(y_true, y_score, NUM_CLASSES)) == pytest.approx(
        expected, abs=1e-6)


def test_binary_auc_with_ties(rng):
    # exact ties (float32-representable), compared per class against sklearn
    y_true = rng.randint(0, 2, size=200)
    scores = np.round(rng.rand(200), 1).astype(np.float32)  # heavy exact ties
    expected = skm.roc_auc_score(y_true, scores)
    got = float(M.binary_auc(y_true.astype(np.int32), scores))
    assert got == pytest.approx(expected, abs=1e-6)


def test_roc_auc_missing_class_is_nan(rng):
    # sklearn raises here; the reference catches and stores NaN
    # (utils_g_mil.py:175-178) — we return NaN directly.
    y_true = rng.randint(0, 5, size=50)
    y_score = rng.rand(50, NUM_CLASSES)
    assert np.isnan(float(M.roc_auc_ovr(y_true, y_score, NUM_CLASSES)))


@pytest.mark.parametrize("average", ["macro", "weighted"])
def test_precision_recall_fscore(rng, average):
    y_true, y_pred, _ = _random_problem(rng)
    p, r, f, _ = skm.precision_recall_fscore_support(
        y_true, y_pred, average=average, zero_division=0)
    got = M.precision_recall_fscore(y_true, y_pred, NUM_CLASSES, average)
    assert float(got["precision"]) == pytest.approx(p, abs=1e-6)
    assert float(got["recall"]) == pytest.approx(r, abs=1e-6)
    assert float(got["f1"]) == pytest.approx(f, abs=1e-6)


@pytest.mark.parametrize("average", ["macro", "weighted"])
def test_prf_with_missing_classes(rng, average):
    y_true = rng.randint(2, 6, size=80)
    y_pred = rng.randint(0, 5, size=80)
    p, r, f, _ = skm.precision_recall_fscore_support(
        y_true, y_pred, average=average, zero_division=0)
    got = M.precision_recall_fscore(y_true, y_pred, NUM_CLASSES, average)
    assert float(got["precision"]) == pytest.approx(p, abs=1e-6)
    assert float(got["recall"]) == pytest.approx(r, abs=1e-6)
    assert float(got["f1"]) == pytest.approx(f, abs=1e-6)


def test_classification_report_text(rng):
    y_true, y_pred, _ = _random_problem(rng, n=120)
    ours = M.classification_report(y_true, y_pred, digits=5)
    theirs = skm.classification_report(y_true, y_pred, digits=5)
    assert ours == theirs


def test_classification_report_missing_class(rng):
    y_true = rng.randint(0, 5, size=60)
    y_pred = rng.randint(0, 6, size=60)
    assert M.classification_report(y_true, y_pred, digits=5) == \
        skm.classification_report(y_true, y_pred, digits=5)


def test_evaluate_probs_bundle(rng):
    y_true, y_pred, y_score = _random_problem(rng)
    out = M.evaluate_probs(y_true, y_score, NUM_CLASSES)
    assert float(out["acc"]) == pytest.approx(skm.accuracy_score(y_true, y_pred))
    assert float(out["auc"]) == pytest.approx(
        skm.roc_auc_score(y_true, y_score, multi_class="ovr"), abs=1e-6)
    for key in ["bacc", "macro_p", "macro_r", "macro_f1",
                "weighted_p", "weighted_r", "weighted_f1"]:
        assert np.isfinite(float(out[key]))
