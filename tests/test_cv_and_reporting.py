"""Patient bags, CV harness, reporting tools."""

import numpy as np
import pandas as pd
import pytest
import sklearn.metrics as skm

from multimodal_isic_tpu.analysis.bags import (
    bags_from_table, build_patient_bags, patient_id_from_path,
)
from multimodal_isic_tpu.train.cv import cross_validate_mil
from multimodal_isic_tpu.utils.reporting import (
    collect_runs, latex_row, parse_classification_report,
)
from multimodal_isic_tpu.utils.logging import RunLogger


def test_patient_id_parsing():
    assert patient_id_from_path("/data/ISIC_0024306.jpg") == "0024306"
    assert patient_id_from_path("SYNtrain_0000001.jpg") == "0000001"
    assert patient_id_from_path("noid.jpg") == "noid"


def test_build_patient_bags_sorted_and_modal(rng):
    df = pd.DataFrame({
        "image_path": ["A_p1.jpg"] * 3 + ["A_p2.jpg"] * 2,
        "patch_id": [2, 0, 1, 1, 0],
        "target": [4, 4, 5, 3, 3],
        "patch_latent_pca": [np.full(4, i, np.float32) for i in range(5)],
    })
    bags, labels, patients = build_patient_bags(df)
    assert patients == ["p1", "p2"]
    assert labels == [4, 3]
    # p1 patches sorted by patch_id: rows 1 (id 0), 2 (id 1), 0 (id 2)
    np.testing.assert_array_equal(bags[0][:, 0], [1, 2, 0])


def test_patient_bag_order_matches_pandas_default_groupby(rng):
    """The reference iterates ``groupby('patient_id')`` with pandas' default
    sort=True (tune_mil.py:105-120); bag order feeds the stratified
    splitters, so first-appearance order would silently change CV fold
    membership.  Patient ids arrive in NON-sorted appearance order here."""
    order = ["zz9", "aa1", "mm5", "bb2"]
    df = pd.DataFrame({
        "image_path": [f"IS_{p}_x.jpg" for p in order for _ in range(2)],
        "patch_id": [0, 1] * 4,
        "target": [1, 1, 2, 2, 0, 0, 1, 1],
        "patch_latent_pca": [np.full(3, i, np.float32) for i in range(8)],
    })
    bags, labels, patients = build_patient_bags(df)
    # oracle: pandas default groupby over the same derived key
    oracle = list(df.assign(
        patient_id=df["image_path"].map(patient_id_from_path)
    ).groupby("patient_id").groups)
    assert patients == oracle == sorted(order)
    assert labels == [2, 1, 0, 1]  # labels follow the sorted patient order
    np.testing.assert_array_equal(bags[0][:, 0], [2, 3])  # aa1's patches

    # dense-table variant agrees with the DataFrame path on the same data
    table = {
        "image_idx": np.arange(8) // 2 * 0 + np.arange(8) // 2,
        "patch_id": np.array([0, 1] * 4),
        "patch_latent": np.stack([np.full(3, i, np.float32) for i in range(8)]),
        "target": np.array([1, 1, 2, 2, 0, 0, 1, 1]),
    }
    paths = [f"IS_{p}_x.jpg" for p in order]
    tb_bags, tb_labels, tb_patients = bags_from_table(
        table, paths, latent_col="patch_latent")
    assert tb_patients == patients
    assert tb_labels == labels
    for a, b in zip(tb_bags, bags):
        np.testing.assert_array_equal(a, b)


def test_bags_from_table_matches_dataframe_path(rng):
    n, p, d = 4, 6, 5
    table = {
        "image_idx": np.repeat(np.arange(n), p),
        "patch_id": np.tile(np.arange(p), n),
        "patch_latent": rng.randn(n * p, d).astype(np.float32),
        "patch_in_mask": np.ones(n * p, int),
        "target": np.repeat([1, 1, 2, 2], p),
    }
    paths = ["X_a.jpg", "X_a2.jpg", "X_b.jpg", "X_b2.jpg"]
    bags, labels, patients = bags_from_table(
        table, paths, latent_col="patch_latent")
    assert patients == ["a", "a2", "b", "b2"]
    assert labels == [1, 1, 2, 2]
    assert bags[0].shape == (p, d)


def test_cross_validate_mil(rng, tmp_path):
    labels = rng.randint(0, 3, 30)
    bags = []
    for i in range(30):
        b = rng.randn(8, 6).astype(np.float32)
        b[:, labels[i]] += 2.0
        bags.append(b)
    csv = tmp_path / "cv.csv"
    out = cross_validate_mil(bags, labels, model_kind="mil",
                             config={"lr": 3e-3, "optimizer": "adamw",
                                     "hidden_dim": 32, "att_dim": 16,
                                     "dropout": 0.1},
                             n_folds=3, seed=42, num_classes=3,
                             max_epochs=6, patience=6, csv_path=str(csv))
    assert len(out["folds"]) == 3
    mean, std = out["summary"]["test_bacc_best_bacc"]
    assert np.isfinite(mean) and mean > 0.5
    saved = pd.read_csv(csv)
    assert len(saved) == 3  # incremental persistence wrote every fold


def test_parse_classification_report_roundtrip(rng):
    y_true = rng.randint(0, 4, 60)
    y_pred = rng.randint(0, 4, 60)
    text = skm.classification_report(y_true, y_pred, digits=5)
    parsed = parse_classification_report(text)
    assert parsed["accuracy"] == pytest.approx(
        skm.accuracy_score(y_true, y_pred), abs=1e-5)
    p, r, f, s = skm.precision_recall_fscore_support(
        y_true, y_pred, average="macro", zero_division=0)
    assert parsed["precision_macro avg"] == pytest.approx(p, abs=1e-5)
    assert parsed["f1-score_weighted avg"] == pytest.approx(
        skm.precision_recall_fscore_support(
            y_true, y_pred, average="weighted", zero_division=0)[2], abs=1e-5)
    assert parsed["support_0"] == np.sum(y_true == 0)


def test_collect_runs_and_latex_row(tmp_path):
    for i, acc in enumerate([0.8, 0.9]):
        with RunLogger(str(tmp_path), run_name=f"r{i}", stdout=False) as lg:
            lg.assign("modality", "image")
            lg.log("test/accuracy", acc)
            lg.log("test/accuracy", acc + 0.01)  # last value wins
    frame = collect_runs(str(tmp_path), where={"modality": "image"})
    assert len(frame) == 2
    np.testing.assert_allclose(sorted(frame["test/accuracy"]), [0.81, 0.91])
    row = latex_row(frame, ["test/accuracy"], label="image")
    assert row.startswith("image & 86.00 $\\pm$ 5.00")
    assert row.endswith("\\\\")
    assert collect_runs(str(tmp_path), where={"modality": "none"}).empty
