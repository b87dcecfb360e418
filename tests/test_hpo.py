"""HPO: space sampling, ASHA stopping behavior, end-to-end search."""

import numpy as np
import pytest

from multimodal_isic_tpu.hpo import (
    ASHAScheduler, GRAPH_MIL_SPACE, MIL_SPACE, run_search, sample_config,
)
from multimodal_isic_tpu.train.mil import train_mil


def test_space_sampling_ranges(rng):
    for _ in range(50):
        cfg = sample_config(MIL_SPACE, rng)
        assert 32 <= cfg["hidden_dim"] <= 1024
        assert 0 <= cfg["dropout"] <= 0.75
        assert cfg["optimizer"] in ("adam", "adamw")
        assert 1e-7 <= cfg["lr"] <= 1e-3
    cfg = sample_config(GRAPH_MIL_SPACE, rng)
    assert cfg["gnn_type"] in ("gat", "transformer")
    assert cfg["k_neighbors"] in (4, 8, 12, 16)
    assert len(cfg) == len(GRAPH_MIL_SPACE)


def test_space_sampling_is_seeded():
    a = sample_config(MIL_SPACE, np.random.RandomState(7))
    b = sample_config(MIL_SPACE, np.random.RandomState(7))
    assert a == b


def test_asha_milestones_and_stopping():
    sched = ASHAScheduler(grace_period=4, reduction_factor=2, max_t=32)
    assert sched.milestones() == [4, 8, 16]
    # first trial at a rung always continues (it IS the cutoff)
    assert sched.on_result("a", 4, {"val_bacc": 0.5}) == "continue"
    # a better second trial continues, a worse third stops
    assert sched.on_result("b", 4, {"val_bacc": 0.9}) == "continue"
    assert sched.on_result("c", 4, {"val_bacc": 0.1}) == "stop"
    # non-rung steps never stop
    assert sched.on_result("d", 5, {"val_bacc": 0.0}) == "continue"
    # max_t stops everyone
    assert sched.on_result("b", 32, {"val_bacc": 0.99}) == "stop"


def test_asha_handles_nan():
    sched = ASHAScheduler(grace_period=2, reduction_factor=2, max_t=16)
    assert sched.on_result("a", 2, {"val_bacc": 0.8}) == "continue"
    assert sched.on_result("b", 2, {"val_bacc": float("nan")}) == "stop"


def test_run_search_end_to_end(rng, tmp_path):
    bags = []
    labels = rng.randint(0, 3, 30)
    for i in range(30):
        b = rng.randn(8, 6).astype(np.float32)
        b[:, labels[i]] += 2.0
        bags.append(b)
    data = {"train_feats": bags, "train_labels": labels}

    out = run_search(train_mil, MIL_SPACE, data, num_samples=4,
                     max_epochs=6, patience=6, num_classes=3, seed=0,
                     scheduler=ASHAScheduler(grace_period=2, max_t=6),
                     output_dir=str(tmp_path), verbose=False)
    assert len(out["trials"]) == 4
    assert "val_bacc" in out["results"].columns
    assert set(out["best_config"]) == set(MIL_SPACE)
    # artifacts persisted like tune_mil.py:259-274
    files = list(tmp_path.iterdir())
    assert any(f.name.startswith("hpo_results_") for f in files)
    assert any(f.name.startswith("best_config_") for f in files)
    # best trial's metric is the max over trials
    assert out["best_trial"].final["val_bacc"] == pytest.approx(
        out["results"]["val_bacc"].astype(float).max())


def test_run_search_all_nan_sweep_raises_cleanly(tmp_path):
    """Every trial failing below the max_failures cutoff used to crash on
    int(idxmax-of-all-NaN); it must raise a real error instead."""
    def exploding_trainable(config, data, **kw):
        raise FloatingPointError("boom")

    with pytest.raises(RuntimeError, match="NaN"):
        run_search(exploding_trainable, MIL_SPACE, {}, num_samples=3,
                   max_failures=5, seed=0, verbose=False)
