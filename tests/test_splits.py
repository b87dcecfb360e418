"""Splitters must reproduce sklearn fold membership bit-for-bit (the
reference's CV protocol is defined by seeded sklearn splitters)."""

import numpy as np
import pytest
import sklearn.model_selection as skms

from multimodal_isic_tpu.core import splits as S


@pytest.mark.parametrize("n_splits,seed", [(10, 42), (5, 42), (5, 7), (3, 0)])
def test_stratified_kfold_matches_sklearn(rng, n_splits, seed):
    y = rng.randint(0, 7, size=500)
    ours = list(S.StratifiedKFold(n_splits, shuffle=True, random_state=seed).split(y, y))
    theirs = list(skms.StratifiedKFold(n_splits, shuffle=True, random_state=seed).split(
        np.zeros((len(y), 1)), y))
    for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
        np.testing.assert_array_equal(tr_a, tr_b)
        np.testing.assert_array_equal(te_a, te_b)


def test_stratified_kfold_no_shuffle(rng):
    y = rng.randint(0, 4, size=200)
    ours = list(S.StratifiedKFold(5, shuffle=False).split(y, y))
    theirs = list(skms.StratifiedKFold(5, shuffle=False).split(np.zeros((200, 1)), y))
    for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
        np.testing.assert_array_equal(te_a, te_b)


@pytest.mark.parametrize("seed", [42, 1, 123])
def test_stratified_shuffle_split_matches_sklearn(rng, seed):
    y = rng.randint(0, 7, size=300)
    y[:14] = np.repeat(np.arange(7), 2)  # ensure >= 2 members per class
    ours = list(S.StratifiedShuffleSplit(
        n_splits=3, test_size=0.2, random_state=seed).split(np.zeros((len(y), 1)), y))
    theirs = list(skms.StratifiedShuffleSplit(
        n_splits=3, test_size=0.2, random_state=seed).split(np.zeros((len(y), 1)), y))
    for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
        np.testing.assert_array_equal(tr_a, tr_b)
        np.testing.assert_array_equal(te_a, te_b)


def test_weighted_sampler_oversamples_minorities():
    labels = np.array([0] * 90 + [1] * 10)
    rng = np.random.RandomState(0)
    idx = S.weighted_sample_indices(labels, 100_000, rng)
    frac_minority = np.mean(labels[idx] == 1)
    assert 0.47 < frac_minority < 0.53  # inverse-frequency → balanced draws
