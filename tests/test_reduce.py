"""Feature-reduction pipeline: sklearn goldens for the deterministic stages,
recovery behavior for the L1-logistic selector."""

import numpy as np
import pandas as pd
import pytest
import sklearn.feature_selection as skfs
import sklearn.preprocessing as skp

from multimodal_isic_tpu.analysis import reduce as R


def _frames(rng, n=80, d=30):
    cols = ([f"f{i}_gs" for i in range(d // 4)] +
            [f"f{i}_red" for i in range(d // 4)] +
            [f"f{i}_green" for i in range(d // 4)] +
            [f"f{i}_blue" for i in range(d - 3 * (d // 4))])
    tr = pd.DataFrame(rng.randn(n, d), columns=cols)
    te = pd.DataFrame(rng.randn(n // 2, d), columns=cols)
    return tr, te


def test_variance_filter_matches_sklearn(rng):
    tr, te = _frames(rng)
    tr.iloc[:, 3] = 0.5          # zero variance
    tr.iloc[:, 7] *= 0.01        # tiny variance (below 1e-3)
    sel = skfs.VarianceThreshold(1e-3).fit(tr)
    ours_tr, ours_te = R.filter_low_variance(tr, te, 1e-3)
    np.testing.assert_array_equal(ours_tr.columns, tr.columns[sel.get_support()])
    np.testing.assert_allclose(ours_tr.values, sel.transform(tr))
    assert list(ours_te.columns) == list(ours_tr.columns)


def test_normalize_matches_sklearn(rng):
    tr, te = _frames(rng)
    scaler = skp.StandardScaler().fit(tr)
    ours_tr, ours_te = R.normalize_features(tr, te)
    np.testing.assert_allclose(ours_tr.values, scaler.transform(tr), atol=1e-10)
    np.testing.assert_allclose(ours_te.values, scaler.transform(te), atol=1e-10)


def test_drop_correlated_matches_reference_rule(rng):
    tr, _ = _frames(rng, n=60, d=12)
    tr["f0_red"] = tr["f0_gs"] * 2 + 1e-6 * rng.randn(60)   # |rho| ~ 1
    tr["f1_red"] = -tr["f1_gs"] + 1e-6 * rng.randn(60)      # negative corr
    kept, dropped = R.drop_correlated_features(tr, 0.95)
    # the LATER column of each correlated pair is dropped (upper-triangle rule)
    assert "f0_red" in dropped and "f1_red" in dropped
    assert "f0_gs" in kept.columns and "f1_gs" in kept.columns

    # exact agreement with the reference's pandas formulation
    corr = tr.corr().abs()
    upper = corr.where(np.triu(np.ones(corr.shape), k=1).astype(bool))
    expected_drop = [c for c in upper.columns if any(upper[c] > 0.95)]
    assert sorted(dropped) == sorted(expected_drop)


def test_lasso_select_recovers_informative_features(rng):
    n, d, k = 240, 40, 4
    y = rng.randint(0, k, n)
    X = rng.randn(n, d).astype(np.float64)
    for c in range(k):
        X[y == c, c] += 2.5  # features 0..3 are informative
    X = (X - X.mean(0)) / X.std(0)
    cols = [f"f{i}_gs" for i in range(d)]
    tr = pd.DataFrame(X, columns=cols)
    te = pd.DataFrame(rng.randn(20, d), columns=cols)

    sel_tr, sel_te = R.lasso_select(tr, y, te, seed=42, iters=200)
    kept = set(sel_tr.columns)
    assert {f"f{i}_gs" for i in range(k)} <= kept  # all informative kept
    assert len(kept) < d  # some noise dropped
    assert list(sel_te.columns) == list(sel_tr.columns)


def test_fista_matches_sklearn_l1_logistic(rng):
    """Solver-level check: FISTA reaches the liblinear optimum on a binary
    problem (same objective C·Σ log-loss + ||w||1)."""
    from sklearn.linear_model import LogisticRegression
    n, d = 120, 10
    X = rng.randn(n, d)
    w_true = np.zeros(d)
    w_true[:3] = [2.0, -1.5, 1.0]
    y01 = (X @ w_true + 0.3 * rng.randn(n) > 0).astype(int)
    C = 0.5
    skm = LogisticRegression(penalty="l1", C=C, solver="liblinear",
                             max_iter=5000, tol=1e-10).fit(X, y01)
    import jax.numpy as jnp
    W, b = R._fista_l1_logistic(
        jnp.asarray(X, jnp.float32),
        jnp.asarray(np.where(y01 == 1, 1.0, -1.0)[None, :], jnp.float32),
        jnp.ones(n, jnp.float32), jnp.float32(C), iters=6000)
    # fp32 FISTA vs float64 liblinear coordinate descent: same support,
    # coefficients within ~2% of their ~3.0 magnitudes
    np.testing.assert_array_equal(np.asarray(W)[0] != 0, skm.coef_[0] != 0)
    np.testing.assert_allclose(np.asarray(W)[0], skm.coef_[0], atol=0.1)
    np.testing.assert_allclose(float(b[0]), skm.intercept_[0], atol=0.1)


def test_reduce_features_pipeline_runs(rng):
    tr, te = _frames(rng, n=100, d=24)
    y = rng.randint(0, 3, 100)
    tr.iloc[:, 0] = 0.0  # constant -> dropped at variance stage
    out_tr, out_te = R.reduce_features(tr, te, y, log=lambda *_: None)
    assert out_tr.shape[1] <= 23
    assert list(out_te.columns) == list(out_tr.columns)
    assert len(out_te) == len(te)
