"""Radiomics texture ops: golden tests against independent numpy
implementations of the pyradiomics/IBSI definitions (pyradiomics itself is not
installable in this image; these loops are written directly from the published
formulas and serve as the oracle)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_isic_tpu.ops import texture as T


# ----------------------------------------------------- numpy oracle helpers

def np_discretize(image, mask, bin_width):
    vals = image[mask > 0]
    low = np.floor(vals.min() / bin_width)
    n_levels = int(np.floor(vals.max() / bin_width) - low + 1)
    lv = np.floor(image / bin_width) - low + 1
    lv = np.clip(lv, 1, n_levels)
    return np.where(mask > 0, lv, 0).astype(int), n_levels


def np_glcm(levels, mask, n_levels):
    """Loop GLCM: symmetric, 4 in-plane angles, raw counts."""
    h, w = levels.shape
    mats = []
    for dy, dx in T.ANGLES_2D:
        P = np.zeros((n_levels, n_levels))
        for y in range(h):
            for x in range(w):
                y2, x2 = y + dy, x + dx
                if 0 <= y2 < h and 0 <= x2 < w and mask[y, x] > 0 and mask[y2, x2] > 0:
                    P[levels[y, x] - 1, levels[y2, x2] - 1] += 1
        mats.append(P + P.T)
    return mats


def np_glrlm(levels, mask, n_levels):
    """Loop GLRLM: runs of equal gray level inside the ROI, 4 angles."""
    h, w = levels.shape
    mats = []
    for dy, dx in T.ANGLES_2D:
        runs = {}
        seen = np.zeros((h, w), bool)
        for y in range(h):
            for x in range(w):
                if mask[y, x] == 0 or seen[y, x]:
                    continue
                py, px = y - dy, x - dx
                if (0 <= py < h and 0 <= px < w and mask[py, px] > 0
                        and levels[py, px] == levels[y, x]):
                    continue  # not a run start
                length = 0
                cy, cx = y, x
                while (0 <= cy < h and 0 <= cx < w and mask[cy, cx] > 0
                       and levels[cy, cx] == levels[y, x]):
                    seen[cy, cx] = True
                    length += 1
                    cy, cx = cy + dy, cx + dx
                runs[(levels[y, x], length)] = runs.get((levels[y, x], length), 0) + 1
        max_len = max((l for (_, l) in runs), default=1)
        P = np.zeros((n_levels, max_len))
        for (g, l), c in runs.items():
            P[g - 1, l - 1] = c
        seen[:] = False
        mats.append(P)
    return mats


def _case(rng, h=12, w=15, vmax=60, hole=True):
    img = rng.randint(0, vmax, (h, w)).astype(np.float32)
    mask = np.zeros((h, w), np.uint8)
    mask[2:h - 2, 3:w - 2] = 255
    if hole:
        mask[5:7, 6:9] = 0  # non-convex ROI
    return img, mask


# ------------------------------------------------------------- discretize

def test_discretize_matches_numpy(rng):
    img, mask = _case(rng)
    lv_np, n_np = np_discretize(img, mask, 10.0)
    lv, n, low = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    assert int(n) == n_np
    np.testing.assert_array_equal(np.asarray(lv) * (mask > 0), lv_np * (mask > 0))


def test_discretize_negative_values(rng):
    """Filtered images (LoG) have negative intensities; bins stay anchored."""
    img = rng.randn(8, 8).astype(np.float32) * 30
    mask = np.full((8, 8), 255, np.uint8)
    lv_np, n_np = np_discretize(img, mask, 10.0)
    lv, n, low = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    assert int(n) == n_np
    np.testing.assert_array_equal(np.asarray(lv), lv_np)


# ------------------------------------------------------------------- GLCM

def test_glcm_matrices_match_loop_oracle(rng):
    img, mask = _case(rng)
    lv_np, n_np = np_discretize(img, mask, 10.0)
    oracle = np_glcm(lv_np, mask, n_np)
    lv, n, _ = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    ours = np.asarray(T.glcm_matrices(lv, jnp.asarray(mask)))
    for a in range(4):
        np.testing.assert_allclose(ours[a, :n_np, :n_np], oracle[a], err_msg=f"angle {a}")
        assert ours[a, n_np:, :].sum() == 0


def np_glcm_features_one_angle(P, n_levels):
    """Oracle for a few hand-checkable GLCM features on one angle."""
    p = P / P.sum()
    i = np.arange(1, n_levels + 1, dtype=float)
    ii, jj = np.meshgrid(i, i, indexing="ij")
    px, py = p.sum(1), p.sum(0)
    ux = (i * px).sum()
    uy = (i * py).sum()
    contrast = ((ii - jj) ** 2 * p).sum()
    autocorr = (ii * jj * p).sum()
    joint_entropy = -(p[p > 0] * np.log2(p[p > 0])).sum()
    sigx = np.sqrt(((i - ux) ** 2 * px).sum())
    sigy = np.sqrt(((i - uy) ** 2 * py).sum())
    corr = (((ii - ux) * (jj - uy) * p).sum()) / (sigx * sigy)
    return dict(Contrast=contrast, Autocorrelation=autocorr,
                JointEntropy=joint_entropy, Correlation=corr, JointAverage=ux)


def test_glcm_features_match_oracle(rng):
    img, mask = _case(rng)
    lv_np, n_np = np_discretize(img, mask, 10.0)
    oracle_mats = np_glcm(lv_np, mask, n_np)
    expected = {}
    for key in ["Contrast", "Autocorrelation", "JointEntropy", "Correlation",
                "JointAverage"]:
        expected[key] = np.mean([
            np_glcm_features_one_angle(P, n_np)[key] for P in oracle_mats])

    lv, n, low = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    feats = T.glcm_features(lv, jnp.asarray(mask), n, 10.0, low)
    for key, val in expected.items():
        assert float(feats[key]) == pytest.approx(val, rel=1e-4), key
    assert len(feats) == 24
    for key, val in feats.items():
        assert np.isfinite(float(val)), key


def test_glcm_mcc_matches_numpy_oracle(rng):
    """MCC (√ of the second eigenvalue of Q) against a direct numpy compute."""
    img, mask = _case(rng, vmax=40, hole=False)  # few levels, all populated
    lv_np, n_np = np_discretize(img, mask, 10.0)
    oracle_mats = np_glcm(lv_np, mask, n_np)

    mccs = []
    for P in oracle_mats:
        p = P / P.sum()
        px, py = p.sum(1), p.sum(0)
        q = np.einsum("ik,jk->ij", p / px[:, None], p / py[None, :])
        eigs = np.sort(np.linalg.eigvals(q).real)
        mccs.append(np.sqrt(np.clip(eigs[-2], 0, 1)))
    expected = np.mean(mccs)

    lv, n, low = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    feats = T.glcm_features(lv, jnp.asarray(mask), n, 10.0, low)
    assert float(feats["MCC"]) == pytest.approx(expected, abs=2e-3)


# ------------------------------------------------------------------ GLRLM

def test_glrlm_matrix_simple_rows():
    # one row: 1 1 2 2 2 -> runs (1,2), (2,3) along angle (0,1)
    levels = jnp.asarray([[1, 1, 2, 2, 2]], jnp.int32)
    mask = jnp.full((1, 5), 255, jnp.uint8)
    P = np.asarray(T.glrlm_matrix_for_angle(levels, mask > 0, 0, 1, 8))
    assert P[0, 1] == 1  # gray 1, length 2
    assert P[1, 2] == 1  # gray 2, length 3
    assert P.sum() == 2


def test_glrlm_matrices_match_loop_oracle(rng):
    img, mask = _case(rng, h=10, w=11, vmax=30)
    lv_np, n_np = np_discretize(img, mask, 10.0)
    oracle = np_glrlm(lv_np, mask, n_np)
    lv, n, _ = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    for a, (dy, dx) in enumerate(T.ANGLES_2D):
        ours = np.asarray(T.glrlm_matrix_for_angle(lv, jnp.asarray(mask) > 0,
                                                   dy, dx, 16))
        exp = oracle[a]
        np.testing.assert_allclose(ours[:exp.shape[0], :exp.shape[1]], exp,
                                   err_msg=f"angle {(dy, dx)}")
        assert ours.sum() == exp.sum()


def np_glrlm_features_one_angle(P, n_p):
    nr = P.sum()
    i = np.arange(1, P.shape[0] + 1, dtype=float)
    l = np.arange(1, P.shape[1] + 1, dtype=float)
    pg, pl = P.sum(1), P.sum(0)
    return dict(
        ShortRunEmphasis=(pl / l ** 2).sum() / nr,
        LongRunEmphasis=(pl * l ** 2).sum() / nr,
        GrayLevelNonUniformity=(pg ** 2).sum() / nr,
        RunLengthNonUniformity=(pl ** 2).sum() / nr,
        RunPercentage=nr / n_p,
        HighGrayLevelRunEmphasis=(pg * i ** 2).sum() / nr,
    )


def test_glrlm_features_match_oracle(rng):
    img, mask = _case(rng, h=10, w=11, vmax=30)
    lv_np, n_np = np_discretize(img, mask, 10.0)
    oracle_mats = np_glrlm(lv_np, mask, n_np)
    n_p = (mask > 0).sum()
    keys = ["ShortRunEmphasis", "LongRunEmphasis", "GrayLevelNonUniformity",
            "RunLengthNonUniformity", "RunPercentage", "HighGrayLevelRunEmphasis"]
    expected = {k: np.mean([np_glrlm_features_one_angle(P, n_p)[k]
                            for P in oracle_mats]) for k in keys}

    lv, n, _ = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    feats = T.glrlm_features(lv, jnp.asarray(mask), n, max_len=32)
    for k in keys:
        assert float(feats[k]) == pytest.approx(expected[k], rel=1e-4), k
    assert len(feats) == 16
    for k, v in feats.items():
        assert np.isfinite(float(v)), k


# -------------------------------------------------------------- first order

def test_firstorder_matches_numpy(rng):
    img, mask = _case(rng, vmax=200)
    inside = mask > 0
    vals = img[inside].astype(np.float64)
    feats = T.firstorder_features(jnp.asarray(img), jnp.asarray(mask), 10.0)

    assert float(feats["Mean"]) == pytest.approx(vals.mean(), rel=1e-5)
    assert float(feats["Energy"]) == pytest.approx((vals ** 2).sum(), rel=1e-5)
    assert float(feats["Minimum"]) == vals.min()
    assert float(feats["Maximum"]) == vals.max()
    assert float(feats["Range"]) == vals.max() - vals.min()
    assert float(feats["Median"]) == pytest.approx(np.percentile(vals, 50), rel=1e-4)
    assert float(feats["10Percentile"]) == pytest.approx(np.percentile(vals, 10), rel=1e-3)
    assert float(feats["90Percentile"]) == pytest.approx(np.percentile(vals, 90), rel=1e-3)
    assert float(feats["InterquartileRange"]) == pytest.approx(
        np.percentile(vals, 75) - np.percentile(vals, 25), rel=1e-3)
    assert float(feats["Variance"]) == pytest.approx(vals.var(), rel=1e-4)
    assert float(feats["RootMeanSquared"]) == pytest.approx(
        np.sqrt((vals ** 2).mean()), rel=1e-5)
    assert float(feats["MeanAbsoluteDeviation"]) == pytest.approx(
        np.abs(vals - vals.mean()).mean(), rel=1e-4)
    assert float(feats["Skewness"]) == pytest.approx(
        ((vals - vals.mean()) ** 3).mean() / vals.std() ** 3, rel=1e-3)
    assert float(feats["Kurtosis"]) == pytest.approx(
        ((vals - vals.mean()) ** 4).mean() / vals.var() ** 2, rel=1e-3)

    p10, p90 = np.percentile(vals, 10), np.percentile(vals, 90)
    rob = vals[(vals >= p10) & (vals <= p90)]
    assert float(feats["RobustMeanAbsoluteDeviation"]) == pytest.approx(
        np.abs(rob - rob.mean()).mean(), rel=1e-3)

    lv, n_lv = np_discretize(img, mask, 10.0)
    hist = np.bincount(lv[inside], minlength=n_lv + 1)[1:]
    p = hist / hist.sum()
    assert float(feats["Entropy"]) == pytest.approx(
        -(p[p > 0] * np.log2(p[p > 0])).sum(), rel=1e-4)
    assert float(feats["Uniformity"]) == pytest.approx((p ** 2).sum(), rel=1e-4)


# --------------------------------------------- static-bound edge-case guards

def test_discretize_saturates_into_top_bin_beyond_ng():
    """A wide-range image (e.g. a LoG response spanning > NG*binWidth) must
    saturate into level NG instead of silently vanishing from every matrix
    (the old behavior: one_hot(level-1, NG) zeroed levels > NG)."""
    img = np.zeros((8, 8), np.float32)
    img[0, :] = np.linspace(0.0, 1000.0, 8)  # range 1000 > 64*10
    mask = np.ones((8, 8), np.uint8) * 255
    levels, n_levels, _ = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    levels = np.asarray(levels)
    assert int(n_levels) == T.NG
    assert levels.max() == T.NG
    assert levels.min() >= 1  # every ROI pixel keeps a valid level
    # every in-ROI pixel must be counted by the one-hot formulation
    onehot_mass = np.asarray(
        jnp.sum(jax.nn.one_hot(jnp.asarray(levels) - 1, T.NG)))
    assert onehot_mass == mask.size


def test_glrlm_counts_600px_uniform_run():
    """The reference's 450×600 frames can contain a 600-px uniform horizontal
    run; the default max_len must place it in its TRUE length bin (the old
    512 default silently folded it into the top bin)."""
    h, w = 4, 600
    levels = np.ones((h, w), np.int32)
    mask = np.ones((h, w), np.uint8)
    feats = T.glrlm_features(jnp.asarray(levels), jnp.asarray(mask),
                             jnp.asarray(1, jnp.int32))
    # horizontal angle: 4 runs of length 600.  RunLengthNonUniformity for
    # that angle = (4²·1)/4 = 4; LongRunEmphasis for it = 600².  The feature
    # values are averaged over 4 angles — verify via the matrix directly:
    P = np.asarray(T.glrlm_matrix_for_angle(
        jnp.asarray(levels), jnp.asarray(mask) > 0, 0, 1, 640))
    assert P[0, 599] == h  # true length bin, not the saturated top bin
    assert P.sum() == h
    assert np.isfinite(float(feats["LongRunEmphasis"]))


def test_glrlm_longer_than_max_len_saturates():
    """Runs longer than max_len land in the top bin (documented truncation)."""
    levels = np.ones((2, 16), np.int32)
    mask = np.ones((2, 16), np.uint8)
    P = np.asarray(T.glrlm_matrix_for_angle(
        jnp.asarray(levels), jnp.asarray(mask) > 0, 0, 1, 8))
    assert P[0, 7] == 2 and P.sum() == 2
