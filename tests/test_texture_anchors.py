"""Known-value anchors for the radiomics texture features.

The golden tests in test_texture*.py compare the JAX ops against numpy loop
oracles — but both were written by the same author from the same reading of
the pyradiomics/IBSI formulas.  This file breaks that symmetry: every
expected number below is a literal constant worked out BY HAND (closed-form
arithmetic, shown in the comments) for a tiny 4×4 image, independently of any
code in this repository.

The image (bin_width=1 ⇒ levels equal the pixel values, NG=4, Np=16):

    1 1 2 2
    1 1 2 2        four 2×2 constant blocks, full mask
    3 3 4 4
    3 3 4 4

Reference semantics being anchored: pyradiomics' discretization, symmetric
GLCM averaged over the four in-plane angles (force2D), GLRLM over the four
run directions, 8-connected GLSZM zones, GLDM dependence = 1 + #{8-neighbours
with equal level}, and the five NGTDM features
(/root/reference/params.yml:93-172 conventions).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_isic_tpu.ops import texture as T
from multimodal_isic_tpu.ops import texture_extra as X

IMG = np.array([[1, 1, 2, 2],
                [1, 1, 2, 2],
                [3, 3, 4, 4],
                [3, 3, 4, 4]], np.float32)
MASK = np.full((4, 4), 255, np.uint8)


@pytest.fixture(scope="module")
def discretized():
    levels, n_levels, low = T.discretize(jnp.asarray(IMG), jnp.asarray(MASK), 1.0)
    assert int(n_levels) == 4 and float(low) == 1.0
    np.testing.assert_array_equal(np.asarray(levels), IMG.astype(np.int32))
    return jnp.asarray(levels), n_levels, low


def _check(feats, expected):
    got = {k: float(v) for k, v in feats.items()}
    for name, want in expected.items():
        np.testing.assert_allclose(
            got[name], want, rtol=5e-5, atol=5e-5,
            err_msg=f"{name}: got {got[name]}, hand-computed {want}")


def test_firstorder_anchors():
    # Each of {1,2,3,4} appears 4 times. Mean = 2.5; deviations ±1.5, ±0.5:
    # Var = (2·2.25+2·0.25)/4 = 1.25; m4 = (2·5.0625+2·0.0625)/4 = 2.5625,
    # Kurtosis = m4/m2² = 2.5625/1.5625 = 1.64 (pyradiomics: non-excess).
    # Energy = 4·(1+4+9+16) = 120. Histogram p = 0.25 ×4 ⇒ Entropy = 2 bits,
    # Uniformity = 4·0.0625 = 0.25. RMS = sqrt(120/16). MAD = mean|x−2.5| = 1.
    # np.percentile (linear): P10 = 1, P90 = 4, P25 = 1.75, P75 = 3.25 ⇒
    # IQR = 1.5; all values lie within [P10, P90] ⇒ RobustMAD = MAD = 1.
    feats = T.firstorder_features(jnp.asarray(IMG), jnp.asarray(MASK), 1.0)
    _check(feats, {
        "Mean": 2.5, "Median": 2.5, "Minimum": 1.0, "Maximum": 4.0,
        "Range": 3.0, "Variance": 1.25, "Energy": 120.0,
        "TotalEnergy": 120.0, "Entropy": 2.0, "Uniformity": 0.25,
        "MeanAbsoluteDeviation": 1.0, "RobustMeanAbsoluteDeviation": 1.0,
        "RootMeanSquared": float(np.sqrt(7.5)), "Skewness": 0.0,
        "Kurtosis": 1.64, "10Percentile": 1.0, "90Percentile": 4.0,
        "InterquartileRange": 1.5,
    })


def test_glcm_anchors(discretized):
    # Symmetric GLCMs, hand-tabulated per angle (counts, then /total):
    #  0°: 24 pairs — p(g,g)=1/6 ×4 diag; p(1,2)=p(2,1)=p(3,4)=p(4,3)=1/12
    #      ⇒ Contrast = 4·(1/12)·1 = 1/3;  Σp·i·j = 7.3333, σ² = 1.25
    #      ⇒ Correlation = (7.3333−6.25)/1.25 = 0.8666667
    #  90°: same with cross pairs (1,3),(2,4) ⇒ Contrast = 4/3,
    #      Correlation = (6.8333−6.25)/1.25 = 0.4666667
    #  45°: 18 pairs — diag 1/9 ×4; ten off-diagonal entries of 1/18 over
    #      {(1,2),(1,3),(1,4),(2,4),(3,4)}² ⇒ Contrast = 38/18 = 19/9;
    #      μx = 2.5, σx² = 137/18 − 6.25 = 1.3611 ⇒ Corr = 0.2244898
    #  135°: off-diagonal set {(1,2),(1,3),(2,3),(2,4),(3,4)} ⇒ Contrast =
    #      22/18 = 11/9; σx² = 133/18 − 6.25 = 1.1389 ⇒ Corr = 0.4634146
    # Averages: Contrast = (3+12+19+11)/9/4 = 1.25;
    #  MaxProb = (1/6+1/6+1/9+1/9)/4 = 5/36;
    #  JointEnergy = (5/36+5/36+13/162+13/162)/4 = 0.1095679;
    #  JointEntropy = (2·2.9182958+2·3.7254806)/4 = 3.3218882;
    #  Correlation = (0.8666667+0.4666667+0.2244898+0.4634146)/4 = 0.5053094.
    levels, n_levels, low = discretized
    feats = T.glcm_features(levels, jnp.asarray(MASK), n_levels, 1.0, low)
    _check(feats, {
        "Contrast": 1.25,
        "MaximumProbability": 5.0 / 36.0,
        "JointEnergy": 0.10956790,
        "JointEntropy": 3.3218882,
        "Correlation": 0.50530945,
    })


def test_glrlm_anchors(discretized):
    # Horizontal: every row splits into two runs of length 2 ⇒ 8 runs, all
    # len-2, two per level.  Vertical: identical by symmetry.
    #  SRE = 0.25, LRE = 4, RunPct = 8/16, GLN = 4·2²/8 = 2, RLN = 8²/8 = 8,
    #  RunEntropy: p = 1/4 ×4 ⇒ 2 bits.
    # Each diagonal: 8 len-1 runs (two per level) + 4 len-2 runs ⇒ Nr = 12:
    #  SRE = (8+4/4)/12 = 0.75, LRE = (8+16)/12 = 2, RunPct = 12/16,
    #  GLN = 4·3²/12 = 3, RLN = (8²+4²)/12 = 20/3,
    #  RunEntropy = −[4·(1/6)lg(1/6) + 4·(1/12)lg(1/12)] = 2.9182958.
    # Angle means: SRE = 0.5, LRE = 3, RunPct = 0.625, GLN = 2.5,
    #  RLN = (8+8+20/3+20/3)/4 = 22/3, RunEntropy = 2.4591479.
    levels, n_levels, _ = discretized
    feats = T.glrlm_features(levels, jnp.asarray(MASK), n_levels, max_len=8)
    _check(feats, {
        "ShortRunEmphasis": 0.5, "LongRunEmphasis": 3.0,
        "RunPercentage": 0.625, "GrayLevelNonUniformity": 2.5,
        "RunLengthNonUniformity": 22.0 / 3.0, "RunEntropy": 2.4591479,
    })


def test_glszm_anchors(discretized):
    # Four 8-connected zones, one per level, each of size 4 ⇒ Nz = 4.
    levels, n_levels, _ = discretized
    feats = X.glszm_features(levels, jnp.asarray(MASK), n_levels)
    _check(feats, {
        "SmallAreaEmphasis": 0.0625,          # 4·(1/16)/4
        "LargeAreaEmphasis": 16.0,            # 4·16/4
        "ZonePercentage": 0.25,               # 4/16
        "ZoneEntropy": 2.0,                   # p = 1/4 ×4
        "GrayLevelNonUniformity": 1.0,        # 4·1²/4
        "SizeZoneNonUniformity": 4.0,         # 4²/4
        "SizeZoneNonUniformityNormalized": 1.0,
        "GrayLevelVariance": 1.25,            # uniform p over levels 1..4
        "ZoneVariance": 0.0,                  # all zones size 4
    })


def test_gldm_anchors(discretized):
    # α = 0: within each 2×2 block every pixel has exactly its 3 block-mates
    # as equal-level 8-neighbours ⇒ dependence j = 1+3 = 4 for all 16 pixels.
    levels, n_levels, _ = discretized
    feats = X.gldm_features(levels, jnp.asarray(MASK), n_levels)
    _check(feats, {
        "SmallDependenceEmphasis": 0.0625,    # 16·(1/16)/16
        "LargeDependenceEmphasis": 16.0,
        "DependenceEntropy": 2.0,             # p = 1/4 per level row
        "GrayLevelNonUniformity": 4.0,        # 4·4²/16
        "DependenceNonUniformity": 16.0,      # 16²/16
        "GrayLevelVariance": 1.25,
        "DependenceVariance": 0.0,
    })


def test_ngtdm_anchors(discretized):
    # Hand-worked per-pixel |level − mean(8-neighbours)| sums:
    #  s1 = 0+0.4+0.8+1.125 = 2.325, s2 = 0.4+0+0.375+0.8 = 1.575,
    #  s3 = 1.575, s4 = 2.325;  n_i = 4, p_i = 0.25, Σs = 7.8, Ngp = 4.
    # Coarseness = 1/(0.25·7.8) = 0.5128205
    # Contrast = [Σp_i p_j (i−j)² /(4·3)]·[Σs/16] = (2.5/12)·0.4875 = 0.1015625
    # Busyness = 0.25·7.8 / Σ|i·p_i − j·p_j| = 1.95/5 = 0.39
    # Complexity = Σ|i−j|·(p_i s_i + p_j s_j)/(p_i+p_j)/Np = 40.5/16 = 2.53125
    # Strength = Σ(p_i+p_j)(i−j)²/Σs = 20/7.8 = 2.5641026
    levels, n_levels, _ = discretized
    feats = X.ngtdm_features(levels, jnp.asarray(MASK), n_levels)
    _check(feats, {
        "Coarseness": 0.51282051,
        "Contrast": 0.1015625,
        "Busyness": 0.39,
        "Complexity": 2.53125,
        "Strength": 2.5641026,
    })
