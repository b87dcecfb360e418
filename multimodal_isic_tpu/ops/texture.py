"""Radiomics texture features on masked ROIs — TPU-native formulations.

Replaces pyradiomics' C extensions (``RadiomicExtractor.py:8,38-48``) with
jit/vmap-able JAX ops.  Conventions follow the pyradiomics/IBSI definitions
used by the reference's ``params.yml``: fixed ``binWidth`` discretization with
bin edges anchored at multiples of the bin width, ROI label 255, ``force2D``
in-plane angles at distance 1, symmetrical GLCM, per-angle feature values
averaged (``weightingNorm: None``).

Design for TPU: everything is computed over a fixed-size image with a validity
mask and a static maximum gray-level count ``NG``; co-occurrence and run
histograms are one-hot matmul / bincount formulations (MXU-friendly, no
data-dependent shapes).  NaN conventions match pyradiomics (e.g. degenerate
single-level ROIs).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

# static upper bound on discretized gray levels; uint8 / binWidth=10 needs 26,
# filtered images (LoG etc.) can stretch further.  64 keeps every matrix
# MXU-tile friendly.
NG = 64
EPS = jnp.finfo(jnp.float32).eps

# in-plane distance-1 angles under force2D (pyradiomics generateAngles):
# (dy, dx) of the "positive" direction; symmetric GLCM adds the mirror.
ANGLES_2D = ((0, 1), (1, -1), (1, 0), (1, 1))


def discretize(image: jnp.ndarray, mask: jnp.ndarray, bin_width: float):
    """Fixed-bin-width discretization anchored at bin_width multiples
    (pyradiomics ``getBinEdges``): level = floor(x / w) - floor(min / w) + 1,
    with the maximum value clamped into the top bin.  Returns (levels [H, W]
    int32 in 1..NG (0 outside ROI), n_levels, bin edges lowest value)."""
    inside = mask > 0
    big = jnp.float32(3.4e38)
    roi_min = jnp.min(jnp.where(inside, image, big))
    roi_max = jnp.max(jnp.where(inside, image, -big))
    low = jnp.floor(roi_min / bin_width)
    lv = jnp.floor(image / bin_width) - low + 1.0
    # pyradiomics digitize puts x == edge into the right bin but clamps the
    # global max into the last bin (numpy.digitize right=False with the max
    # landing exactly on the final edge).
    n_levels = jnp.floor(roi_max / bin_width) - low + 1.0
    # static-bound guard: an ROI whose dynamic range exceeds NG·bin_width
    # (e.g. a wide-range LoG response) saturates into the top bin instead of
    # silently vanishing from every matrix (one_hot(level-1, NG) would drop
    # any level > NG).  pyradiomics would use more bins; saturation keeps the
    # static shape and is the documented approximation for such ROIs.
    n_levels = jnp.minimum(n_levels, float(NG))
    lv = jnp.clip(lv, 1.0, n_levels)
    levels = jnp.where(inside, lv, 0.0).astype(jnp.int32)
    return levels, n_levels.astype(jnp.int32), low * bin_width


def _level_values(n_levels) -> jnp.ndarray:
    """Gray values i = 1..NG with a validity mask folded in by callers."""
    return jnp.arange(1, NG + 1, dtype=jnp.float32)


# ===================================================================== GLCM

def glcm_matrices(levels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Symmetric co-occurrence matrices for the 4 in-plane angles.

    → [4, NG, NG] raw counts.  One-hot matmul formulation: for angle a with
    offset (dy, dx), P_a = Cᵀ·S where C/S are the [P, NG] one-hot matrices of
    center/shifted levels restricted to pairs fully inside the ROI — the
    contraction runs on the MXU.
    """
    h, w = levels.shape
    inside = (mask > 0)
    # Outside-ROI pixels carry level 0, so levels-1 == -1 there and
    # jax.nn.one_hot(-1, NG) is an all-zero row; the explicit inside-mask
    # multiply below is therefore redundant for them but kept as a guard for
    # any caller that passes levels not produced by discretize().
    onehot = jax.nn.one_hot(levels - 1, NG, dtype=jnp.float32)
    onehot = onehot * inside[..., None]

    mats = []
    for dy, dx in ANGLES_2D:
        shifted = jnp.roll(jnp.roll(onehot, -dy, axis=0), -dx, axis=1)
        valid = jnp.ones((h, w), jnp.float32)
        # zero out wrapped rows/cols
        if dy > 0:
            valid = valid.at[h - dy:, :].set(0.0)
        elif dy < 0:
            valid = valid.at[: -dy, :].set(0.0)
        if dx > 0:
            valid = valid.at[:, w - dx:].set(0.0)
        elif dx < 0:
            valid = valid.at[:, : -dx].set(0.0)
        c = (onehot * valid[..., None]).reshape(h * w, NG)
        s = shifted.reshape(h * w, NG)
        p = c.T @ s
        mats.append(p + p.T)  # symmetrical GLCM
    return jnp.stack(mats)


def glcm_features(levels: jnp.ndarray, mask: jnp.ndarray,
                  n_levels: jnp.ndarray, bin_width: float,
                  low: jnp.ndarray, use_pallas: bool = False) -> Dict[str, jnp.ndarray]:
    """The 24 pyradiomics GLCM features, averaged over angles.

    Gray values entering the formulas are the discretized level indices
    (pyradiomics uses 1-based bin indices), masked to the first ``n_levels``.
    ``use_pallas`` computes the co-occurrence matrices with the fused 4-angle
    MXU kernel (no [H·W, NG] one-hot materialization in HBM).
    """
    if use_pallas:
        from .pallas_glcm import glcm_matrices_pallas
        raw = glcm_matrices_pallas(levels, mask)
    else:
        raw = glcm_matrices(levels, mask)  # [4, NG, NG]
    i_vals = jnp.arange(1, NG + 1, dtype=jnp.float32)
    lvl_valid = (i_vals <= n_levels.astype(jnp.float32)).astype(jnp.float32)
    pair_valid = lvl_valid[:, None] * lvl_valid[None, :]
    raw = raw * pair_valid[None]

    def per_angle(P):
        n = jnp.maximum(P.sum(), 1.0)
        p = P / n
        px = p.sum(axis=1)  # marginal over j
        py = p.sum(axis=0)
        ux = (i_vals * px).sum()
        uy = (i_vals * py).sum()
        sigx = jnp.sqrt(jnp.maximum(((i_vals - ux) ** 2 * px).sum(), 0.0))
        sigy = jnp.sqrt(jnp.maximum(((i_vals - uy) ** 2 * py).sum(), 0.0))

        ii = i_vals[:, None]
        jj = i_vals[None, :]
        # p_{x+y}(k), k = 2..2*Ng  and  p_{x-y}(k), k = 0..Ng-1
        ksum = (ii + jj).astype(jnp.int32)  # 2..2NG
        kdiff = jnp.abs(ii - jj).astype(jnp.int32)  # 0..NG-1
        pxy_sum = jnp.zeros(2 * NG + 1).at[ksum].add(p)
        pxy_diff = jnp.zeros(NG).at[kdiff].add(p)
        k_sum_vals = jnp.arange(2 * NG + 1, dtype=jnp.float32)
        k_diff_vals = jnp.arange(NG, dtype=jnp.float32)

        log2p = jnp.log2(p + EPS)
        hxy = -(p * log2p).sum()
        hx = -(px * jnp.log2(px + EPS)).sum()
        hy = -(py * jnp.log2(py + EPS)).sum()
        pxpy = px[:, None] * py[None, :]
        hxy1 = -(p * jnp.log2(pxpy + EPS)).sum()
        hxy2 = -(pxpy * jnp.log2(pxpy + EPS)).sum()

        contrast = ((ii - jj) ** 2 * p).sum()
        dissim_avg = (k_diff_vals * pxy_diff).sum()  # DifferenceAverage
        dvar = ((k_diff_vals - dissim_avg) ** 2 * pxy_diff).sum()
        dentropy = -(pxy_diff * jnp.log2(pxy_diff + EPS)).sum()
        sum_avg = (k_sum_vals * pxy_sum).sum()
        sentropy = -(pxy_sum * jnp.log2(pxy_sum + EPS)).sum()

        autocorr = (ii * jj * p).sum()
        cluster = ii + jj - ux - uy
        cl_tend = (cluster ** 2 * p).sum()
        cl_shade = (cluster ** 3 * p).sum()
        cl_prom = (cluster ** 4 * p).sum()
        corr_den = sigx * sigy
        correlation = jnp.where(
            corr_den > 0, ((ii - ux) * (jj - uy) * p).sum() / (corr_den + EPS), 1.0)

        idiff = 1.0 / (1.0 + k_diff_vals)
        id_ = (pxy_diff * idiff).sum()
        idm = (pxy_diff / (1.0 + k_diff_vals ** 2)).sum()
        ng_f = jnp.maximum(n_levels.astype(jnp.float32), 1.0)
        idmn = (pxy_diff / (1.0 + (k_diff_vals / ng_f) ** 2)).sum()
        idn = (pxy_diff / (1.0 + k_diff_vals / ng_f)).sum()
        inv_var = jnp.where(
            kdiff > 0, p / jnp.maximum(kdiff.astype(jnp.float32) ** 2, 1.0), 0.0).sum()

        imc1_den = jnp.maximum(hx, hy)
        imc1 = jnp.where(imc1_den > 0, (hxy - hxy1) / (imc1_den + EPS), 0.0)
        imc2_arg = jnp.clip(1.0 - jnp.exp(-2.0 * (hxy2 - hxy)), 0.0, 1.0)
        imc2 = jnp.where(hxy2 >= hxy, jnp.sqrt(imc2_arg), 0.0)

        joint_energy = (p ** 2).sum()
        max_prob = p.max()
        sum_squares = ((ii - ux) ** 2 * p).sum()

        # MCC: √(second-largest eigenvalue of Q), Q(i,j) = Σ_k p(i,k)p(j,k)
        # / (px(i)·py(k)).  Q = D⁻¹A with A symmetric PSD, so Q is similar to
        # the PSD matrix S = D^{-1/2} A D^{-1/2}.  Q is row-stochastic, so its
        # top eigenpair is exactly (1, √px): deflate it and take the dominant
        # eigenvalue of the remainder by power iteration — all matmuls, far
        # cheaper on TPU than eigh (general eig does not lower at all).
        safe_py = jnp.where(py > 0, py, 1.0)
        a = jnp.einsum("ik,jk->ij", p / safe_py[None, :], p)
        inv_sqrt_px = jnp.where(px > 0, 1.0 / jnp.sqrt(jnp.maximum(px, EPS)), 0.0)
        s = a * inv_sqrt_px[:, None] * inv_sqrt_px[None, :]
        v1 = jnp.sqrt(jnp.maximum(px, 0.0))
        v1 = v1 / jnp.maximum(jnp.linalg.norm(v1), EPS)
        s_defl = s - jnp.outer(v1, v1)

        def power(v, _):
            w = s_defl @ v
            w = w - v1 * (v1 @ w)  # re-orthogonalize against the deflated pair
            return w / jnp.maximum(jnp.linalg.norm(w), EPS), None

        v0 = jnp.ones(NG) / jnp.sqrt(NG)
        v0 = v0 - v1 * (v1 @ v0)
        v0 = v0 / jnp.maximum(jnp.linalg.norm(v0), EPS)
        v, _ = jax.lax.scan(power, v0, None, length=96)
        lam2 = v @ (s_defl @ v)
        mcc = jnp.sqrt(jnp.clip(lam2, 0.0, 1.0))
        # flat ROI (single gray level): pyradiomics defines MCC = 1
        mcc = jnp.where(ng_f > 1, mcc, 1.0)

        return {
            "Autocorrelation": autocorr,
            "ClusterProminence": cl_prom,
            "ClusterShade": cl_shade,
            "ClusterTendency": cl_tend,
            "Contrast": contrast,
            "Correlation": correlation,
            "DifferenceAverage": dissim_avg,
            "DifferenceEntropy": dentropy,
            "DifferenceVariance": dvar,
            "Id": id_,
            "Idm": idm,
            "Idmn": idmn,
            "Idn": idn,
            "Imc1": imc1,
            "Imc2": imc2,
            "InverseVariance": inv_var,
            "JointAverage": ux,
            "JointEnergy": joint_energy,
            "JointEntropy": hxy,
            "MCC": mcc,
            "MaximumProbability": max_prob,
            "SumAverage": sum_avg,
            "SumEntropy": sentropy,
            "SumSquares": sum_squares,
        }

    feats = jax.vmap(per_angle)(raw)
    return {k: v.mean() for k, v in feats.items()}


# ==================================================================== GLRLM

def _shift2d(x: jnp.ndarray, dy: int, dx: int, fill):
    """x shifted by (dy, dx) with vacated cells filled — result[p] is the
    value at p − (dy, dx)."""
    out = jnp.roll(jnp.roll(x, dy, axis=0), dx, axis=1)
    if dy > 0:
        out = out.at[:dy, :].set(fill)
    elif dy < 0:
        out = out.at[dy:, :].set(fill)
    if dx > 0:
        out = out.at[:, :dx].set(fill)
    elif dx < 0:
        out = out.at[:, dx:].set(fill)
    return out


def run_starts_and_lengths(levels, inside, dy, dx):
    """Per-cell run bookkeeping along one angle — shifts only, no shear.

    Run starts/ends come from neighbor comparison along (dy, dx); each cell's
    run length is (line coordinate of the first run end at-or-after it) −
    (own line coordinate) + 1, where the "first end after" is a reverse
    cumulative min along the direction computed by doubling shifts
    (shift-by-2^k + min stays on the same line, since a line IS the maximal
    set reachable by the offset).  This replaces the earlier shear-based
    layout: the diagonal shear needed per-row dynamic_update_slice, a
    near-serial gather/scatter on TPU.

    → (start [H, W] bool, gray [H, W] int32, length [H, W] int32); gray and
    length are meaningful at start cells.
    """
    h, w = levels.shape
    prev_lv = _shift2d(levels, dy, dx, -1)
    prev_ok = _shift2d(inside, dy, dx, False)
    start = inside & (~prev_ok | (levels != prev_lv))
    next_lv = _shift2d(levels, -dy, -dx, -1)
    next_ok = _shift2d(inside, -dy, -dx, False)
    is_end = inside & (~next_ok | (levels != next_lv))

    # line coordinate increments by exactly 1 per step along (dy, dx)
    if dy != 0:
        t = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))
        span = h
    else:
        t = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
        span = w
    big = jnp.int32(h + w)
    end_t = jnp.where(is_end, t, big)
    k = 1
    while k < span:
        end_t = jnp.minimum(end_t, _shift2d(end_t, -dy * k, -dx * k, big))
        k <<= 1
    length = end_t - t + 1
    return start, levels.astype(jnp.int32), length.astype(jnp.int32)


def glrlm_matrix_for_angle(levels, inside, dy, dx, max_len: int):
    """[NG, max_len] run-length counts for one angle (runs of equal gray level
    within the ROI along direction (dy, dx))."""
    start, gray, length = run_starts_and_lengths(levels, inside, dy, dx)
    key = (gray - 1) * max_len + jnp.clip(length - 1, 0, max_len - 1)
    key = jnp.where(start, key, NG * max_len)
    flat = jnp.bincount(key.reshape(-1), length=NG * max_len + 1)[:-1]
    return flat.reshape(NG, max_len).astype(jnp.float32)


def glrlm_features(levels: jnp.ndarray, mask: jnp.ndarray,
                   n_levels: jnp.ndarray, max_len: int = 640,
                   use_pallas: bool = False) -> Dict[str, jnp.ndarray]:
    """The 16 pyradiomics GLRLM features, averaged over the 4 angles.

    ``max_len`` must be ≥ the longest possible straight run — max(H, W) for
    the axis-aligned angles (640 covers the reference's 450×600 frames; the
    old 512 default silently folded 600-px uniform runs into the top length
    bin).  Longer runs still saturate into bin ``max_len`` (documented
    truncation, exercised by tests/test_texture.py).

    ``use_pallas`` runs the VMEM-resident 4-angle run-bookkeeping kernel
    (ops.pallas_glrlm — the XLA shift chains cost ~3 ms per whole-map op in
    HBM) and the MXU one-hot histogram kernel (ops.pallas_hist); both paths
    are exactly equivalent (tested)."""
    inside = mask > 0
    n_p = jnp.maximum(inside.sum().astype(jnp.float32), 1.0)
    i_vals = jnp.arange(1, NG + 1, dtype=jnp.float32)
    l_vals = jnp.arange(1, max_len + 1, dtype=jnp.float32)
    lvl_valid = (i_vals <= n_levels.astype(jnp.float32)).astype(jnp.float32)

    if use_pallas:
        from .pallas_glrlm import glrlm_runs_pallas, unpack_runs
        packed = glrlm_runs_pallas(levels, inside)

    def per_angle(angle_idx):
        dy, dx = ANGLES_2D[angle_idx]
        if use_pallas:
            from .pallas_hist import joint_histogram_pallas
            start, gray, length = unpack_runs(packed[angle_idx])
            g_codes = jnp.where(start, gray, 0)
            l_codes = jnp.where(start, jnp.clip(length, 1, max_len), 0)
            P = joint_histogram_pallas(g_codes, l_codes, NG, max_len)
        else:
            P = glrlm_matrix_for_angle(levels, inside, dy, dx, max_len)
        P = P * lvl_valid[:, None]
        nr = jnp.maximum(P.sum(), 1.0)
        p = P / nr
        pg = P.sum(axis=1)  # runs per gray level
        pl = P.sum(axis=0)  # runs per length

        sre = (pl / (l_vals ** 2)).sum() / nr
        lre = (pl * l_vals ** 2).sum() / nr
        gln = (pg ** 2).sum() / nr
        glnn = (pg ** 2).sum() / nr ** 2
        rln = (pl ** 2).sum() / nr
        rlnn = (pl ** 2).sum() / nr ** 2
        rp = nr / n_p
        mu_g = (i_vals * pg).sum() / nr
        glv = (((i_vals - mu_g) ** 2) * pg).sum() / nr
        mu_l = (l_vals * pl).sum() / nr
        rv = (((l_vals - mu_l) ** 2) * pl).sum() / nr
        rentropy = -(p * jnp.log2(p + EPS)).sum()
        lglre = (pg / (i_vals ** 2)).sum() / nr
        hglre = (pg * i_vals ** 2).sum() / nr
        srlgle = ((P / (i_vals[:, None] ** 2 * l_vals[None, :] ** 2)).sum()) / nr
        srhgle = ((P * i_vals[:, None] ** 2 / l_vals[None, :] ** 2).sum()) / nr
        lrlgle = ((P * l_vals[None, :] ** 2 / i_vals[:, None] ** 2).sum()) / nr
        lrhgle = ((P * i_vals[:, None] ** 2 * l_vals[None, :] ** 2).sum()) / nr
        return {
            "ShortRunEmphasis": sre,
            "LongRunEmphasis": lre,
            "GrayLevelNonUniformity": gln,
            "GrayLevelNonUniformityNormalized": glnn,
            "RunLengthNonUniformity": rln,
            "RunLengthNonUniformityNormalized": rlnn,
            "RunPercentage": rp,
            "GrayLevelVariance": glv,
            "RunVariance": rv,
            "RunEntropy": rentropy,
            "LowGrayLevelRunEmphasis": lglre,
            "HighGrayLevelRunEmphasis": hglre,
            "ShortRunLowGrayLevelEmphasis": srlgle,
            "ShortRunHighGrayLevelEmphasis": srhgle,
            "LongRunLowGrayLevelEmphasis": lrlgle,
            "LongRunHighGrayLevelEmphasis": lrhgle,
        }

    feats = [per_angle(a) for a in range(4)]
    return {k: jnp.stack([f[k] for f in feats]).mean() for k in feats[0]}


# =============================================================== first order

def firstorder_features(image: jnp.ndarray, mask: jnp.ndarray,
                        bin_width: float) -> Dict[str, jnp.ndarray]:
    """The 19 pyradiomics first-order features (StandardDeviation excluded by
    default upstream; kept available under its own name)."""
    inside = mask > 0
    n = jnp.maximum(inside.sum().astype(jnp.float32), 1.0)
    x = image.astype(jnp.float32)
    big = jnp.float32(3.4e38)
    vals_masked = jnp.where(inside, x, jnp.nan)

    mean = jnp.where(inside, x, 0.0).sum() / n
    minimum = jnp.min(jnp.where(inside, x, big))
    maximum = jnp.max(jnp.where(inside, x, -big))
    energy = jnp.where(inside, x ** 2, 0.0).sum()
    var = jnp.where(inside, (x - mean) ** 2, 0.0).sum() / n
    std = jnp.sqrt(var)
    rms = jnp.sqrt(energy / n)
    mad = jnp.where(inside, jnp.abs(x - mean), 0.0).sum() / n
    m3 = jnp.where(inside, (x - mean) ** 3, 0.0).sum() / n
    m4 = jnp.where(inside, (x - mean) ** 4, 0.0).sum() / n
    skew = jnp.where(std > 0, m3 / jnp.maximum(std ** 3, EPS), 0.0)
    kurt = jnp.where(std > 0, m4 / jnp.maximum(var ** 2, EPS), 0.0)

    p10 = jnp.nanpercentile(vals_masked, 10)
    p25 = jnp.nanpercentile(vals_masked, 25)
    p50 = jnp.nanpercentile(vals_masked, 50)
    p75 = jnp.nanpercentile(vals_masked, 75)
    p90 = jnp.nanpercentile(vals_masked, 90)

    in_robust = inside & (x >= p10) & (x <= p90)
    n_rob = jnp.maximum(in_robust.sum().astype(jnp.float32), 1.0)
    mean_rob = jnp.where(in_robust, x, 0.0).sum() / n_rob
    rmad = jnp.where(in_robust, jnp.abs(x - mean_rob), 0.0).sum() / n_rob

    levels, n_levels, _ = discretize(image, mask, bin_width)
    # one-hot reduction, not a bincount scatter (near-serial on TPU)
    hist = jax.nn.one_hot(jnp.where(inside, levels, 0).reshape(-1) - 1, NG,
                          dtype=jnp.float32).sum(axis=0)
    p_hist = hist / n
    entropy = -(p_hist * jnp.log2(p_hist + EPS)).sum()
    uniformity = (p_hist ** 2).sum()

    return {
        "Energy": energy,
        "TotalEnergy": energy,  # spacing (1, 1): voxel volume 1
        "Entropy": entropy,
        "Minimum": minimum,
        "10Percentile": p10,
        "90Percentile": p90,
        "Maximum": maximum,
        "Mean": mean,
        "Median": p50,
        "InterquartileRange": p75 - p25,
        "Range": maximum - minimum,
        "MeanAbsoluteDeviation": mad,
        "RobustMeanAbsoluteDeviation": rmad,
        "RootMeanSquared": rms,
        "Skewness": skew,
        "Kurtosis": kurt,
        "Variance": var,
        "Uniformity": uniformity,
    }
