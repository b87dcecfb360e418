"""GLSZM / GLDM / NGTDM / shape2D feature classes.

Completes the reference's enabled feature-class set (``params.yml:151-172``)
beyond first-order/GLCM/GLRLM.  GLSZM's connected components (8-connectivity,
equal gray level) run fully on device via min-label propagation with pointer
jumping — an O(log N)-step XLA loop instead of a host union-find.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .texture import EPS, NG
from .texture import _shift2d as _shift  # one shift helper for all classes

NEIGH8 = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def connected_components(levels: jnp.ndarray, inside: jnp.ndarray,
                         max_iters: int = 128) -> jnp.ndarray:
    """Per-pixel component label (min linear index of the component) for
    same-gray 8-connected regions inside the ROI; BIG outside.

    Shiloach–Vishkin-style union by min-root: each iteration fully exploits
    transitive merges by (a) two pointer-jumping compressions
    (label ← label[label]) and (b) a min-HOOK that scatters each pixel's best
    neighbouring root onto its OWN root (``at[root].min``) — so components
    merge tree-at-a-time rather than pixel-at-a-time.  Plain label
    propagation needs O(path length) sweeps (>200 on real 450×600 lesion
    maps, where same-level sets snake through texture); root hooking
    converges in O(log n) — single digits in practice — with the
    ``changed`` flag making the result exact, not best-effort.
    """
    h, w = levels.shape
    n = h * w
    big = jnp.int32(n)
    lin = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    # initialize each pixel with its horizontal run's start index (a forward
    # cummax over run-start positions): whole rows collapse immediately and
    # the loop only has to merge runs vertically/diagonally
    prev_lv = jnp.concatenate([jnp.full((h, 1), -1, levels.dtype),
                               levels[:, :-1]], axis=1)
    prev_in = jnp.concatenate([jnp.zeros((h, 1), jnp.bool_),
                               inside[:, :-1]], axis=1)
    start = inside & (~prev_in | (levels != prev_lv))
    run_start = jax.lax.cummax(jnp.where(start, lin, -1), axis=1)
    label0 = jnp.where(inside, run_start, big).reshape(-1)

    def jump(d):
        flat = jnp.concatenate([d, jnp.array([big])])
        return flat[jnp.clip(d, 0, big)]

    def hook_min(d):
        """Scatter each pixel's best same-level neighbour label onto the
        pixel's current root: D[D[p]] ← min(D[D[p]], min_nbr_label(p))."""
        lab2 = jnp.where(inside, d.reshape(h, w), big)
        best = lab2
        for dy, dx in NEIGH8:
            nl = _shift(lab2, dy, dx, big)
            ng = _shift(levels, dy, dx, -1)
            ok = inside & (ng == levels)
            best = jnp.where(ok, jnp.minimum(best, nl), best)
        ext = jnp.concatenate([d, jnp.array([big])])
        ext = ext.at[jnp.clip(d, 0, big)].min(best.reshape(-1))
        return ext[:-1]

    def body(state):
        d, _, i = state
        d2 = hook_min(jump(jump(d)))
        return d2, jnp.any(d2 != d), i + 1

    def cond(state):
        _, changed, i = state
        return changed & (i < max_iters)

    d, _, _ = jax.lax.while_loop(cond, body, (label0, jnp.bool_(True), 0))
    # on normal exit (changed == False) d is already a fully-compressed star
    # forest; the extra jumps only matter if max_iters was ever hit
    label = jump(jump(d)).reshape(h, w)
    return jnp.where(inside, label, big)


# ==================================================================== GLSZM

def glszm_features(levels: jnp.ndarray, mask: jnp.ndarray,
                   n_levels: jnp.ndarray,
                   use_pallas: bool = False) -> Dict[str, jnp.ndarray]:
    """16 pyradiomics GLSZM features from same-gray 8-connected zones.

    ``use_pallas`` labels zones with the VMEM-resident sweep kernel
    (``ops.pallas_cc``) instead of the XLA hooking loop — equivalent results
    (tested), ~10× faster on TPU where gather/scatter is near-serial."""
    inside = mask > 0
    h, w = levels.shape
    # the sort-based zone grouping packs (label, gray) into one int32 key:
    # label·(NG+1)+gray must stay below 2³¹ or zones silently scramble
    assert h * w * (NG + 1) < 2 ** 31, (
        f"glszm key packing overflows int32 for {h}x{w} images "
        f"(h*w*(NG+1) = {h * w * (NG + 1)} >= 2^31)")
    n_p = jnp.maximum(inside.sum().astype(jnp.float32), 1.0)
    if use_pallas:
        from .pallas_cc import connected_components_pallas
        label = connected_components_pallas(levels, inside)
    else:
        label = connected_components(levels, inside)
    big = h * w
    n = big
    idx = jnp.arange(n, dtype=jnp.int32)

    # Scatter-free zone table: TPU scatters (bincount over H·W bins,
    # .at[].max) run near-serially (~50 ms each per 16 maps at 450×600) while
    # a 270k sort is ~0.7 ms.  Pack (label, gray) into one key — all pixels
    # of a zone share both — sort once, and read zones off the sorted array:
    # a zone = a run of equal keys; its size = run length, its gray = key
    # residue.  Everything downstream is segmented scans + masked reductions.
    key = jnp.where(inside, label * (NG + 1) + levels,
                    jnp.int32(big) * (NG + 1)).reshape(-1)
    sk = jnp.sort(key)
    gray_s = (sk % (NG + 1)).astype(jnp.float32)
    valid = sk < big * (NG + 1)
    start = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]]) & valid
    is_end = jnp.concatenate([sk[:-1] != sk[1:], jnp.array([True])]) & valid
    start_pos = jax.lax.cummax(jnp.where(start, idx, -1))
    end_pos = jax.lax.cummin(jnp.where(is_end, idx, n)[::-1])[::-1]
    size_s = (end_pos - start_pos + 1).astype(jnp.float32)  # zone size at
    # every sorted position of the zone (constant within the run)

    zval = start.astype(jnp.float32)  # one entry per zone (at run starts)
    nz = jnp.maximum(zval.sum(), 1.0)
    g = gray_s
    s = size_s

    sae = jnp.sum(zval / jnp.maximum(s, 1.0) ** 2) / nz
    lae = jnp.sum(zval * s ** 2) / nz
    # per-gray zone counts: one-hot reduction (VPU/MXU), not a bincount
    pg = jnp.sum(jax.nn.one_hot(sk % (NG + 1) - 1, NG, dtype=jnp.float32)
                 * zval[:, None], axis=0)
    gln = (pg ** 2).sum() / nz
    glnn = (pg ** 2).sum() / nz ** 2
    # per-size and per-(size, gray) zone counts from ONE more sort: group the
    # per-zone (size, gray) keys; equal full keys → N(g, s) for ZoneEntropy,
    # equal size-part prefixes → N(s) for SizeZoneNonUniformity.
    zkey = jnp.where(start, size_s.astype(jnp.int32) * (NG + 1) + sk % (NG + 1),
                     jnp.int32((big + 2) * (NG + 1)))
    zs = jnp.sort(zkey)
    zvalid = zs < (big + 2) * (NG + 1)
    gs_start = jnp.concatenate([jnp.array([True]), zs[1:] != zs[:-1]]) & zvalid
    gs_end = jnp.concatenate([zs[:-1] != zs[1:], jnp.array([True])]) & zvalid
    gs_s = jax.lax.cummax(jnp.where(gs_start, idx, -1))
    gs_e = jax.lax.cummin(jnp.where(gs_end, idx, n)[::-1])[::-1]
    n_gs = (gs_e - gs_s + 1).astype(jnp.float32)     # N(gray, size) per run
    zsize = zs // (NG + 1)
    sz_start = jnp.concatenate([jnp.array([True]),
                                zsize[1:] != zsize[:-1]]) & zvalid
    sz_end = jnp.concatenate([zsize[:-1] != zsize[1:],
                              jnp.array([True])]) & zvalid
    sz_s = jax.lax.cummax(jnp.where(sz_start, idx, -1))
    sz_e = jax.lax.cummin(jnp.where(sz_end, idx, n)[::-1])[::-1]
    n_sz = (sz_e - sz_s + 1).astype(jnp.float32)     # N(size) per run
    szn = jnp.sum(jnp.where(sz_start, n_sz ** 2, 0.0)) / nz
    sznn = szn / nz
    zp = nz / n_p
    mu_g = jnp.sum(zval * g) / nz
    glv = jnp.sum(zval * (g - mu_g) ** 2) / nz
    mu_s = jnp.sum(zval * s) / nz
    zv = jnp.sum(zval * (s - mu_s) ** 2) / nz
    p_gs = n_gs / nz
    ze = -jnp.sum(jnp.where(gs_start, p_gs * jnp.log2(p_gs + EPS), 0.0))
    lglze = jnp.sum(zval / jnp.maximum(g, 1.0) ** 2) / nz
    hglze = jnp.sum(zval * g ** 2) / nz
    salgle = jnp.sum(zval / jnp.maximum(g * s, 1.0) ** 2) / nz
    sahgle = jnp.sum(zval * g ** 2 / jnp.maximum(s, 1.0) ** 2) / nz
    lalgle = jnp.sum(zval * s ** 2 / jnp.maximum(g, 1.0) ** 2) / nz
    lahgle = jnp.sum(zval * s ** 2 * g ** 2) / nz
    return {
        "SmallAreaEmphasis": sae,
        "LargeAreaEmphasis": lae,
        "GrayLevelNonUniformity": gln,
        "GrayLevelNonUniformityNormalized": glnn,
        "SizeZoneNonUniformity": szn,
        "SizeZoneNonUniformityNormalized": sznn,
        "ZonePercentage": zp,
        "GrayLevelVariance": glv,
        "ZoneVariance": zv,
        "ZoneEntropy": ze,
        "LowGrayLevelZoneEmphasis": lglze,
        "HighGrayLevelZoneEmphasis": hglze,
        "SmallAreaLowGrayLevelEmphasis": salgle,
        "SmallAreaHighGrayLevelEmphasis": sahgle,
        "LargeAreaLowGrayLevelEmphasis": lalgle,
        "LargeAreaHighGrayLevelEmphasis": lahgle,
    }


# ===================================================================== GLDM

def gldm_features(levels: jnp.ndarray, mask: jnp.ndarray,
                  n_levels: jnp.ndarray, alpha: float = 0.0) -> Dict[str, jnp.ndarray]:
    """14 pyradiomics GLDM features; dependence j = 1 + #(8-neighbors inside
    the ROI with |gray difference| ≤ α) — the IBSI/pyradiomics count that
    includes the center voxel."""
    inside = mask > 0
    n_p = jnp.maximum(inside.sum().astype(jnp.float32), 1.0)
    dep = jnp.zeros(levels.shape, jnp.int32)
    for dy, dx in NEIGH8:
        ng = _shift(levels, dy, dx, -(10 ** 6))
        nin = _shift(inside, dy, dx, False)
        ok = inside & nin & (jnp.abs(ng - levels) <= alpha)
        dep = dep + ok.astype(jnp.int32)
    j = jnp.where(inside, dep + 1, 0)  # 1..9
    nd = 9

    # [NG, nd] histogram as a one-hot MXU contraction (a bincount over
    # NG·nd bins is a near-serial TPU scatter, ~45 ms per 16 maps at 450×600;
    # the contraction is ~5 ms)
    oh_g = jax.nn.one_hot(levels.reshape(-1) - 1, NG, dtype=jnp.float32)
    oh_j = jax.nn.one_hot(j.reshape(-1) - 1, nd, dtype=jnp.float32)
    P = jnp.einsum("pi,pj->ij", oh_g * inside.reshape(-1, 1).astype(jnp.float32),
                   oh_j)

    nz = jnp.maximum(P.sum(), 1.0)
    i_vals = jnp.arange(1, NG + 1, dtype=jnp.float32)
    j_vals = jnp.arange(1, nd + 1, dtype=jnp.float32)
    pg = P.sum(axis=1)
    pd = P.sum(axis=0)
    p = P / nz

    sde = (pd / j_vals ** 2).sum() / nz
    lde = (pd * j_vals ** 2).sum() / nz
    gln = (pg ** 2).sum() / nz
    dn = (pd ** 2).sum() / nz
    dnn = (pd ** 2).sum() / nz ** 2
    mu_g = (i_vals * pg).sum() / nz
    glv = ((i_vals - mu_g) ** 2 * pg).sum() / nz
    mu_d = (j_vals * pd).sum() / nz
    dv = ((j_vals - mu_d) ** 2 * pd).sum() / nz
    de = -(p * jnp.log2(p + EPS)).sum()
    lgle = (pg / i_vals ** 2).sum() / nz
    hgle = (pg * i_vals ** 2).sum() / nz
    sdlgle = (P / (i_vals[:, None] ** 2 * j_vals[None, :] ** 2)).sum() / nz
    sdhgle = (P * i_vals[:, None] ** 2 / j_vals[None, :] ** 2).sum() / nz
    ldlgle = (P * j_vals[None, :] ** 2 / i_vals[:, None] ** 2).sum() / nz
    ldhgle = (P * i_vals[:, None] ** 2 * j_vals[None, :] ** 2).sum() / nz
    return {
        "SmallDependenceEmphasis": sde,
        "LargeDependenceEmphasis": lde,
        "GrayLevelNonUniformity": gln,
        "DependenceNonUniformity": dn,
        "DependenceNonUniformityNormalized": dnn,
        "GrayLevelVariance": glv,
        "DependenceVariance": dv,
        "DependenceEntropy": de,
        "LowGrayLevelEmphasis": lgle,
        "HighGrayLevelEmphasis": hgle,
        "SmallDependenceLowGrayLevelEmphasis": sdlgle,
        "SmallDependenceHighGrayLevelEmphasis": sdhgle,
        "LargeDependenceLowGrayLevelEmphasis": ldlgle,
        "LargeDependenceHighGrayLevelEmphasis": ldhgle,
    }


# ==================================================================== NGTDM

def ngtdm_features(levels: jnp.ndarray, mask: jnp.ndarray,
                   n_levels: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """5 pyradiomics NGTDM features (Coarseness, Contrast, Busyness,
    Complexity, Strength)."""
    inside = mask > 0
    nbr_sum = jnp.zeros(levels.shape, jnp.float32)
    nbr_cnt = jnp.zeros(levels.shape, jnp.float32)
    for dy, dx in NEIGH8:
        ng = _shift(levels.astype(jnp.float32), dy, dx, 0.0)
        nin = _shift(inside, dy, dx, False)
        nbr_sum += jnp.where(nin, ng, 0.0)
        nbr_cnt += nin.astype(jnp.float32)
    has_nbr = inside & (nbr_cnt > 0)
    a_bar = nbr_sum / jnp.maximum(nbr_cnt, 1.0)
    diff = jnp.where(has_nbr, jnp.abs(levels.astype(jnp.float32) - a_bar), 0.0)

    lv = jnp.where(has_nbr, levels, 0)
    # per-level count and Σ|diff| as one-hot reductions (scatter-free)
    oh = jax.nn.one_hot(lv.reshape(-1) - 1, NG, dtype=jnp.float32)
    n_i = oh.sum(axis=0)
    s_i = (oh * diff.reshape(-1, 1)).sum(axis=0)
    n_vp = jnp.maximum(n_i.sum(), 1.0)
    p_i = n_i / n_vp
    i_vals = jnp.arange(1, NG + 1, dtype=jnp.float32)
    present = p_i > 0
    ngp = jnp.maximum(present.sum().astype(jnp.float32), 1.0)

    coarse_den = (p_i * s_i).sum()
    coarseness = jnp.where(coarse_den > 0, 1.0 / coarse_den, 10 ** 6)

    pij_diff2 = (p_i[:, None] * p_i[None, :] *
                 (i_vals[:, None] - i_vals[None, :]) ** 2)
    contrast = jnp.where(
        ngp > 1,
        pij_diff2.sum() / (ngp * (ngp - 1.0) + EPS) * s_i.sum() / n_vp,
        0.0)

    busy_den = jnp.abs(i_vals[:, None] * p_i[:, None]
                       - i_vals[None, :] * p_i[None, :])
    busy_den = jnp.where(present[:, None] & present[None, :], busy_den, 0.0).sum()
    busyness = jnp.where(busy_den > 0, (p_i * s_i).sum() / busy_den, 0.0)

    both = present[:, None] & present[None, :]
    comp_num = (jnp.abs(i_vals[:, None] - i_vals[None, :]) *
                jnp.where(both,
                          (p_i[:, None] * s_i[:, None] + p_i[None, :] * s_i[None, :])
                          / jnp.maximum(p_i[:, None] + p_i[None, :], EPS), 0.0))
    complexity = comp_num.sum() / n_vp

    strength_num = jnp.where(both,
                             (p_i[:, None] + p_i[None, :]) *
                             (i_vals[:, None] - i_vals[None, :]) ** 2, 0.0).sum()
    strength = jnp.where(s_i.sum() > 0, strength_num / s_i.sum(), 0.0)
    return {
        "Coarseness": coarseness,
        "Contrast": contrast,
        "Busyness": busyness,
        "Complexity": complexity,
        "Strength": strength,
    }


# =================================================================== shape2D

# marching-squares lookup: per 2×2 corner case (bit order: TL=1, TR=2, BR=4,
# BL=8), the enclosed area inside the cell and the iso-contour length, with
# crossings at edge midpoints.
_MS_AREA = (0.0, 0.125, 0.125, 0.5, 0.125, 0.25, 0.5, 0.875,
            0.125, 0.5, 0.25, 0.875, 0.5, 0.875, 0.875, 1.0)
_SQ2H = 0.7071067811865476
_MS_PERIM = (0.0, _SQ2H, _SQ2H, 1.0, _SQ2H, 2 * _SQ2H, 1.0, _SQ2H,
             _SQ2H, 1.0, 2 * _SQ2H, _SQ2H, 1.0, _SQ2H, _SQ2H, 0.0)


def shape2d_features(mask: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """9 default pyradiomics shape2D features (mask-only; identical across
    channels/filters, as in the reference's output)."""
    inside = (mask > 0).astype(jnp.float32)
    h, w = inside.shape
    n_pix = jnp.maximum(inside.sum(), 1.0)

    padded = jnp.pad(inside, 1)
    tl = padded[:-1, :-1]
    tr = padded[:-1, 1:]
    br = padded[1:, 1:]
    bl = padded[1:, :-1]
    case = (tl + 2 * tr + 4 * br + 8 * bl).astype(jnp.int32)
    area = jnp.asarray(_MS_AREA, jnp.float32)[case].sum()
    perim = jnp.asarray(_MS_PERIM, jnp.float32)[case].sum()

    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    my = (inside * ys).sum() / n_pix
    mx = (inside * xs).sum() / n_pix
    cyy = (inside * (ys - my) ** 2).sum() / n_pix
    cxx = (inside * (xs - mx) ** 2).sum() / n_pix
    cxy = (inside * (ys - my) * (xs - mx)).sum() / n_pix
    cov = jnp.array([[cyy, cxy], [cxy, cxx]])
    eigs = jnp.linalg.eigvalsh(cov)  # ascending
    major = 4.0 * jnp.sqrt(jnp.maximum(eigs[1], 0.0))
    minor = 4.0 * jnp.sqrt(jnp.maximum(eigs[0], 0.0))
    elongation = jnp.sqrt(jnp.maximum(eigs[0], 0.0) /
                          jnp.maximum(eigs[1], EPS))

    # maximum diameter: max pairwise distance between MARCHING-SQUARES mesh
    # vertices (pyradiomics computes it over the half-pixel-offset boundary
    # mesh, not pixel centers).  The crossing vertices are exactly the
    # midpoints of every 4-adjacent pixel pair (incl. padding) whose inside
    # values differ: horizontal pairs → (y, x+0.5), vertical → (y+0.5, x).
    # Per-row min/max x suffices for the diameter (the farthest pair is
    # extremal in x within its own row), giving O(H² ) instead of all-pairs.
    hcross = padded[:, :-1] != padded[:, 1:]   # [h+2, w+1] at (r-1, c-0.5)
    vcross = padded[:-1, :] != padded[1:, :]   # [h+1, w+2] at (r-0.5, c-1)
    hx = jnp.arange(w + 1, dtype=jnp.float32)[None, :] - 0.5
    vx = jnp.arange(w + 2, dtype=jnp.float32)[None, :] - 1.0
    h_min = jnp.min(jnp.where(hcross, hx, jnp.inf), axis=1)
    h_max = jnp.max(jnp.where(hcross, hx, -jnp.inf), axis=1)
    v_min = jnp.min(jnp.where(vcross, vx, jnp.inf), axis=1)
    v_max = jnp.max(jnp.where(vcross, vx, -jnp.inf), axis=1)
    hy = jnp.arange(h + 2, dtype=jnp.float32) - 1.0
    vy = jnp.arange(h + 1, dtype=jnp.float32) - 0.5
    pts_y = jnp.concatenate([hy, hy, vy, vy])
    pts_x = jnp.concatenate([h_min, h_max, v_min, v_max])
    valid = jnp.isfinite(pts_x)
    px = jnp.where(valid, pts_x, 0.0)
    py = jnp.where(valid, pts_y, 0.0)
    d2 = ((px[:, None] - px[None, :]) ** 2 + (py[:, None] - py[None, :]) ** 2)
    d2 = jnp.where(valid[:, None] & valid[None, :], d2, 0.0)
    max_diam = jnp.sqrt(d2.max())

    sphericity = 2.0 * jnp.sqrt(jnp.pi * area) / jnp.maximum(perim, EPS)
    return {
        "MeshSurface": area,
        "PixelSurface": n_pix,
        "Perimeter": perim,
        "PerimeterSurfaceRatio": perim / jnp.maximum(area, EPS),
        "Sphericity": sphericity,
        "MaximumDiameter": max_diam,
        "MajorAxisLength": major,
        "MinorAxisLength": minor,
        "Elongation": elongation,
    }
