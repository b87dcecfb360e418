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

NEIGH8 = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def _shift(x: jnp.ndarray, dy: int, dx: int, fill):
    out = jnp.roll(jnp.roll(x, dy, axis=0), dx, axis=1)
    h, w = x.shape
    if dy > 0:
        out = out.at[:dy, :].set(fill)
    elif dy < 0:
        out = out.at[dy:, :].set(fill)
    if dx > 0:
        out = out.at[:, :dx].set(fill)
    elif dx < 0:
        out = out.at[:, dx:].set(fill)
    return out


def connected_components(levels: jnp.ndarray, inside: jnp.ndarray,
                         max_iters: int = 40) -> jnp.ndarray:
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


def _joint_entropy_from_keys(keys: jnp.ndarray, valid: jnp.ndarray,
                             total: jnp.ndarray) -> jnp.ndarray:
    """Entropy over the empirical distribution of (discrete) keys: sort, count
    equal runs, -Σ p·log2 p — without materializing an unbounded histogram."""
    big = jnp.iinfo(jnp.int32).max
    k = jnp.sort(jnp.where(valid, keys, big))
    n = k.shape[0]
    start = jnp.concatenate([jnp.array([True]), k[1:] != k[:-1]]) & (k < big)
    seg = jnp.cumsum(start.astype(jnp.int32)) - 1
    seg = jnp.where(k < big, seg, n)
    counts = jnp.bincount(seg, length=n + 1)[:-1].astype(jnp.float32)
    p = counts / jnp.maximum(total, 1.0)
    return -jnp.sum(jnp.where(counts > 0, p * jnp.log2(p + EPS), 0.0))


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
    n_p = jnp.maximum(inside.sum().astype(jnp.float32), 1.0)
    if use_pallas:
        from .pallas_cc import connected_components_pallas
        label = connected_components_pallas(levels, inside)
    else:
        label = connected_components(levels, inside)
    big = h * w

    sizes_all = jnp.bincount(label.reshape(-1), length=big + 1)[:-1]  # per root
    is_zone = sizes_all > 0
    root_gray = jnp.zeros(big + 1, jnp.int32).at[label.reshape(-1)].max(
        levels.reshape(-1))[:-1]  # gray at any member (all equal)

    nz = jnp.maximum(is_zone.sum().astype(jnp.float32), 1.0)
    s = sizes_all.astype(jnp.float32)
    g = root_gray.astype(jnp.float32)
    zval = is_zone.astype(jnp.float32)

    sae = jnp.sum(jnp.where(is_zone, 1.0 / jnp.maximum(s, 1.0) ** 2, 0.0)) / nz
    lae = jnp.sum(zval * s ** 2) / nz
    # per-gray zone counts
    pg = jnp.bincount(jnp.where(is_zone, root_gray, 0).reshape(-1),
                      weights=zval, length=NG + 1)[1:]
    gln = (pg ** 2).sum() / nz
    glnn = (pg ** 2).sum() / nz ** 2
    # per-size zone counts: Σ_s N(s)² = Σ over zone pairs with equal size
    size_keys = jnp.where(is_zone, sizes_all, -1)
    sorted_sizes = jnp.sort(jnp.where(is_zone, sizes_all, big + 2))
    new_size = jnp.concatenate([jnp.array([True]),
                                sorted_sizes[1:] != sorted_sizes[:-1]])
    seg = jnp.cumsum(new_size.astype(jnp.int32)) - 1
    seg = jnp.where(sorted_sizes <= big, seg, big)
    per_size = jnp.bincount(seg, length=big + 1)[:-1].astype(jnp.float32)
    szn = (per_size ** 2).sum() / nz
    sznn = (per_size ** 2).sum() / nz ** 2
    zp = nz / n_p
    mu_g = jnp.sum(zval * g) / nz
    glv = jnp.sum(zval * (g - mu_g) ** 2) / nz
    mu_s = jnp.sum(zval * s) / nz
    zv = jnp.sum(zval * (s - mu_s) ** 2) / nz
    zone_keys = root_gray * (big + 1) + sizes_all
    ze = _joint_entropy_from_keys(zone_keys, is_zone, nz)
    lglze = jnp.sum(jnp.where(is_zone, 1.0 / jnp.maximum(g, 1.0) ** 2, 0.0)) / nz
    hglze = jnp.sum(zval * g ** 2) / nz
    salgle = jnp.sum(jnp.where(is_zone, 1.0 / jnp.maximum(g * s, 1.0) ** 2, 0.0)) / nz
    sahgle = jnp.sum(jnp.where(is_zone, g ** 2 / jnp.maximum(s, 1.0) ** 2, 0.0)) / nz
    lalgle = jnp.sum(jnp.where(is_zone, s ** 2 / jnp.maximum(g, 1.0) ** 2, 0.0)) / nz
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

    key = jnp.where(inside, (levels - 1) * nd + (j - 1), NG * nd)
    flat = jnp.bincount(key.reshape(-1), length=NG * nd + 1)[:-1]
    P = flat.reshape(NG, nd).astype(jnp.float32)

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
    n_i = jnp.bincount(lv.reshape(-1), length=NG + 1)[1:].astype(jnp.float32)
    s_i = jnp.zeros(NG + 1).at[lv.reshape(-1)].add(diff.reshape(-1))[1:]
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
