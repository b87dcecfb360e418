"""GLSZM / GLDM / NGTDM / shape2D golden tests vs numpy loop oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_isic_tpu.ops import texture as T
from multimodal_isic_tpu.ops import texture_extra as X
from tests.test_texture import _case, np_discretize

NEIGH8 = X.NEIGH8


def np_zones(levels, mask):
    """Flood-fill connected zones (8-conn, equal gray) → list[(gray, size)]."""
    h, w = levels.shape
    seen = np.zeros((h, w), bool)
    zones = []
    for y in range(h):
        for x in range(w):
            if mask[y, x] == 0 or seen[y, x]:
                continue
            g = levels[y, x]
            stack = [(y, x)]
            seen[y, x] = True
            size = 0
            while stack:
                cy, cx = stack.pop()
                size += 1
                for dy, dx in NEIGH8:
                    ny, nx = cy + dy, cx + dx
                    if (0 <= ny < h and 0 <= nx < w and not seen[ny, nx]
                            and mask[ny, nx] > 0 and levels[ny, nx] == g):
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            zones.append((g, size))
    return zones


def test_connected_components_match_floodfill(rng):
    img, mask = _case(rng, h=14, w=13, vmax=30)
    lv_np, _ = np_discretize(img, mask, 10.0)
    zones = np_zones(lv_np, mask)

    label = np.asarray(X.connected_components(
        jnp.asarray(lv_np, jnp.int32), jnp.asarray(mask) > 0))
    sizes = np.bincount(label[mask > 0].reshape(-1))
    ours = sorted(s for s in sizes if s > 0)
    theirs = sorted(s for _, s in zones)
    assert ours == theirs


def test_connected_components_long_serpentine():
    """A single-gray boustrophedon snake over a 40x41 grid has a flood path
    of ~800 pixels: plain label propagation needs O(path) sweeps (the old
    64-iteration cap silently truncated it on real lesion maps), while the
    min-hooking union converges in O(log n). The snake must come back as
    exactly ONE zone, and the off-snake filler as its own components."""
    h, w = 40, 41
    levels = np.ones((h, w), np.int32) * 2   # filler gray
    snake = np.zeros((h, w), bool)
    for r in range(0, h, 2):
        snake[r, :] = True                   # full horizontal runs
    for r in range(1, h, 2):                 # alternate connectors
        snake[r, w - 1 if (r // 2) % 2 == 0 else 0] = True
    levels[snake] = 7
    mask = np.ones((h, w), np.uint8)

    label = np.asarray(X.connected_components(
        jnp.asarray(levels), jnp.asarray(mask) > 0))
    zones = np_zones(levels, mask)
    sizes = np.bincount(label[mask > 0].reshape(-1))
    assert sorted(s for s in sizes if s > 0) == sorted(s for _, s in zones)
    # the snake itself is one component of exactly its pixel count
    snake_labels = np.unique(label[snake])
    assert snake_labels.size == 1
    assert int(snake.sum()) == int((label == snake_labels[0]).sum())


def test_glszm_features_match_oracle(rng):
    img, mask = _case(rng, h=12, w=13, vmax=30)
    lv_np, n_np = np_discretize(img, mask, 10.0)
    zones = np_zones(lv_np, mask)
    g = np.array([z[0] for z in zones], float)
    s = np.array([z[1] for z in zones], float)
    nz = len(zones)
    n_p = (mask > 0).sum()

    from collections import Counter
    per_gray = Counter(int(x) for x in g)
    per_size = Counter(int(x) for x in s)
    per_pair = Counter(zip(g.astype(int), s.astype(int)))
    p_pairs = np.array(list(per_pair.values()), float) / nz

    expected = {
        "SmallAreaEmphasis": (1 / s ** 2).sum() / nz,
        "LargeAreaEmphasis": (s ** 2).sum() / nz,
        "GrayLevelNonUniformity": sum(c ** 2 for c in per_gray.values()) / nz,
        "SizeZoneNonUniformity": sum(c ** 2 for c in per_size.values()) / nz,
        "ZonePercentage": nz / n_p,
        "ZoneEntropy": -(p_pairs * np.log2(p_pairs)).sum(),
        "HighGrayLevelZoneEmphasis": (g ** 2).sum() / nz,
        "LargeAreaLowGrayLevelEmphasis": (s ** 2 / g ** 2).sum() / nz,
    }
    lv, n, _ = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    feats = X.glszm_features(lv, jnp.asarray(mask), n)
    for k, v in expected.items():
        assert float(feats[k]) == pytest.approx(v, rel=1e-4), k
    assert len(feats) == 16


def test_gldm_features_match_oracle(rng):
    img, mask = _case(rng, h=12, w=13, vmax=30)
    lv_np, n_np = np_discretize(img, mask, 10.0)
    h, w = lv_np.shape
    deps = []
    for y in range(h):
        for x in range(w):
            if mask[y, x] == 0:
                continue
            d = 0
            for dy, dx in NEIGH8:
                ny, nx = y + dy, x + dx
                if (0 <= ny < h and 0 <= nx < w and mask[ny, nx] > 0
                        and abs(int(lv_np[ny, nx]) - int(lv_np[y, x])) <= 0):
                    d += 1
            deps.append((lv_np[y, x], d + 1))
    g = np.array([d[0] for d in deps], float)
    j = np.array([d[1] for d in deps], float)
    nzv = len(deps)
    from collections import Counter
    per_gray = Counter(g.astype(int))
    per_dep = Counter(j.astype(int))
    expected = {
        "SmallDependenceEmphasis": (1 / j ** 2).sum() / nzv,
        "LargeDependenceEmphasis": (j ** 2).sum() / nzv,
        "GrayLevelNonUniformity": sum(c ** 2 for c in per_gray.values()) / nzv,
        "DependenceNonUniformity": sum(c ** 2 for c in per_dep.values()) / nzv,
        "HighGrayLevelEmphasis": (g ** 2).sum() / nzv,
        "SmallDependenceHighGrayLevelEmphasis": (g ** 2 / j ** 2).sum() / nzv,
    }
    lv, n, _ = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    feats = X.gldm_features(lv, jnp.asarray(mask), n)
    for k, v in expected.items():
        assert float(feats[k]) == pytest.approx(v, rel=1e-4), k
    assert len(feats) == 14


def test_ngtdm_features_match_oracle(rng):
    img, mask = _case(rng, h=11, w=12, vmax=40)
    lv_np, n_np = np_discretize(img, mask, 10.0)
    h, w = lv_np.shape
    s = np.zeros(n_np + 1)
    n_cnt = np.zeros(n_np + 1)
    for y in range(h):
        for x in range(w):
            if mask[y, x] == 0:
                continue
            vals = [lv_np[y + dy, x + dx] for dy, dx in NEIGH8
                    if 0 <= y + dy < h and 0 <= x + dx < w and mask[y + dy, x + dx] > 0]
            if not vals:
                continue
            g = lv_np[y, x]
            s[g] += abs(g - np.mean(vals))
            n_cnt[g] += 1
    nvp = n_cnt.sum()
    p = n_cnt / nvp
    i = np.arange(n_np + 1, dtype=float)
    coarse = 1.0 / (p * s).sum()

    lv, n, _ = T.discretize(jnp.asarray(img), jnp.asarray(mask), 10.0)
    feats = X.ngtdm_features(lv, jnp.asarray(mask), n)
    assert float(feats["Coarseness"]) == pytest.approx(coarse, rel=1e-4)

    present = np.where(p > 0)[0]
    ngp = len(present)
    contrast = 0.0
    for a in present:
        for b in present:
            contrast += p[a] * p[b] * (a - b) ** 2
    contrast *= s.sum() / nvp / (ngp * (ngp - 1))
    assert float(feats["Contrast"]) == pytest.approx(contrast, rel=1e-3)
    for k, v in feats.items():
        assert np.isfinite(float(v)), k
    assert len(feats) == 5


def test_shape2d_rectangle():
    mask = np.zeros((20, 30), np.uint8)
    mask[5:15, 4:24] = 255  # 10 x 20 rectangle
    feats = X.shape2d_features(jnp.asarray(mask))
    assert float(feats["PixelSurface"]) == 200
    # marching squares with midpoint crossings: area ≈ (10-?)(20-?) boundary-
    # smoothed; must sit between inner and outer pixel-count bounds
    assert 9 * 19 < float(feats["MeshSurface"]) <= 200
    # perimeter ≈ 2*(10+20) with corner smoothing
    assert 50 < float(feats["Perimeter"]) < 62
    # max diameter over marching-squares mesh vertices (pyradiomics
    # semantics): farthest pair is a horizontal-crossing vertex pair
    # (y=5, x=3.5) ↔ (y=14, x=23.5)
    expected_diag = np.hypot(9, 20)
    assert float(feats["MaximumDiameter"]) == pytest.approx(expected_diag, rel=1e-5)
    assert float(feats["MajorAxisLength"]) > float(feats["MinorAxisLength"])
    # uniform rectangle: major/minor from exact covariance of uniform grid
    xs = np.arange(4, 24)
    ys = np.arange(5, 15)
    major = 4 * np.sqrt(np.var(xs))
    minor = 4 * np.sqrt(np.var(ys))
    assert float(feats["MajorAxisLength"]) == pytest.approx(major, rel=1e-4)
    assert float(feats["MinorAxisLength"]) == pytest.approx(minor, rel=1e-4)
    assert float(feats["Elongation"]) == pytest.approx(minor / major, rel=1e-4)
    assert len(feats) == 9


def test_shape2d_disk_sphericity():
    h = w = 41
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (((yy - 20) ** 2 + (xx - 20) ** 2) <= 15 ** 2).astype(np.uint8) * 255
    feats = X.shape2d_features(jnp.asarray(mask))
    # staircase rasterization inflates the marching-squares perimeter a bit
    assert 0.90 < float(feats["Sphericity"]) <= 1.0
    assert float(feats["Elongation"]) == pytest.approx(1.0, abs=0.05)
    # vertex-based diameter: half a pixel beyond the outermost pixel centers
    # on each side (31 = 30 pixel-center span + 2×0.5)
    assert float(feats["MaximumDiameter"]) == pytest.approx(31.0, rel=0.02)
