"""End-to-end radiomics extractor driver (batched filter-bank × classes)."""

import collections

import numpy as np
import pytest

from multimodal_isic_tpu.analysis.radiomics import (
    CHANNELS, RadiomicsExtractor, features_to_frame,
)


@pytest.fixture(scope="module")
def extracted():
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (32, 32, 3), np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    mask[6:26, 5:28] = 255
    ex = RadiomicsExtractor(glrlm_max_len=32)
    return ex.extract_channels(rgb, mask), rgb, mask, ex


def test_channel_structure_and_counts(extracted):
    res, _, _, _ = extracted
    assert list(res.keys()) == list(CHANNELS)
    counts = collections.Counter(k.split("_")[1] for k in res["grayscale"])
    # 13 derived images x {19 firstorder per ref default set -> 18 here,
    # 24 glcm, 16 glrlm, 16 glszm, 14 gldm, 5 ngtdm} + 9 shape2D
    assert counts["glcm"] == 13 * 24
    assert counts["glrlm"] == 13 * 16
    assert counts["glszm"] == 13 * 16
    assert counts["gldm"] == 13 * 14
    assert counts["ngtdm"] == 13 * 5
    assert counts["shape2D"] == 9
    assert all(np.isfinite(v) for v in res["grayscale"].values())


def test_channels_differ_but_shape_identical(extracted):
    res, _, _, _ = extracted
    # gray vs red texture differs...
    assert res["grayscale"]["original_glcm_Contrast"] != \
        res["red"]["original_glcm_Contrast"]
    # ...but shape2D depends only on the mask: identical across channels
    for ch in CHANNELS[1:]:
        assert res[ch]["original_shape2D_Perimeter"] == \
            res["grayscale"]["original_shape2D_Perimeter"]


def test_extraction_is_deterministic(extracted):
    res, rgb, mask, ex = extracted
    res2 = ex.extract_channels(rgb, mask)
    for k, v in res["blue"].items():
        assert res2["blue"][k] == v, k


def test_features_to_frame_suffixes(extracted):
    res, _, _, _ = extracted
    frame = features_to_frame([res, res])
    assert len(frame) == 2
    per_channel = len(res["grayscale"])
    assert frame.shape[1] == 4 * per_channel
    for suffix in ("_gs", "_red", "_green", "_blue"):
        assert sum(c.endswith(suffix) for c in frame.columns) == per_channel


def test_gray_conversion_is_bt601(extracted):
    """Grayscale channel uses the cv2 BGR2GRAY weights (0.299/0.587/0.114)."""
    _, rgb, mask, ex = extracted
    flat = np.full((32, 32, 3), 0, np.uint8)
    flat[..., 0] = 200  # pure red
    res = ex.extract_channels(flat, mask)
    assert res["grayscale"]["original_firstorder_Mean"] == pytest.approx(
        round(0.299 * 200), abs=0.5)
    assert res["red"]["original_firstorder_Mean"] == pytest.approx(200.0)
    assert res["blue"]["original_firstorder_Mean"] == pytest.approx(0.0)
