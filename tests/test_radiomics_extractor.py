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


def test_batched_extraction_matches_per_image(extracted, rng):
    """Cross-image batching (images x channels in one device program) must
    reproduce the per-image path feature-for-feature."""
    res0, rgb, mask, ex = extracted
    rgb2 = rng.randint(0, 255, (32, 32, 3), np.uint8)
    mask2 = np.zeros((32, 32), np.uint8)
    mask2[3:20, 8:30] = 255

    batch = ex.extract_channels_batch(np.stack([rgb, rgb2]),
                                      np.stack([mask, mask2]))
    single2 = ex.extract_channels(rgb2, mask2)
    for ch in CHANNELS:
        for k, v in res0[ch].items():
            assert batch[0][ch][k] == pytest.approx(v, rel=1e-5, abs=1e-6), (ch, k)
        for k, v in single2[ch].items():
            assert batch[1][ch][k] == pytest.approx(v, rel=1e-5, abs=1e-6), (ch, k)


def test_parallell_extraction_batched_with_native_decode(tmp_path, rng):
    """The Pool-replacement path end to end: native full-frame decode ->
    fixed-size padded chunks -> batched device extraction; remainder chunk
    (5 records, batch=4) handled; matches the per-image cv2 path."""
    import cv2
    from multimodal_isic_tpu.data import native_io
    if not native_io.available():
        pytest.skip("native IO library not available")

    records = []
    for i in range(5):
        img = rng.randint(0, 255, (40, 48, 3), np.uint8)
        msk = np.zeros((40, 48), np.uint8)
        msk[8:30, 10:40] = 255
        ip = str(tmp_path / f"img_{i}.jpg")
        sp = str(tmp_path / f"img_{i}_segmentation.png")
        cv2.imwrite(ip, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
        cv2.imwrite(sp, msk)
        records.append({"image_path": ip, "segmentation_path": sp})

    ex = RadiomicsExtractor(glrlm_max_len=48, batch=4)
    batched = ex.parallell_extraction(records)
    assert len(batched) == 5
    ex1 = RadiomicsExtractor(glrlm_max_len=48, batch=1)
    singles = ex1.parallell_extraction(records)
    for b, s in zip(batched, singles):
        for ch in CHANNELS:
            for k, v in s[ch].items():
                assert b[ch][k] == pytest.approx(v, rel=1e-5, abs=1e-6), (ch, k)


def test_mesh_sharded_extraction_matches_single_device(extracted, rng):
    """Multi-chip radiomics: sharding the image×channel maps axis over the
    8-device ``data`` mesh axis must be feature-identical to the meshless
    path — the TPU-native replacement for the reference's
    ``multiprocessing.Pool`` image farm (``RadiomicExtractor.py:58-71``)."""
    from multimodal_isic_tpu.parallel import make_mesh

    res0, rgb, mask, ex = extracted
    rgb2 = rng.randint(0, 255, (32, 32, 3), np.uint8)
    mask2 = np.zeros((32, 32), np.uint8)
    mask2[3:20, 8:30] = 255

    mesh = make_mesh(n_data=8, n_model=1)
    exm = RadiomicsExtractor(glrlm_max_len=32, mesh=mesh)
    # 2 images x 4 channels = 8 maps -> 1 per device
    batch = exm.extract_channels_batch(np.stack([rgb, rgb2]),
                                       np.stack([mask, mask2]))
    single2 = ex.extract_channels(rgb2, mask2)
    for ch in CHANNELS:
        for k, v in res0[ch].items():
            assert batch[0][ch][k] == pytest.approx(v, rel=1e-5, abs=1e-6), (ch, k)
        for k, v in single2[ch].items():
            assert batch[1][ch][k] == pytest.approx(v, rel=1e-5, abs=1e-6), (ch, k)


def test_mesh_extractor_per_image_path(extracted):
    """A mesh-configured extractor must still serve the per-image API (4
    maps can't divide an 8-device data axis — it runs the unsharded jits)."""
    from multimodal_isic_tpu.parallel import make_mesh

    res0, rgb, mask, _ = extracted
    exm = RadiomicsExtractor(glrlm_max_len=32, mesh=make_mesh(8, 1))
    res = exm.extract_channels(rgb, mask)
    for k, v in res0["grayscale"].items():
        assert res["grayscale"][k] == pytest.approx(v, rel=1e-5, abs=1e-6), k
