"""Data subsystem: manifest ETL, crops, augmentations, device pipeline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from multimodal_isic_tpu.core.rng import RngPool
from multimodal_isic_tpu.data import (
    DermRecords, DeviceLoader, LabelEncoder, augment, build_manifests,
    centroid_crop, centroid_crop_device, make_synthetic_isic, merge_isic2019,
    prepare_manifests,
)
from multimodal_isic_tpu.core.config import config_from_dict


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthetic")
    dirs = make_synthetic_isic(str(root), n_train=20, n_test=8,
                               image_hw=(90, 120), seed=0)
    cfg = config_from_dict({"dir": dirs})
    df_train, df_test = prepare_manifests(cfg)
    return cfg, df_train, df_test


# ------------------------------------------------------------ manifest ETL

def test_manifest_label_encoding_contract(dataset):
    _, df_train, df_test = dataset
    # akiec=0 ... vasc=6 alphabetical contract (prepare_df.py:92-93)
    assert sorted(df_train["dx"].unique().tolist()) == list(range(7))
    enc = LabelEncoder().fit(["nv", "mel", "akiec", "bcc", "bkl", "df", "vasc"])
    assert enc.transform(["akiec", "vasc", "mel"]).tolist() == [0, 6, 4]


def test_manifest_imputations_and_columns(dataset):
    _, df_train, df_test = dataset
    for df in (df_train, df_test):
        assert not df["age"].isna().any()
        assert not df["sex"].isna().any()
        assert df.columns[0] == "image_path"
        assert df.columns[1] == "segmentation_path"
        for col in ["age_normalized", "sex_encoded", "loc_encoded"]:
            assert col in df.columns
    # z-score anchored on train stats
    assert df_train["age_normalized"].mean() == pytest.approx(0.0, abs=1e-9)
    assert df_train["age_normalized"].std() == pytest.approx(1.0, abs=1e-9)


def test_manifest_median_age_is_per_class_from_train():
    df_train = pd.DataFrame({
        "image_id": [f"a{i}" for i in range(6)],
        "dx": ["mel", "mel", "mel", "nv", "nv", "nv"],
        "age": [10.0, np.nan, 30.0, 50.0, 60.0, np.nan],
        "sex": ["male"] * 6, "localization": ["back"] * 6,
    })
    df_test = pd.DataFrame({
        "image_id": ["t0", "t1"],
        "dx": ["mel", "nv"],
        "age": [np.nan, np.nan],
        "sex": ["male"] * 2, "localization": ["back"] * 2,
    })
    tr, te, _ = build_manifests(df_train, df_test, "i", "s", "it", "st")
    assert tr["age"].tolist() == [10.0, 20.0, 30.0, 50.0, 60.0, 55.0]
    assert te["age"].tolist() == [20.0, 55.0]  # train medians applied to test


def test_manifest_drops_bad_test_image():
    df_train = pd.DataFrame({
        "image_id": ["a", "b"], "dx": ["mel", "nv"], "age": [10.0, 20.0],
        "sex": ["male", "female"], "localization": ["back", "face"],
    })
    df_test = pd.DataFrame({
        "image_id": ["ISIC_0035068", "c"], "dx": ["mel", "nv"],
        "age": [10.0, 20.0], "sex": ["male", "male"],
        "localization": ["back", "back"],
        "Unnamed: 0": [0, 1],
    })
    _, te, _ = build_manifests(df_train, df_test, "i", "s", "it", "st")
    assert len(te) == 1
    assert not any("Unnamed" in c for c in te.columns)


def test_merge_isic2019_semantics(dataset):
    _, df_train, df_test = dataset
    meta = pd.DataFrame({"image": ["X1", "X2", "X3"]})
    gt = pd.DataFrame({
        "image": ["X1", "X2", "X3"],
        "MEL": [1, 0, 0], "NV": [0, 0, 0], "BCC": [0, 0, 0], "AK": [0, 0, 0],
        "BKL": [0, 0, 0], "DF": [0, 0, 0], "VASC": [0, 1, 0],
        "SCC": [0, 0, 1], "UNK": [0, 0, 0],
    })
    merged = merge_isic2019(df_train, df_test, meta, gt, "/img2019")
    new = merged[merged["image_id"].isin(["X1", "X2", "X3"])]
    assert set(new["image_id"]) == {"X1", "X2"}  # SCC dropped
    assert new.set_index("image_id")["dx"].to_dict() == {"X1": 4, "X2": 6}
    assert (new["segmentation_path"] == "no_mask").all()
    assert not merged.drop(columns=["image_id"]).isna().any().any()  # mode-filled


# ------------------------------------------------------------------ crops

def test_centroid_crop_matches_reference_math():
    img = np.arange(90 * 120 * 3, dtype=np.uint8).reshape(90, 120, 3)
    mask = np.zeros((90, 120), np.uint8)
    mask[10:20, 100:118] = 255  # lesion near right edge -> clamped window
    ci, cm = centroid_crop(img, mask)
    assert ci.shape == (90, 90, 3) and cm.shape == (90, 90)
    # reference math: cx=mean(xs), cy=mean(ys); x1 clamped to w-crop
    cx, cy = int(np.mean(np.where(mask > 0)[1])), int(np.mean(np.where(mask > 0)[0]))
    x1 = min(max(cx - 45, 0), 120 - 90)
    y1 = min(max(cy - 45, 0), 0)
    np.testing.assert_array_equal(ci, img[y1:y1 + 90, x1:x1 + 90])


def test_centroid_crop_no_mask_centers():
    img = np.zeros((100, 150, 3), np.uint8)
    ci, cm = centroid_crop(img, None)
    assert ci.shape == (100, 100, 3)
    assert cm.sum() == 0


def test_centroid_crop_device_matches_host():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 80, 3), np.uint8)
    mask = np.zeros((64, 80), np.uint8)
    mask[40:60, 5:25] = 255
    hi, hm = centroid_crop(img, mask, crop_size=48)
    di, dm = jax.jit(
        lambda i, m: centroid_crop_device(i, m, 48))(jnp.asarray(img), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(di), hi)
    np.testing.assert_array_equal(np.asarray(dm), hm)


# ------------------------------------------------------------- augmentations

def test_eval_transform_matches_cv2_resize():
    import cv2
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (45, 45, 3), np.uint8)
    ours = np.asarray(augment.resize_bilinear(jnp.asarray(img, jnp.float32), (38, 38)))
    theirs = cv2.resize(img.astype(np.float32), (38, 38), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - theirs).max() < 1.0  # sub-LSB agreement on uint8 scale


def test_resize_bilinear_mxu_matches_gather_path():
    """The MXU matmul resize (r4 serving-preproc speedup) is the SAME
    2-tap half-pixel bilinear as resize_bilinear / cv2.INTER_LINEAR."""
    import cv2
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (3, 45, 45, 3), np.uint8)
    ours = np.asarray(augment.resize_bilinear_mxu(jnp.asarray(imgs),
                                                  (38, 38)))
    ref = np.asarray(jax.vmap(lambda im: augment.resize_bilinear(
        im, (38, 38)))(jnp.asarray(imgs, jnp.float32)))
    np.testing.assert_allclose(ours, ref, atol=2e-3)
    theirs = cv2.resize(imgs[1].astype(np.float32), (38, 38),
                        interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours[1] - theirs).max() < 1.0
    # upscale direction too
    up = np.asarray(augment.resize_bilinear_mxu(jnp.asarray(imgs), (60, 50)))
    upref = np.asarray(jax.vmap(lambda im: augment.resize_bilinear(
        im, (60, 50)))(jnp.asarray(imgs, jnp.float32)))
    np.testing.assert_allclose(up, upref, atol=2e-3)
    # every weight row is a convex 2-tap combination
    w = np.asarray(augment._bilinear_matrix(45, 38))
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-6)
    assert ((w > 0).sum(1) <= 2).all() and (w >= 0).all()


def test_preprocess_eval_batch_matches_two_step_and_bf16_is_close():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (2, 45, 45, 3), np.uint8)
    ref = jax.vmap(lambda im: augment.normalize_imagenet(
        augment.resize_bilinear(im, (38, 38))))(jnp.asarray(imgs, jnp.float32))
    got = augment.preprocess_eval_batch(jnp.asarray(imgs), (38, 38))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # bf16 serving variant: same transform within bf16 resolution (the
    # normalized range is roughly -2.2..2.7, so 0.05 ≈ a few bf16 ULPs)
    gb = augment.preprocess_eval_batch(jnp.asarray(imgs), (38, 38),
                                       dtype=jnp.bfloat16)
    assert gb.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gb, np.float32), np.asarray(ref),
                               atol=0.05)


def test_normalize_imagenet_matches_albumentations_formula():
    img = jnp.full((4, 4, 3), 128.0)
    out = np.asarray(augment.normalize_imagenet(img))
    expected = (128 / 255 - np.array(augment.IMAGENET_MEAN)) / np.array(augment.IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5)


def test_flips_rot90_joint_and_involutive():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    mask = jnp.asarray((rng.rand(16, 16) > 0.5).astype(np.float32))
    i2, m2 = augment.random_flips_rot90(img, mask, jax.random.PRNGKey(3))
    # image and mask receive the SAME geometric op
    marked = img * mask[..., None]
    i3, m3 = augment.random_flips_rot90(marked, mask, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(i3), np.asarray(i2 * m2[..., None]), atol=1e-6)


def test_warp_taps_matches_map_coordinates(rng):
    """The flat-take warp (r5 TPU reformulation) is value-equal to
    jax.scipy.ndimage.map_coordinates(mode='mirror') — bilinear for images,
    nearest for masks, including out-of-range coords (REFLECT_101)."""
    h, w = 41, 37
    img = rng.rand(h, w, 3).astype(np.float32)
    mask = (rng.rand(h, w) > 0.5).astype(np.float32)
    theta = 0.3
    ys = np.arange(h, dtype=np.float32)[:, None]
    xs = np.arange(w, dtype=np.float32)[None, :]
    # rotation + shift pushing coords out of range on every border
    sy = np.cos(theta) * (ys - h / 2) - np.sin(theta) * (xs - w / 2) + h / 2 + 3.7
    sx = np.sin(theta) * (ys - h / 2) + np.cos(theta) * (xs - w / 2) + w / 2 - 2.2
    sy, sx = jnp.asarray(sy + 0 * sx), jnp.asarray(sx + 0 * sy)

    got = augment._warp_taps(jnp.asarray(img), sy, sx, order=1)
    want = jnp.stack([jax.scipy.ndimage.map_coordinates(
        jnp.asarray(img[..., c]), [sy, sx], order=1, mode="mirror")
        for c in range(3)], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    got0 = augment._warp_taps(jnp.asarray(mask), sy, sx, order=0)
    want0 = jax.scipy.ndimage.map_coordinates(
        jnp.asarray(mask), [sy, sx], order=0, mode="mirror")
    np.testing.assert_array_equal(np.asarray(got0), np.asarray(want0))


def test_shift_scale_rotate_identity_when_not_applied():
    img = jnp.asarray(np.random.RandomState(0).rand(20, 20, 3), jnp.float32)
    out, _ = augment.shift_scale_rotate(img, None, jax.random.PRNGKey(0), p=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))


def test_shift_scale_rotate_moves_content():
    img = jnp.zeros((32, 32, 3)).at[8:12, 8:12].set(1.0)
    out, _ = augment.shift_scale_rotate(img, None, jax.random.PRNGKey(1), p=1.0)
    assert not np.allclose(np.asarray(out), np.asarray(img))
    assert np.asarray(out).sum() > 0  # mass preserved-ish under reflect border


def test_random_resized_crop_shapes_and_scale_bounds():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(45, 45, 3) * 255, jnp.float32)
    mask = jnp.asarray((rng.rand(45, 45) > 0.7).astype(np.float32) * 255)
    for i in range(5):
        out, m = augment.random_resized_crop(img, mask, jax.random.PRNGKey(i), (22, 22))
        assert out.shape == (22, 22, 3)
        assert m.shape == (22, 22)
        assert set(np.unique(np.asarray(m))) <= {0.0, 255.0}


def test_color_jitter_and_noise_bounds():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(16, 16, 3) * 255, jnp.float32)
    out = augment.color_jitter(img, jax.random.PRNGKey(0), p=1.0)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 255.0
    assert not np.allclose(np.asarray(out), np.asarray(img))
    noisy = augment.gauss_noise(img, jax.random.PRNGKey(1), p=1.0)
    assert not np.allclose(np.asarray(noisy), np.asarray(img))
    sigma = np.std(np.asarray(noisy) - np.asarray(img))
    assert 1.0 < sigma < 15.0  # var_limit (10, 50) -> sigma in ~[3.2, 7.1]


def test_hsv_roundtrip():
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(8, 8, 3), jnp.float32)
    back = augment._hsv_to_rgb(augment._rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


# ---------------------------------------------------------------- pipeline

def test_device_loader_end_to_end(dataset):
    cfg, df_train, _ = dataset
    records = DermRecords(df_train, staging_hw=(90, 90))
    loader = DeviceLoader(records, batch_size=8,
                          transform=augment.POLICIES["mae_eval"])
    batches = list(loader)
    assert len(batches) == -(-len(df_train) // 8)
    b = batches[0]
    assert b["image"].shape == (8, 224, 224, 3)
    assert b["mask"].shape == (8, 224, 224)
    assert b["target"].shape == (8,)
    assert b["artifacts"].shape == (8, 6)
    assert b["radiomics"].shape == (8, 102)
    # normalized ImageNet stats: roughly centered
    assert abs(float(jnp.mean(b["image"]))) < 3.0


def test_device_loader_train_policy_stochastic(dataset):
    cfg, df_train, _ = dataset
    records = DermRecords(df_train, staging_hw=(90, 90))
    pool = RngPool(0)
    loader = DeviceLoader(records, batch_size=4, order=np.arange(4),
                          transform=augment.POLICIES["mae_train"],
                          rng_stream=pool["augment"])
    a = next(iter(loader))["image"]
    loader2 = DeviceLoader(records, batch_size=4, order=np.arange(4),
                           transform=augment.POLICIES["mae_train"],
                           rng_stream=RngPool(0)["augment"])
    b = next(iter(loader2))["image"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))  # seeded -> reproducible


def test_decoded_cache_identical_batches_and_skips_decode(dataset):
    """cache_decoded=True: epoch 2 serves bit-identical staging crops from
    RAM without touching the files — both the per-sample cv2 path and the
    native threaded-batch path."""
    cfg, df_train, _ = dataset
    for use_native in (False, True):
        if use_native:
            from multimodal_isic_tpu.data import native_io
            if not native_io.available():
                continue
        records = DermRecords(df_train, staging_hw=(90, 90),
                              use_native=use_native, cache_decoded=True)
        plain = DermRecords(df_train, staging_hw=(90, 90),
                            use_native=use_native)
        loader = DeviceLoader(records, batch_size=8)
        e1 = [{k: np.asarray(v) for k, v in b.items()} for b in loader]
        assert len(records._cache) == len(df_train)
        # poison the paths: epoch 2 must never decode
        records.df = records.df.assign(
            image_path="/nonexistent.jpg", segmentation_path="/nonexistent.png")
        e2 = [{k: np.asarray(v) for k, v in b.items()} for b in loader]
        ref = [{k: np.asarray(v) for k, v in b.items()}
               for b in DeviceLoader(plain, batch_size=8)]
        for b1, b2, br in zip(e1, e2, ref):
            for k in ("image", "mask", "target"):
                np.testing.assert_array_equal(b1[k], b2[k])
                np.testing.assert_array_equal(b1[k], br[k])


def test_device_dataset_matches_streaming_loader(dataset):
    """HBM-resident DeviceDataset epochs reproduce the streaming
    DeviceLoader's batches exactly (same order, same deterministic
    transform) — the contract behind `device_cache: true` and the r5
    disk-train mitigation."""
    from multimodal_isic_tpu.data import DeviceDataset

    cfg, df_train, _ = dataset
    records = DermRecords(df_train, staging_hw=(90, 90))
    order = np.arange(len(df_train))[::-1].copy()
    stream = list(DeviceLoader(records, 8, order=order,
                               transform=augment.POLICIES["mae_eval"]))
    dset = DeviceDataset(records, upload_batch=6)
    resident = list(dset.loader(8, order=order,
                                transform=augment.POLICIES["mae_eval"]))
    assert len(stream) == len(resident)
    for b1, b2 in zip(stream, resident):
        assert set(b1) == set(b2)
        for k in b1:
            np.testing.assert_allclose(np.asarray(b1[k]), np.asarray(b2[k]),
                                       rtol=1e-6, atol=1e-6)


def test_device_loader_propagates_worker_errors(dataset):
    cfg, df_train, _ = dataset
    df_bad = df_train.copy()
    df_bad.loc[0, "image_path"] = "/nonexistent.jpg"
    records = DermRecords(df_bad, staging_hw=(90, 90))
    loader = DeviceLoader(records, batch_size=4)
    with pytest.raises(FileNotFoundError):
        list(loader)
