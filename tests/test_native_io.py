"""Native C++ IO worker ≡ the Python cv2 path, plus throughput sanity."""

import time

import numpy as np
import pytest

from multimodal_isic_tpu.data import DermRecords, make_synthetic_isic
from multimodal_isic_tpu.data import native_io
from multimodal_isic_tpu.core.config import config_from_dict
from multimodal_isic_tpu.data.manifest import prepare_manifests

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native library not built")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    dirs = make_synthetic_isic(str(root), n_train=10, n_test=4,
                               image_hw=(96, 128), seed=7)
    cfg = config_from_dict({"dir": dirs})
    df_train, _ = prepare_manifests(cfg)
    return df_train


def test_native_matches_python_path(dataset):
    py_records = DermRecords(dataset, staging_hw=(96, 96), use_native=False)
    nat_records = DermRecords(dataset, staging_hw=(96, 96), use_native=True)
    for i in range(len(dataset)):
        img_py, mask_py = py_records.read_image_mask(i)
        img_nat, mask_nat = nat_records.read_image_mask(i)
        # same JPEG bitstream through libjpeg vs libjpeg-turbo: pixel-near
        assert np.mean(np.abs(img_py.astype(int) - img_nat.astype(int))) < 1.0
        assert np.abs(img_py.astype(int) - img_nat.astype(int)).max() <= 16
        np.testing.assert_array_equal(mask_py > 0, mask_nat > 0)


def test_native_staging_resize(dataset):
    records = DermRecords(dataset, staging_hw=(64, 64), use_native=True)
    img, mask = records.read_image_mask(0)
    assert img.shape == (64, 64, 3)
    assert mask.shape == (64, 64)


def test_native_no_mask_path(dataset, tmp_path):
    df = dataset.copy()
    df.loc[:, "segmentation_path"] = "no_mask"
    records = DermRecords(df, staging_hw=(96, 96), use_native=True)
    img, mask = records.read_image_mask(0)
    assert mask.sum() == 0  # empty mask -> center crop, zero mask


def test_native_missing_image_errors(dataset):
    df = dataset.copy()
    df.loc[0, "image_path"] = "/nonexistent.jpg"
    records = DermRecords(df, staging_hw=(96, 96), use_native=True)
    with pytest.raises(FileNotFoundError):
        records.read_image_mask(0)


def test_native_batch_api(dataset):
    images, masks = native_io.decode_crop_batch(
        dataset["image_path"].tolist(),
        dataset["segmentation_path"].tolist(), (96, 96), n_threads=2)
    assert images.shape == (len(dataset), 96, 96, 3)
    single, _ = native_io.decode_crop(dataset["image_path"].iloc[3],
                                      dataset["segmentation_path"].iloc[3],
                                      (96, 96))
    np.testing.assert_array_equal(images[3], single)


def test_native_is_not_slower(dataset):
    py_records = DermRecords(dataset, staging_hw=(96, 96), use_native=False)
    nat_records = DermRecords(dataset, staging_hw=(96, 96), use_native=True)

    def run(records):
        t0 = time.perf_counter()
        for _ in range(3):
            for i in range(len(dataset)):
                records.read_image_mask(i)
        return time.perf_counter() - t0

    t_py = run(py_records)
    t_nat = run(nat_records)
    assert t_nat < t_py * 2.0  # parity guard (the win comes from threading)
