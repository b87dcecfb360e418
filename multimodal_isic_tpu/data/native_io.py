"""ctypes binding for the native IO worker (native/isic_io.cc).

The C++ path fuses JPEG/PNG decode, the reference's centroid-crop math and
the staging resize into one native call (optionally threaded), replacing the
per-sample Python cv2 pipeline.  Falls back transparently when the shared
library hasn't been built — build it with ``make -C native`` (g++, libjpeg,
libpng; all baked into this image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libisic_io.so")


def _load(build_if_missing: bool = True):
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH) and build_if_missing:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.isic_decode_crop.restype = ctypes.c_int
    lib.isic_decode_crop.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
    lib.isic_decode_crop_batch.restype = ctypes.c_int
    lib.isic_decode_crop_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int]
    # full-frame (no centroid crop) variants for the radiomics path
    lib.isic_decode_full.restype = ctypes.c_int
    lib.isic_decode_full.argtypes = lib.isic_decode_crop.argtypes
    lib.isic_decode_full_batch.restype = ctypes.c_int
    lib.isic_decode_full_batch.argtypes = lib.isic_decode_crop_batch.argtypes
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_crop(image_path: str, mask_path: Optional[str],
                staging_hw: Tuple[int, int]) -> Tuple[np.ndarray, np.ndarray]:
    """→ (image [H, W, 3] uint8 RGB, mask [H, W] uint8); raises on failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    h, w = staging_hw
    image = np.empty((h, w, 3), np.uint8)
    mask = np.empty((h, w), np.uint8)
    rc = lib.isic_decode_crop(
        image_path.encode(), (mask_path or "").encode(), h, w,
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise FileNotFoundError(f"native decode failed ({rc}): {image_path}")
    return image, mask


def _batch(fn_name: str, image_paths, mask_paths, staging_hw, n_threads):
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    n = len(image_paths)
    h, w = staging_hw
    images = np.empty((n, h, w, 3), np.uint8)
    masks = np.empty((n, h, w), np.uint8)
    img_arr = (ctypes.c_char_p * n)(*[p.encode() for p in image_paths])
    mask_arr = (ctypes.c_char_p * n)(
        *[(m or "").encode() for m in (mask_paths or [""] * n)])
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    rc = getattr(lib, fn_name)(
        img_arr, mask_arr, n, h, w,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    if rc != 0:
        raise FileNotFoundError(
            f"native batch decode: {-rc} samples failed (missing/corrupt files)")
    return images, masks


def decode_crop_batch(image_paths: Sequence[str],
                      mask_paths: Optional[Sequence[Optional[str]]],
                      staging_hw: Tuple[int, int],
                      n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded batch decode + centroid crop → (images [N, H, W, 3],
    masks [N, H, W])."""
    return _batch("isic_decode_crop_batch", image_paths, mask_paths,
                  staging_hw, n_threads)


def decode_full_batch(image_paths: Sequence[str],
                      mask_paths: Optional[Sequence[Optional[str]]],
                      staging_hw: Tuple[int, int],
                      n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded batch decode WITHOUT the centroid crop (full frame resized to
    staging) — the radiomics extraction path operates on the uncropped image
    (``RadiomicExtractor.py:29-35``)."""
    return _batch("isic_decode_full_batch", image_paths, mask_paths,
                  staging_hw, n_threads)
