"""Mask-centroid square cropping.

The reference crops every image to a ``min(H, W)`` square centered on the
lesion-mask centroid, clamped to the image bounds (``dataset.py:58-98``; note
the constructor's ``crop_size=450`` is overridden to ``min(H, W)`` at
``dataset.py:93`` — we reproduce the override as the actual behavior).  A host
numpy version feeds the input pipeline; a fixed-size device version
(``lax.dynamic_slice``) serves fully-on-device paths (e.g. radiomics ROIs).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def centroid_crop_bounds(mask: np.ndarray, crop_size: int) -> Tuple[int, int]:
    """(y1, x1) of the crop window per the reference's clamping rules."""
    h, w = mask.shape[:2]
    ys, xs = np.where(mask > 0)
    if len(xs) == 0 or len(ys) == 0:
        cx, cy = w // 2, h // 2
    else:
        cx = int(np.mean(xs))
        cy = int(np.mean(ys))
    half = crop_size // 2
    x1 = max(cx - half, 0)
    y1 = max(cy - half, 0)
    x1 = min(x1, w - crop_size)
    y1 = min(y1, h - crop_size)
    return y1, x1


def centroid_crop(image: np.ndarray, mask: Optional[np.ndarray],
                  crop_size: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Crop image+mask to a square centered on the mask centroid.

    ``crop_size=None`` applies the reference's ``min(H, W)`` override.  A
    missing mask behaves like an all-zero mask (center crop) — the reference's
    'no_mask' path (``dataset.py:89-90``).
    """
    h, w = image.shape[:2]
    if mask is None:
        mask = np.zeros((h, w), dtype=np.uint8)
    elif mask.shape[:2] != (h, w):
        import cv2
        mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
    if crop_size is None:
        crop_size = min(h, w)
    y1, x1 = centroid_crop_bounds(mask, crop_size)
    return (image[y1:y1 + crop_size, x1:x1 + crop_size],
            mask[y1:y1 + crop_size, x1:x1 + crop_size])


def centroid_crop_device(image: jnp.ndarray, mask: jnp.ndarray,
                         crop_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-size on-device version (jit/vmap-able).

    ``image``: [H, W, C], ``mask``: [H, W].  Same centroid/clamp math as the
    host version but with branch-free jnp ops.
    """
    h, w = mask.shape
    total = jnp.maximum(jnp.sum(mask > 0), 1)
    ys = jnp.sum(jnp.arange(h, dtype=jnp.float32)[:, None] * (mask > 0)) / total
    xs = jnp.sum(jnp.arange(w, dtype=jnp.float32)[None, :] * (mask > 0)) / total
    any_fg = jnp.any(mask > 0)
    cy = jnp.where(any_fg, ys.astype(jnp.int32), h // 2)
    cx = jnp.where(any_fg, xs.astype(jnp.int32), w // 2)

    half = crop_size // 2
    y1 = jnp.clip(cy - half, 0, h - crop_size)
    x1 = jnp.clip(cx - half, 0, w - crop_size)
    img_c = jax.lax.dynamic_slice(
        image, (y1, x1, 0), (crop_size, crop_size, image.shape[2]))
    mask_c = jax.lax.dynamic_slice(mask, (y1, x1), (crop_size, crop_size))
    return img_c, mask_c
