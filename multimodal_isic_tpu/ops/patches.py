"""Patchify / unpatchify and patch↔mask overlap ops.

Implements the MAE patch-pixel convention the reference relies on
(``save_latent.py:80-86`` unfold math, ``utils.py:106-110`` patchify usage):
images are NHWC here (TPU-native layout), but each flattened patch keeps the
(p, p, c) ordering of the torch implementation so reconstructions and losses
are directly comparable.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def patchify(imgs: jnp.ndarray, patch: int = 16) -> jnp.ndarray:
    """[B, H, W, C] → [B, (H/p)*(W/p), p*p*C]."""
    b, h, w, c = imgs.shape
    gh, gw = h // patch, w // patch
    x = imgs.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, gh, gw, p, p, c
    return x.reshape(b, gh * gw, patch * patch * c)


def unpatchify(x: jnp.ndarray, patch: int = 16, channels: int = 3) -> jnp.ndarray:
    """[B, N, p*p*C] → [B, H, W, C] (square grid)."""
    b, n, _ = x.shape
    g = int(round(n ** 0.5))
    x = x.reshape(b, g, g, patch, patch, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, g * patch, g * patch, channels)


def patch_overlap_mask(mask: jnp.ndarray, patch: int = 16) -> jnp.ndarray:
    """[B, H, W] binary lesion mask → [B, (H/p)*(W/p)] bool: does each patch
    overlap the lesion (any nonzero pixel)?  Matches the reference's
    unfold-sum>0 computation (``save_latent.py:80-86``)."""
    b, h, w = mask.shape
    gh, gw = h // patch, w // patch
    tiles = mask.reshape(b, gh, patch, gw, patch)
    sums = tiles.sum(axis=(2, 4))
    return (sums > 0).reshape(b, gh * gw)
