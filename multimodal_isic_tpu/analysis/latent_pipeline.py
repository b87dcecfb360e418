"""Latent extraction pipeline (the ``save_latent.py`` workload, TPU-first).

The reference runs encoder-only ConvMAE over bs=1000 loaders, then explodes
per-patch rows in a pure-python double loop into pandas object columns
(``save_latent.py:107-150`` — the CPU hot spot called out in SURVEY.md §3.3).
Here latents stay dense device arrays end-to-end: [N, 196, 768] patch latents,
pooled max/mean, patch↔lesion-mask overlap bools, and the optional on-device
PCA(0.90) — with a thin conversion layer that can still materialize the
reference's six DataFrames for API parity.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..models.convmae import ConvMAE
from ..ops.patches import patch_overlap_mask
from ..train.mae import make_encoder_step
from . import pca as PCA


class LatentBundle(NamedTuple):
    """Dense per-image latents for one split."""
    latents: np.ndarray        # [N, P, D]
    pooled_max: np.ndarray     # [N, D]
    pooled_mean: np.ndarray    # [N, D]
    ids_restore: np.ndarray    # [N, P]
    lesion_overlap: np.ndarray  # [N, P] bool
    targets: np.ndarray        # [N]
    image_paths: list
    segmentation_paths: list


def extract_latent_bundle(model: ConvMAE, params, loader,
                          paths_from=None) -> LatentBundle:
    """Run the mask_ratio=0 encoder over a loader of device batches.

    ``loader`` yields dicts with 'image' [B, 224, 224, 3] (normalized) and
    'mask' [B, 224, 224]; 'target'.  ``paths_from`` optionally supplies
    (image_paths, segmentation_paths) aligned with iteration order.
    """
    step = make_encoder_step(model)

    @jax.jit
    def pool_and_overlap(latent, mask):
        return (latent.max(axis=1), latent.mean(axis=1),
                patch_overlap_mask(mask, patch=16))

    lat, pmax, pmean, ids, overlap, targets = [], [], [], [], [], []
    for batch in loader:
        latent, ids_restore = step(params, batch["image"])
        mx, mn, ov = pool_and_overlap(latent, batch["mask"])
        # latents land as the model's compute dtype (bf16 under the default
        # mixed-precision config); downstream frames/statistics stay f32
        lat.append(np.asarray(latent, dtype=np.float32))
        pmax.append(np.asarray(mx, dtype=np.float32))
        pmean.append(np.asarray(mn, dtype=np.float32))
        ids.append(np.asarray(ids_restore))
        overlap.append(np.asarray(ov))
        targets.append(np.asarray(batch["target"]))

    image_paths, seg_paths = (paths_from if paths_from is not None
                              else ([None] * sum(len(t) for t in targets),) * 2)
    return LatentBundle(
        np.concatenate(lat), np.concatenate(pmax), np.concatenate(pmean),
        np.concatenate(ids), np.concatenate(overlap), np.concatenate(targets),
        list(image_paths), list(seg_paths))


def patch_table(bundle: LatentBundle, remove_background: bool = False
                ) -> Dict[str, np.ndarray]:
    """Dense patch-level view: flattens [N, P, D] to [N·P, D] with aligned
    patch ids / in-mask flags / targets, optionally dropping background
    patches — no pandas explosion.

    With mask_ratio=0 the encoder emits patches in grid order, so the overlap
    flag for row (n, p) is ``lesion_overlap[n, ids_restore[n, p]]`` — the same
    lookup the reference does per row (``save_latent.py:121-127``).
    """
    n, p, d = bundle.latents.shape
    patch_ids = bundle.ids_restore.reshape(-1)
    image_idx = np.repeat(np.arange(n), p)
    in_mask = bundle.lesion_overlap[image_idx, patch_ids].astype(np.int32)
    table = {
        "image_idx": image_idx,
        "patch_id": patch_ids,
        "patch_latent": bundle.latents.reshape(n * p, d),
        "patch_in_mask": in_mask,
        "target": np.repeat(bundle.targets, p),
    }
    if remove_background:
        keep = in_mask.astype(bool)
        table = {k: v[keep] for k, v in table.items()}
    return table


def apply_pca(train_table: Dict, test_table: Dict,
              variance: float = 0.90) -> Tuple[Dict, Dict, Optional[PCA.PCAState]]:
    """PCA(variance) fit on train patches, transform both — or pass-through
    copies when disabled upstream (``save_latent.py:159-181``)."""
    state = PCA.fit(train_table["patch_latent"], variance)
    train_table = dict(train_table)
    test_table = dict(test_table)
    train_table["patch_latent_pca"] = np.asarray(
        PCA.transform(state, train_table["patch_latent"]))
    test_table["patch_latent_pca"] = np.asarray(
        PCA.transform(state, test_table["patch_latent"]))
    return train_table, test_table, state


# ------------------------------------------------- reference-API DataFrames

def bundle_to_frames(bundle: LatentBundle) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """(pooled_df, raw_df) with the reference's column contract
    (``save_latent.py:65-96``)."""
    pooled = pd.DataFrame({
        "image_path": bundle.image_paths,
        "segmentation_path": bundle.segmentation_paths,
        "target": bundle.targets,
        "latent_pooled_max": list(bundle.pooled_max),
        "latent_pooled_mean": list(bundle.pooled_mean),
        "ids_restore": list(bundle.ids_restore),
    })
    g = int(round(bundle.lesion_overlap.shape[1] ** 0.5))
    raw = pd.DataFrame({
        "image_path": bundle.image_paths,
        "segmentation_path": bundle.segmentation_paths,
        "target": bundle.targets,
        "latent": list(bundle.latents),
        "ids_restore": list(bundle.ids_restore),
        "lesion_mask_patches": list(bundle.lesion_overlap.reshape(-1, g, g)),
    })
    return pooled, raw


def table_to_frame(table: Dict, bundle: LatentBundle) -> pd.DataFrame:
    """Patch-level DataFrame with the reference's columns
    (``save_latent.py:129-149``)."""
    idx = table["image_idx"]
    frame = pd.DataFrame({
        "image_path": [bundle.image_paths[i] for i in idx],
        "segmentation_path": [bundle.segmentation_paths[i] for i in idx],
        "target": table["target"],
        "patch_id": table["patch_id"],
        "patch_latent": list(table["patch_latent"]),
        "patch_in_mask": table["patch_in_mask"],
    })
    if "patch_latent_pca" in table:
        frame["patch_latent_pca"] = list(table["patch_latent_pca"])
    else:
        frame["patch_latent_pca"] = frame["patch_latent"]
    return frame


def extract_latents(model: ConvMAE, params, train_loader, test_loader,
                    train_paths=None, test_paths=None,
                    remove_background: bool = False,
                    pca_enabled: bool = False):
    """The full ``extract_latents`` contract (``save_latent.py:13-200``):
    → (patch_level_train_df, patch_level_test_df, latent_pooled_train,
       latent_pooled_test, latent_raw_train, latent_raw_test)."""
    train_bundle = extract_latent_bundle(model, params, train_loader, train_paths)
    test_bundle = extract_latent_bundle(model, params, test_loader, test_paths)

    train_table = patch_table(train_bundle, remove_background)
    test_table = patch_table(test_bundle, remove_background)
    print(f"Total lesion-overlapping patches (train_val): "
          f"{int(train_table['patch_in_mask'].sum())}")
    print(f"Total lesion-overlapping patches (test): "
          f"{int(test_table['patch_in_mask'].sum())}")
    if pca_enabled:
        train_table, test_table, state = apply_pca(train_table, test_table)
        print(f"PCA reduced dimensions from {train_bundle.latents.shape[-1]} "
              f"to {state.components.shape[0]}")
    else:
        print("PCA disabled via config; using raw patch_latent as patch_latent_pca.")

    pooled_train, raw_train = bundle_to_frames(train_bundle)
    pooled_test, raw_test = bundle_to_frames(test_bundle)
    return (table_to_frame(train_table, train_bundle),
            table_to_frame(test_table, test_bundle),
            pooled_train, pooled_test, raw_train, raw_test)
