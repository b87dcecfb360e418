"""Patient-bag construction from patch-level latents.

Reproduces the reference's grouping (``tune_mil.py:66-120``,
``use_latent.py:172-233``): patient id parsed from the image basename's
second underscore field, per-patient patches sorted by ``patch_id``, bag
label = the modal target.
"""

from __future__ import annotations

import os
from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd


def patient_id_from_path(image_path: str) -> str:
    """``basename.split('_')[1]`` (tune_mil.py:66-71); falls back to the stem
    when the name has no underscore field."""
    base = os.path.basename(str(image_path)).split(".")[0]
    parts = base.split("_")
    return parts[1] if len(parts) > 1 else base


def build_patient_bags(patch_df: pd.DataFrame,
                       latent_col: str = "patch_latent_pca"
                       ) -> Tuple[List[np.ndarray], List[int], List[str]]:
    """patch-level DataFrame → (bags [N_i, D], modal labels, patient ids).

    Patches within a bag are sorted by ``patch_id`` (the reference's
    ``_sort_group_patches``); patients in SORTED id order — the reference's
    default ``groupby('patient_id')`` sorts keys (tune_mil.py:105-120,
    use_latent.py:172-233), and bag order feeds the stratified splitters, so
    this ordering is what makes CV fold membership reproduce the reference.
    """
    df = patch_df.copy()
    df["patient_id"] = df["image_path"].map(patient_id_from_path)

    bags, labels, patients = [], [], []
    for pid, group in df.groupby("patient_id", sort=True):
        group = group.sort_values("patch_id", kind="stable")
        feats = np.stack([np.asarray(v, np.float32) for v in group[latent_col]])
        target = int(Counter(group["target"].astype(int)).most_common(1)[0][0])
        bags.append(feats)
        labels.append(target)
        patients.append(pid)
    return bags, labels, patients


def bags_from_table(table: Dict[str, np.ndarray], image_paths: Sequence[str],
                    latent_col: str = "patch_latent_pca"
                    ) -> Tuple[List[np.ndarray], List[int], List[str]]:
    """Dense-table variant (analysis.latent_pipeline.patch_table output):
    groups by patient id derived from each patch's image path, patients in
    sorted id order (matching pandas' default sorting ``groupby`` and
    :func:`build_patient_bags`)."""
    feats = table.get(latent_col, table["patch_latent"])
    pids = np.array([patient_id_from_path(image_paths[i])
                     for i in table["image_idx"]])
    bags, labels, patients = [], [], []
    for pid in np.unique(pids):
        sel = np.where(pids == pid)[0]
        sel = sel[np.argsort(table["patch_id"][sel], kind="stable")]
        bags.append(np.asarray(feats[sel], np.float32))
        labels.append(int(Counter(table["target"][sel].tolist()).most_common(1)[0][0]))
        patients.append(pid)
    return bags, labels, patients
