"""CLI: latent cluster analysis (reference ``cluster_latents.py``).

    python -m multimodal_isic_tpu.cli.cluster_latents --config_path config.yml \
        [--patch_df dataframes_latents/patch_level_latents_train_df.pkl] [--k 20]

On-device PCA + k-means replaces cuML UMAP+HDBSCAN as the clustering backbone
(BASELINE.json); the purity/weighting/filter statistics match the reference.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np
import pandas as pd

from ..analysis import cluster as C
from ..analysis import kmeans as KM
from ..analysis import pca as P
from ..analysis.bags import patient_id_from_path
from .common import parse_config


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--patch_df", type=str,
                        default="dataframes_latents/patch_level_latents_train_df.pkl")
    parser.add_argument("--k", type=int, default=20)
    parser.add_argument("--out", type=str, default="df_filtered.pkl")
    args, rest = parser.parse_known_args(argv)
    config = parse_config(rest)

    df = pd.read_pickle(args.patch_df)
    x = np.stack([np.asarray(v, np.float32) for v in df["patch_latent_pca"]])
    y = df["target"].values.astype(int)
    num_classes = int(config.get("num_classes", 7))

    state, emb20 = None, x
    if x.shape[1] > 20:  # reduce like the reference's 20-component embedding
        state = P.fit(x, 20)
        emb20 = np.asarray(P.transform(state, x))

    km_state, clusters = KM.fit_best_of(
        jax.random.PRNGKey(config["seed"]), emb20, k=args.k)
    clusters = np.asarray(clusters)
    print(f"Number of clusters found: {len(np.unique(clusters))}")

    patient_targets = (df.assign(pid=df["image_path"].map(patient_id_from_path))
                       .groupby("pid")["target"].agg(lambda s: s.mode()[0]).values)
    weights = C.patient_class_weights(patient_targets, num_classes)
    stats = C.cluster_purity_stats(clusters, y, num_classes, class_weights=weights)

    df = df.copy()
    df["cluster"] = clusters
    for key in ("cluster_same_count", "cluster_other_count", "cluster_prop_same",
                "cluster_ratio_same_other", "cluster_prop_same_weighted"):
        df[key] = stats[key]
    for c in range(num_classes):
        df[f"cluster_count_class_{c}"] = stats["counts_per_class"][:, c]

    keep, threshold = C.filter_low_purity_clusters(stats, percentile=10)
    print(f"10th percentile of cluster_prop_same_weighted: {threshold:.4f}")
    df_filtered = df[keep].reset_index(drop=True)
    print(f"Number of patches in training set: {len(df_filtered)} "
          f"after removing low-purity clusters")
    for c in sorted(df_filtered["target"].unique()):
        print(f"  Class {c}: {(df_filtered['target'] == c).sum()} patches")
    df_filtered.to_pickle(args.out)


if __name__ == "__main__":
    main()
