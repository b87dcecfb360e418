"""CLI: MIL cross-validation evaluation (reference ``use_latent.py``).

    python -m multimodal_isic_tpu.cli.use_latent --config_path config.yml \
        [--model_type mil|graph-mil] [--patch_df <pkl>] [--csv results.csv]

Uses ``config['best_params']`` / ``config['best_params_graph-mil']`` as the
model configuration (the reference's HPO-record consumption,
``use_latent.py:283,303``).
"""

from __future__ import annotations

import argparse

import pandas as pd

from ..analysis.bags import build_patient_bags
from ..train.cv import cross_validate_mil
from ..utils.logging import RunLogger
from .common import parse_config


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_type", choices=["mil", "graph-mil"], default="mil")
    parser.add_argument("--patch_df", type=str,
                        default="dataframes_latents/patch_level_latents_train_df.pkl")
    parser.add_argument("--csv", type=str, default="cv_results.csv")
    parser.add_argument("--n_folds", type=int, default=5)
    parser.add_argument("--max_epochs", type=int, default=200)
    parser.add_argument("--patience", type=int, default=16)
    args, rest = parser.parse_known_args(argv)
    config = parse_config(rest)

    patch_df = pd.read_pickle(args.patch_df)
    bags, labels, patients = build_patient_bags(patch_df)
    print(f"{len(bags)} patient bags")

    best_key = ("best_params_graph-mil" if args.model_type == "graph-mil"
                else "best_params")
    model_config = dict(config.get(best_key, {}) or {})

    logger = RunLogger(config.get("log_dir", "runs"), config=config.to_dict())
    out = cross_validate_mil(
        bags, labels, model_kind=args.model_type, config=model_config,
        n_folds=args.n_folds, seed=config["seed"],
        num_classes=int(config.get("num_classes", 7)),
        max_epochs=args.max_epochs, patience=args.patience,
        csv_path=args.csv, logger=logger)
    for metric, (mean, std) in sorted(out["summary"].items()):
        print(f"{metric}: {mean:.4f} ± {std:.4f}")


if __name__ == "__main__":
    main()
