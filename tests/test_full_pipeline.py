"""ONE end-to-end chain of all five workloads on synthetic data (SURVEY §3
call stacks; the closest this TPU-less test environment gets to BASELINE.md's
AUC-parity claim): prepare_df → extract_radiomics → reduce_dim → train_ae
(tiny) → save_latent → tune_mil (packed, few trials) → use_latent sweep →
fusion main — asserting the learned fusion and MIL models beat chance on
held-out synthetic data whose lesion color/texture carries the class signal.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest
import yaml

from multimodal_isic_tpu.data import make_synthetic_isic


@pytest.mark.slow
def test_five_workload_chain_beats_chance(tmp_path, monkeypatch):
    root = tmp_path
    dirs = make_synthetic_isic(str(root / "data"), n_train=72, n_test=21,
                               image_hw=(64, 80), seed=11)
    config = {
        "neptune": False,
        "seed": 42,
        "device": "tpu",
        "dir": dirs,
        "model_path": str(root / "models"),
        "log_dir": str(root / "runs"),
        "pca": False,
        "num_classes": 7,
        "training_plan": {
            "modality": ["radiomics", "clinical", "artifacts"],
            "fusion": "concat",
            "fusion_level": "intermediate",
            "parameters": {
                "patience": 4, "epochs": 6, "fold": 1, "batch_size": 8,
                "model_size": "tiny", "norm_pix_loss": False,
                "masking_ratio": 0.75, "eval_masking_ratio": 0.5,
                "include_lesion_mask": False,
            },
        },
        "best_params": {"hidden_dim": 32, "att_dim": 16, "dropout": 0.1,
                        "optimizer": "adam", "lr": 1e-3},
    }
    cfg = str(root / "config.yml")
    open(cfg, "w").write(yaml.safe_dump(config))
    monkeypatch.chdir(root)

    # ---- L1 ETL: manifests → radiomics → reduction ------------------------
    from multimodal_isic_tpu.cli import (
        extract_radiomics, main as fusion_main, prepare_df, reduce_dim,
        save_latent, train_ae, tune_mil, use_latent)

    prepare_df.main(["--config_path", cfg])
    assert os.path.exists(dirs["df"]) and os.path.exists(dirs["df_test"])

    extract_radiomics.main(["--config_path", cfg])
    rad = pd.read_pickle(dirs["radiomics"])
    assert len(rad) == 72 and rad.shape[1] > 1000  # 4 channels × ~1.1k feats

    reduce_dim.main(["--config_path", cfg])
    red = pd.read_pickle(dirs["radiomics_red"])
    assert list(pd.read_pickle(dirs["radiomics_test_red"]).columns) == \
        list(red.columns)

    # ---- MAE pretraining (tiny) + latent extraction -----------------------
    train_ae.main(["--config_path", cfg])
    model_dirs = [d for d in os.listdir(root / "models") if len(d) == 32]
    assert model_dirs, "train_ae saved no best model"

    save_latent.main(["--config_path", cfg, "--model_name",
                      str(root / "models" / model_dirs[0])])
    patch_df = str(root / "dataframes_latents" /
                   "patch_level_latents_train_df.pkl")
    patch_test_df = str(root / "dataframes_latents" /
                        "patch_level_latents_test_df.pkl")
    assert os.path.exists(patch_df) and os.path.exists(patch_test_df)

    # ---- MIL HPO (packed + ASHA) over the extracted latents ---------------
    tune_mil.main(["--config_path", cfg, "--model_type", "mil",
                   "--num_samples", "4", "--cohort_size", "4",
                   "--max_epochs", "4", "--patience", "4",
                   "--grace_period", "2",
                   "--patch_df", patch_df, "--test_patch_df", patch_test_df,
                   "--output_dir", str(root / "hpo")])
    hpo_csv = [f for f in os.listdir(root / "hpo")
               if f.startswith("hpo_results_")]
    hpo = pd.read_csv(root / "hpo" / hpo_csv[0])
    assert len(hpo) == 4

    # ---- MIL CV harness on the same latents -------------------------------
    # 40 bs=1 epochs on ~28 train bags: the one jitted epoch-scan makes extra
    # epochs nearly free (compile dominates; 2 folds x 40 epochs ~ 13 s CPU)
    use_latent.main(["--config_path", cfg, "--model_type", "mil",
                     "--patch_df", patch_df,
                     "--n_folds", "2", "--max_epochs", "40", "--patience", "40",
                     "--csv", str(root / "cv.csv")])
    cv = pd.read_csv(root / "cv.csv")
    assert "test_auc_best_bacc" in cv.columns, list(cv.columns)
    mil_auc = float(np.nanmean(cv["test_auc_best_bacc"].astype(float)))
    assert mil_auc > 0.6, (
        f"MIL AUC-ovr {mil_auc:.3f} on held-out synthetic data is not above "
        f"chance (0.5); measured 0.887 at this setting")

    # ---- fusion classifier over the REAL reduced radiomics ----------------
    # the reference optimizer is plain SGD(1e-3) (main.py:135): 4 steps/epoch
    # on 64 train samples needs ~400 epochs to converge.  Image-less modality
    # configs stream metadata-only records (no decode/augment), so epochs are
    # ~0.12 s: 400 epochs ≈ 60 s (measured test acc 0.62 / bacc 0.57)
    fusion_config = dict(config)
    fusion_config["training_plan"] = dict(config["training_plan"])
    fusion_config["training_plan"]["parameters"] = {
        **config["training_plan"]["parameters"], "epochs": 400, "patience": 100}
    fusion_cfg = str(root / "config_fusion.yml")
    open(fusion_cfg, "w").write(yaml.safe_dump(fusion_config))
    fusion_main.main(["--config_path", fusion_cfg])
    runs = sorted((root / "runs").iterdir())
    attrs = json.load(open(runs[-1] / "attributes.json"))
    fusion_acc = float(attrs["test/accuracy"])
    fusion_bacc = float(attrs["test/balanced_accuracy"])
    # 7-class chance = 1/7 ≈ 0.143; the synthetic lesion color/texture is
    # class-coded, so the radiomics branch must comfortably beat it
    assert fusion_acc > 0.30, f"fusion accuracy {fusion_acc:.3f} ~ chance"
    assert fusion_bacc > 0.25, f"fusion bacc {fusion_bacc:.3f} ~ chance"
