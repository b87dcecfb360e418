"""CLI workloads end-to-end on synthetic data (CPU mesh): prepare_df →
extract_radiomics → reduce_dim → fusion main → save_latent → cluster_latents
→ tune_mil → use_latent → fetch_experiments."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

from multimodal_isic_tpu.data import make_synthetic_isic


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ws")
    dirs = make_synthetic_isic(str(root / "data"), n_train=22, n_test=8,
                               image_hw=(64, 80), seed=5)
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
                "patience": 3, "epochs": 2, "fold": 1, "batch_size": 8,
                "norm_pix_loss": False, "masking_ratio": 0.75,
                "eval_masking_ratio": 0.5, "include_lesion_mask": False,
            },
        },
        "best_params": {"hidden_dim": 32, "att_dim": 16, "dropout": 0.2,
                        "optimizer": "adam", "lr": 1e-3},
    }
    cfg_path = root / "config.yml"
    cfg_path.write_text(yaml.safe_dump(config))
    return root, str(cfg_path), dirs


def test_prepare_df_cli(workspace):
    from multimodal_isic_tpu.cli import prepare_df
    root, cfg, dirs = workspace
    prepare_df.main(["--config_path", cfg])
    df = pd.read_pickle(dirs["df"])
    assert df.columns[0] == "image_path"
    assert len(pd.read_pickle(dirs["df_test"])) == 8


def test_fusion_main_cli(workspace):
    from multimodal_isic_tpu.cli import main as fusion_main
    root, cfg, dirs = workspace
    # radiomics pickles absent -> zeros placeholder path (reference parity)
    fusion_main.main(["--config_path", cfg])
    runs = os.listdir(root / "runs")
    assert runs, "run logged"
    assert os.listdir(root / "models"), "best model persisted"


def test_mil_cli_chain(workspace, rng):
    """tune_mil + use_latent over a synthetic patch-level frame."""
    from multimodal_isic_tpu.cli import tune_mil, use_latent
    root, cfg, dirs = workspace
    rows = []
    for img in range(12):
        label = img % 3
        for pid in range(6):
            lat = rng.randn(8).astype(np.float32)
            lat[label] += 2.0
            rows.append({"image_path": f"SYN_{img:07d}_x.jpg",
                         "segmentation_path": "s", "target": label,
                         "patch_id": pid, "patch_latent": lat,
                         "patch_in_mask": 1, "patch_latent_pca": lat})
    patch_df_path = str(root / "patches.pkl")
    pd.DataFrame(rows).to_pickle(patch_df_path)

    tune_mil.main(["--config_path", cfg, "--model_type", "mil",
                   "--num_samples", "2", "--max_epochs", "2",
                   "--patience", "2", "--grace_period", "1",
                   "--patch_df", patch_df_path,
                   "--output_dir", str(root / "hpo")])
    assert any(f.startswith("best_config_") for f in os.listdir(root / "hpo"))

    use_latent.main(["--config_path", cfg, "--model_type", "mil",
                     "--patch_df", patch_df_path, "--n_folds", "2",
                     "--max_epochs", "2", "--patience", "2",
                     "--csv", str(root / "cv.csv")])
    assert len(pd.read_csv(root / "cv.csv")) == 2


def test_cluster_latents_cli(workspace, rng):
    from multimodal_isic_tpu.cli import cluster_latents
    root, cfg, dirs = workspace
    rows = []
    for img in range(10):
        label = img % 2
        for pid in range(5):
            lat = rng.randn(6).astype(np.float32) + label * 3.0
            rows.append({"image_path": f"SYN_{img:07d}_x.jpg",
                         "segmentation_path": "s", "target": label,
                         "patch_id": pid, "patch_latent": lat,
                         "patch_in_mask": 1, "patch_latent_pca": lat})
    path = str(root / "patches_cluster.pkl")
    pd.DataFrame(rows).to_pickle(path)
    out = str(root / "df_filtered.pkl")
    cluster_latents.main(["--config_path", cfg, "--patch_df", path,
                          "--k", "4", "--out", out])
    filtered = pd.read_pickle(out)
    assert "cluster_prop_same_weighted" in filtered.columns
    assert len(filtered) > 0


def test_fetch_experiments_cli(workspace, capsys):
    from multimodal_isic_tpu.cli import fetch_experiments
    root, cfg, dirs = workspace
    fetch_experiments.main(["--log_dir", str(root / "runs"),
                            "--metric", "test/accuracy"])
    out = capsys.readouterr().out
    assert "runs" in out


def test_train_ae_cli_tiny(workspace):
    """MAE workload end-to-end with the tiny model (incl. viz artifacts)."""
    import yaml
    from multimodal_isic_tpu.cli import prepare_df, train_ae
    root, cfg, dirs = workspace
    if not os.path.exists(dirs["df"]):  # order-independent of the ETL test
        prepare_df.main(["--config_path", cfg])
    config = yaml.safe_load(open(cfg))
    config["training_plan"]["parameters"].update(
        {"epochs": 1, "batch_size": 8, "model_size": "tiny",
         "masking_ratio": 0.75, "eval_masking_ratio": 0.5})
    cfg_tiny = str(root / "config_tiny.yml")
    open(cfg_tiny, "w").write(yaml.safe_dump(config))
    train_ae.main(["--config_path", cfg_tiny])
    # best model + resumable checkpoint persisted
    model_dirs = os.listdir(root / "models")
    assert any(len(d) == 32 for d in model_dirs)  # uuid4 hex dir
    assert "mae_ckpt" in model_dirs
    # viz artifacts written by the epoch hook
    runs = sorted((root / "runs").iterdir())
    arts = list((runs[-1] / "artifacts").iterdir())
    names = {a.name for a in arts}
    assert any(n.startswith("latent_scatter") for n in names)
    assert any(n.startswith("image_comparison") for n in names)


def test_save_latent_cli_tiny(workspace, monkeypatch, tmp_path):
    """save_latent end-to-end: tiny encoder checkpoint -> 6 pickled frames,
    partial (strict=False) restore from the train_ae full-model checkpoint."""
    import yaml
    from multimodal_isic_tpu.cli import prepare_df, save_latent
    root, cfg, dirs = workspace
    if not os.path.exists(dirs["df"]):
        prepare_df.main(["--config_path", cfg])
    config = yaml.safe_load(open(cfg))
    config["training_plan"]["parameters"]["model_size"] = "tiny"
    cfg_tiny = str(root / "config_tiny_sl.yml")
    open(cfg_tiny, "w").write(yaml.safe_dump(config))

    # a full-model tiny checkpoint to restore encoder-only from
    import jax
    from multimodal_isic_tpu.core import checkpoint as ckpt
    from multimodal_isic_tpu.models.convmae import ConvMAE
    from multimodal_isic_tpu.train.mae import init_mae
    full = ConvMAE(embed_dims=(32, 48, 64), depths=(1, 1, 2), num_heads=4,
                   decoder_dim=32, decoder_depth=1, decoder_heads=4)
    params = init_mae(full, jax.random.PRNGKey(3))
    ckpt_dir = str(tmp_path / "ae_ckpt")
    ckpt.save_checkpoint(ckpt_dir, params)

    monkeypatch.chdir(tmp_path)
    save_latent.main(["--config_path", cfg_tiny, "--model_name", ckpt_dir])
    out = tmp_path / "dataframes_latents"
    names = sorted(p.name for p in out.iterdir())
    assert "patch_level_latents_train_df.pkl" in names
    assert len(names) == 6
    frame = pd.read_pickle(out / "patch_level_latents_train_df.pkl")
    assert {"patch_id", "patch_latent", "patch_in_mask",
            "patch_latent_pca"} <= set(frame.columns)
