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


def test_fusion_main_cli_device_cache_fused_epoch(workspace, monkeypatch):
    """Image modality + device_cache: the CLI stages crops in HBM and runs
    each epoch as ONE scanned program (make_fusion_train_epoch).  Driven at
    test scale: efficientnet-b0 backbone (config key added r5) and 64×64
    augment policies."""
    from functools import partial

    from multimodal_isic_tpu.cli import main as fusion_main
    from multimodal_isic_tpu.data import augment

    root, cfg, dirs = workspace
    config = yaml.safe_load(open(cfg))
    config["training_plan"]["modality"] = ["image", "clinical"]
    config["training_plan"]["parameters"].update(
        {"device_cache": True, "backbone": "efficientnet-b0", "epochs": 2})
    cfg2 = root / "config_devcache.yml"
    cfg2.write_text(yaml.safe_dump(config))

    small_train = augment._batched(
        partial(augment.fusion_train_transform, out_hw=(64, 64)),
        stochastic=True)
    small_eval = augment._batched(
        partial(augment.fusion_eval_transform, out_hw=(64, 64)),
        stochastic=False)
    monkeypatch.setitem(augment.POLICIES, "fusion_train", small_train)
    monkeypatch.setitem(augment.POLICIES, "fusion_eval", small_eval)
    monkeypatch.setattr(fusion_main, "FUSED_EVAL_HW", (64, 64))

    fusion_main.main(["--config_path", str(cfg2)])
    assert os.listdir(root / "models"), "best model persisted"


def test_fusion_main_cli_fast_augment(workspace, monkeypatch):
    """augment_fast=true routes the train transform through the gather-free
    Pallas warp policy (interpret mode on the CPU mesh) end-to-end."""
    from functools import partial

    from multimodal_isic_tpu.cli import main as fusion_main
    from multimodal_isic_tpu.data import augment

    root, cfg, dirs = workspace
    config = yaml.safe_load(open(cfg))
    config["training_plan"]["modality"] = ["image", "clinical"]
    config["training_plan"]["parameters"].update(
        {"device_cache": True, "augment_fast": True,
         "backbone": "efficientnet-b0", "epochs": 2})
    cfg3 = root / "config_fastaug.yml"
    cfg3.write_text(yaml.safe_dump(config))

    small_fast = augment.make_fusion_train_fast(out_hw=(64, 64))
    small_eval = augment._batched(
        partial(augment.fusion_eval_transform, out_hw=(64, 64)),
        stochastic=False)
    monkeypatch.setitem(augment.POLICIES, "fusion_train_fast", small_fast)
    monkeypatch.setitem(augment.POLICIES, "fusion_eval", small_eval)
    monkeypatch.setattr(fusion_main, "FUSED_EVAL_HW", (64, 64))

    fusion_main.main(["--config_path", str(cfg3)])
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

    # --packed auto routes the classic-MIL space through the vmapped
    # cohort engine with ASHA rungs evaluated inside the packed run
    tune_mil.main(["--config_path", cfg, "--model_type", "mil",
                   "--num_samples", "2", "--max_epochs", "2",
                   "--patience", "2", "--grace_period", "1",
                   "--patch_df", patch_df_path,
                   "--output_dir", str(root / "hpo")])
    assert any(f.startswith("best_config_") for f in os.listdir(root / "hpo"))
    res_csv = [f for f in os.listdir(root / "hpo")
               if f.startswith("hpo_results_")]
    assert res_csv
    res = pd.read_csv(root / "hpo" / res_csv[0])
    assert {"stopped_early", "epochs_run", "val_bacc"} <= set(res.columns)
    assert len(res) == 2

    # the sequential runner remains reachable
    tune_mil.main(["--config_path", cfg, "--model_type", "mil",
                   "--num_samples", "1", "--max_epochs", "2",
                   "--patience", "2", "--grace_period", "1",
                   "--packed", "never",
                   "--patch_df", patch_df_path,
                   "--output_dir", str(root / "hpo_seq")])
    assert any(f.startswith("best_config_")
               for f in os.listdir(root / "hpo_seq"))

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


def test_train_ae_cli_tiny_device_cache(workspace):
    """MAE workload with device_cache: both splits staged in HBM, each
    train/val epoch one scanned program (fused_train/fused_val paths)."""
    import yaml
    from multimodal_isic_tpu.cli import prepare_df, train_ae
    root, cfg, dirs = workspace
    if not os.path.exists(dirs["df"]):
        prepare_df.main(["--config_path", cfg])
    config = yaml.safe_load(open(cfg))
    config["training_plan"]["parameters"].update(
        {"epochs": 2, "batch_size": 8, "model_size": "tiny",
         "masking_ratio": 0.75, "eval_masking_ratio": 0.5,
         "device_cache": True})
    cfg_tiny = str(root / "config_tiny_devcache.yml")
    open(cfg_tiny, "w").write(yaml.safe_dump(config))
    train_ae.main(["--config_path", cfg_tiny])
    runs = sorted((root / "runs").iterdir())
    log = (runs[-1] / "metrics.jsonl")
    assert log.exists() or any(
        len(d) == 32 for d in os.listdir(root / "models"))


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


def test_use_latent_checkpoint_sweep_cli(workspace, monkeypatch, tmp_path):
    """Per-AE-checkpoint CV sweep (reference use_latent.py:69-81,142-170,
    494-547): 2 checkpoints, the first forced to fail -> NaN rows for it,
    real aggregated metrics for the good one, incremental cross-model CSV +
    config-hash snapshot."""
    import jax
    import yaml
    from multimodal_isic_tpu.cli import prepare_df, use_latent
    from multimodal_isic_tpu.core import checkpoint as ckpt
    from multimodal_isic_tpu.models.convmae import ConvMAE
    from multimodal_isic_tpu.train.mae import init_mae

    root, cfg, dirs = workspace
    # own dataset: the nested CV (2 folds, then a stratified 80/20 inside
    # each trainable) needs >=2 bags per class in every split -> 72 patients
    dirs72 = make_synthetic_isic(str(tmp_path / "data72"), n_train=72,
                                 n_test=8, image_hw=(64, 80), seed=7)
    config = yaml.safe_load(open(cfg))
    config["dir"] = dirs72
    config["training_plan"]["parameters"]["model_size"] = "tiny"
    cfg_tiny = str(root / "config_tiny_sweep.yml")
    open(cfg_tiny, "w").write(yaml.safe_dump(config))
    prepare_df.main(["--config_path", cfg_tiny])

    full = ConvMAE(embed_dims=(32, 48, 64), depths=(1, 1, 2), num_heads=4,
                   decoder_dim=32, decoder_depth=1, decoder_heads=4)
    good = str(tmp_path / "good_ckpt")
    ckpt.save_checkpoint(good, init_mae(full, jax.random.PRNGKey(3)))
    # a checkpoint of a COMPLETELY different tree: restore_partial matches
    # zero leaves and raises, so this model's latent extraction fails
    bad = str(tmp_path / "bad_ckpt")
    ckpt.save_checkpoint(bad, {"unrelated": {"w": np.zeros(3, np.float32)}})

    monkeypatch.chdir(tmp_path)
    out_dir = tmp_path / "mil_results"
    use_latent.main(["--config_path", cfg_tiny, "--model_type", "mil",
                     "--checkpoints", f"{bad},{good}",
                     "--n_folds", "2", "--max_epochs", "2", "--patience", "2",
                     "--out_dir", str(out_dir)])

    csvs = [f for f in os.listdir(out_dir)
            if f.startswith("runs_df_mil_results_")]
    assert len(csvs) == 1
    res = pd.read_csv(out_dir / csvs[0])
    assert len(res) == 4  # 2 checkpoints x (best_bacc, best_loss)
    assert list(res["checkpoint_type"]) == ["best_bacc", "best_loss"] * 2
    bad_rows = res[res["id"] == "manual_0"]
    good_rows = res[res["id"] == "manual_1"]
    assert bad_rows["micro_accuracy"].isna().all()      # failed -> NaN row
    assert np.isfinite(good_rows["micro_accuracy"]).all()
    assert np.isfinite(good_rows["weighted_f1_std"]).all()
    # config snapshot with hash header, written once
    snaps = [f for f in os.listdir(out_dir) if f.startswith("config_")]
    assert len(snaps) == 1
    first_line = open(out_dir / snaps[0]).readline()
    assert first_line.startswith("# config_hash: ")


def test_train_ae_pretrained_ckpt_init(workspace, tmp_path):
    """pretrained_ckpt config key: train_ae initializes from a torch ConvMAE
    checkpoint with strict=False semantics (train_ae.py:136-141).  The torch
    norm weight is stamped to a recognizable constant; with the encoder LR of
    1e-5 one epoch cannot move it, so the saved best params prove the port."""
    import jax
    import torch
    import yaml
    from multimodal_isic_tpu.cli import prepare_df, train_ae
    from multimodal_isic_tpu.core import checkpoint as ckpt
    from multimodal_isic_tpu.utils.torch_ref import build_torch_convmae

    root, cfg, dirs = workspace
    if not os.path.exists(dirs["df"]):
        prepare_df.main(["--config_path", cfg])

    tm = build_torch_convmae(img_size=224, embed_dims=(32, 48, 64),
                             depths=(1, 1, 2), num_heads=4, decoder_dim=32,
                             decoder_depth=1, decoder_heads=4)
    with torch.no_grad():
        tm.norm.weight.fill_(7.0)
    pth = str(tmp_path / "convmae_pretrained.pth")
    torch.save({"model": tm.state_dict()}, pth)  # upstream 'model' wrapper

    config = yaml.safe_load(open(cfg))
    config["model_path"] = str(tmp_path / "models")
    config["training_plan"]["parameters"].update(
        {"epochs": 1, "batch_size": 8, "model_size": "tiny",
         "masking_ratio": 0.75, "eval_masking_ratio": 0.5,
         "pretrained_ckpt": pth})
    cfg_pre = str(root / "config_tiny_pretrained.yml")
    open(cfg_pre, "w").write(yaml.safe_dump(config))
    train_ae.main(["--config_path", cfg_pre])

    best = [d for d in os.listdir(tmp_path / "models") if len(d) == 32]
    assert len(best) == 1
    # read the saved leaf by name (no template needed)
    paths = ckpt.checkpoint_paths(str(tmp_path / "models" / best[0]))
    assert "encoder_norm/scale" in paths
    data = np.load(os.path.join(tmp_path / "models" / best[0], "arrays.npz"))
    scale = data[f"arr_{paths.index('encoder_norm/scale')}"]
    np.testing.assert_allclose(scale, 7.0, atol=1e-3)


def test_cluster_latents_cli_density(workspace, rng):
    """Density-clustering + neighbor-embedding backbone (the reference's
    UMAP+HDBSCAN-equivalent path) through the CLI, incl. the cosine-metric
    2-D viz variant (cluster_latents.py:175-217)."""
    from multimodal_isic_tpu.cli import cluster_latents
    root, cfg, dirs = workspace
    rows = []
    for img in range(24):
        label = img % 2
        for pid in range(5):
            lat = rng.randn(6).astype(np.float32) * 0.4 + label * 5.0
            rows.append({"image_path": f"SYN_{img:07d}_x.jpg",
                         "segmentation_path": "s", "target": label,
                         "patch_id": pid, "patch_in_mask": 1,
                         "patch_latent": lat, "patch_latent_pca": lat})
    path = str(root / "patches_density.pkl")
    pd.DataFrame(rows).to_pickle(path)
    out = str(root / "df_filtered_density.pkl")
    viz = str(root / "emb")
    cluster_latents.main(["--config_path", cfg, "--patch_df", path,
                          "--clusterer", "density", "--embed", "neighbor",
                          "--min_cluster_size", "20", "--min_samples", "5",
                          "--out", out, "--viz_out", viz])
    filtered = pd.read_pickle(out)
    assert "cluster_prop_same_weighted" in filtered.columns
    assert len(filtered) > 0
    assert (filtered["cluster"] >= 0).all()  # noise (-1) dropped by filter
    assert os.path.exists(viz + "_euclidean.png")
    assert os.path.exists(viz + "_cosine.png")


def test_extract_radiomics_cli_mesh_selection():
    """CLI mesh glue: -1 resolves to all (8 virtual) devices with chunk
    batch = data-axis size; data=1 disables sharding."""
    from multimodal_isic_tpu.cli.extract_radiomics import _maybe_mesh
    mesh, batch = _maybe_mesh({"mesh": {"data": -1}})
    assert mesh is not None and batch == 8
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh1, batch1 = _maybe_mesh({"mesh": {"data": 1}})
    assert mesh1 is None and batch1 == 16  # measured-best single-device chunk


def test_extract_radiomics_cli_end_to_end(tmp_path):
    """The extract_radiomics workload through the CLI on a mini synthetic
    set (mesh-sharded on the virtual 8-device mesh): suffixed 4-channel
    frames written to the configured pickles (extract_radiomics.py:54-77)."""
    import yaml as _yaml

    from multimodal_isic_tpu.cli import extract_radiomics, prepare_df

    dirs = make_synthetic_isic(str(tmp_path / "d"), n_train=8, n_test=2,
                               image_hw=(32, 32), seed=11)
    cfg_path = tmp_path / "c.yml"
    cfg_path.write_text(_yaml.safe_dump({"dir": dirs, "mesh": {"data": -1}}))
    prepare_df.main(["--config_path", str(cfg_path)])
    extract_radiomics.main(["--config_path", str(cfg_path)])
    tr = pd.read_pickle(dirs["radiomics"])
    te = pd.read_pickle(dirs["radiomics_test"])
    assert len(tr) == 8 and len(te) == 2
    # 4 channels x (13 image types x per-class features + 9 shape2D)
    for suffix in ("_gs", "_red", "_green", "_blue"):
        assert any(c.endswith(suffix) for c in tr.columns)
    assert list(tr.columns) == list(te.columns)
    assert np.isfinite(tr.to_numpy(np.float64)).all()


def test_cluster_latents_cli_interactive_html(workspace, rng, tmp_path):
    """--viz_out writes the euclidean/cosine scatters AND the interactive
    HTML plot (reference's bokeh output, cluster_latents.py:220-225) with
    every patch inlined."""
    from multimodal_isic_tpu.cli import cluster_latents
    root, cfg, dirs = workspace
    rows = []
    for img in range(8):
        label = img % 2
        for pid in range(4):
            lat = rng.randn(6).astype(np.float32) + label * 3.0
            rows.append({"image_path": f"SYN_{img:07d}_x.jpg",
                         "segmentation_path": "s", "target": label,
                         "patch_id": pid, "patch_latent": lat,
                         "patch_in_mask": 1, "patch_latent_pca": lat})
    path = str(tmp_path / "patches.pkl")
    pd.DataFrame(rows).to_pickle(path)
    viz = str(tmp_path / "emb")
    cluster_latents.main(["--config_path", cfg, "--patch_df", path,
                          "--k", "3", "--out", str(tmp_path / "f.pkl"),
                          "--viz_out", viz])
    html = (tmp_path / "emb_interactive.html").read_text()
    assert html.count('"x":') == 32          # every patch inlined
    assert "SYN_0000003_x.jpg" in html       # hover text carries the source
    assert os.path.exists(viz + "_euclidean.png")
    assert os.path.exists(viz + "_cosine.png")
