"""CLI: latent extraction (reference ``save_latent.py``).

    python -m multimodal_isic_tpu.cli.save_latent --config_path config.yml \
        [--model_name <checkpoint-dir-name>] [--remove_background]
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

from ..core import checkpoint as ckpt
from ..data import DermRecords, DeviceLoader, augment
from ..models.convmae import convmae_convvit_base_patch16_dec512d8b
from ..train.mae import init_mae
from ..analysis.latent_pipeline import extract_latents as _extract
from .common import parse_config


def extract_latents(config, path: str, remove_background: bool = False):
    """Importable API matching the reference signature
    (``save_latent.extract_latents(config, path, remove_background)``)."""
    import jax

    df_train_val = pd.read_pickle(config["dir"]["df"])
    df_test = pd.read_pickle(config["dir"]["df_test"])

    import jax.numpy as jnp
    size = config["training_plan"]["parameters"].get("model_size", "base")
    # encoder-only inference defaults to bf16 compute (fp32 params, latents
    # cast back to f32 on host): measured vs fp32 on v5e — see README perf
    # table; moments parity verified in tests/test_latent_pipeline.py
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        str(config.get("latent_dtype", "bfloat16"))]
    if size == "tiny":
        from ..models.convmae import ConvMAE
        model = ConvMAE(embed_dims=(32, 48, 64), depths=(1, 1, 2), num_heads=4,
                        decoder_dim=32, decoder_depth=1, decoder_heads=4,
                        with_decoder=False, dtype=dtype)
    else:
        fused = (bool(config["training_plan"]["parameters"].get(
            "use_fused_mlp", True)) and jax.default_backend() == "tpu")
        model = convmae_convvit_base_patch16_dec512d8b(with_decoder=False,
                                                       dtype=dtype,
                                                       use_fused_mlp=fused)
    params = init_mae(model, jax.random.PRNGKey(config["seed"]))
    checkpoint_path = os.path.join(os.getcwd(), "models", path) \
        if not os.path.isabs(path) else path
    if os.path.exists(os.path.join(checkpoint_path, "manifest.json")):
        # encoder-only restore from a full-model checkpoint: name-matched,
        # decoder leaves ignored (the reference's strict=False load,
        # save_latent.py:49)
        params = ckpt.restore_partial(checkpoint_path, params)

    def loader(df):
        # measured sweep on v5e (fp32 encoder, 224²): bs 32 → 620 img/s,
        # 128 → 933, 256 → 969; 128 captures ~96% of peak with a quarter
        # of the footprint (the reference uses bs=1000, save_latent.py:39)
        return DeviceLoader(DermRecords(df), batch_size=128,
                            transform=augment.POLICIES["mae_eval"])

    return _extract(
        model, params, loader(df_train_val), loader(df_test),
        (df_train_val["image_path"].tolist(), df_train_val["segmentation_path"].tolist()),
        (df_test["image_path"].tolist(), df_test["segmentation_path"].tolist()),
        remove_background=remove_background,
        pca_enabled=bool(config.get("pca", False)))



def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, default="")
    parser.add_argument("--remove_background", action="store_true")
    args, rest = parser.parse_known_args(argv)
    config = parse_config(rest)
    frames = extract_latents(config, args.model_name, args.remove_background)
    folder = "dataframes_latents"
    os.makedirs(folder, exist_ok=True)
    names = ["patch_level_latents_train_df", "patch_level_latents_test_df",
             "latent_pooled_train_df", "latent_pooled_test_df",
             "latent_raw_train_df", "latent_raw_test_df"]
    for name, frame in zip(names, frames):
        frame.to_pickle(os.path.join(folder, f"{name}.pkl"))
    print("Finished saving train_val and test patch-level and pooled latents.")


if __name__ == "__main__":
    main()
