"""CLI: conv-MAE pretraining (reference ``train_ae.py``).

    python -m multimodal_isic_tpu.cli.train_ae --config_path config.yml

Workload: manifests → StratifiedKFold(10) fold select → weighted-resampled
train loader (MAE train policy) / eval loaders → AdamW with encoder/decoder
LR split → train at ``masking_ratio`` (optionally lesion-guided), validate at
``eval_masking_ratio`` → save best-val weights under a fresh hex name
(``train_ae.py:206-215``) plus a resumable checkpoint; every 10 epochs latent
patch-moment diagnostics to the run dir.
"""

from __future__ import annotations

import os
import uuid

import jax
import numpy as np
import pandas as pd

from ..analysis.latents import concat_patch_moments
from ..core import checkpoint as ckpt
from ..core.rng import RngPool
from ..core.splits import StratifiedKFold, weighted_sample_indices
from ..data import DermRecords, DeviceLoader, augment
from ..train.mae import init_mae, make_encoder_step, train_mae
from ..utils.logging import RunLogger
from .common import parse_config


def main(argv=None) -> None:
    # multi-process (ISIC_COORDINATOR/... env or TPU-pod auto-detect):
    # per-host input shards over the global mesh; the jitted MAE steps are
    # unchanged — XLA partitions them from the batch shardings
    # parse_config FIRST: its device key must pin the platform before
    # setup()'s process_count() probe initializes the backend (see cli.main)
    config = parse_config(argv)
    from ..parallel import distributed as dist
    multiproc, mesh, place = dist.setup()
    if multiproc:
        from ..parallel import replicated
    params_cfg = config["training_plan"]["parameters"]
    seed = config["seed"]
    pool = RngPool(seed)  # identical streams on every process

    df_train_val = pd.read_pickle(config["dir"]["df"])
    df_test = pd.read_pickle(config["dir"]["df_test"])

    if config["dir"].get("isic2019_csv"):  # optional extra pretraining data
        from ..data.manifest import merge_isic2019
        df_train_val = merge_isic2019(
            df_train_val, df_test,
            pd.read_csv(config["dir"]["isic2019_csv"]),
            pd.read_csv(config["dir"]["isic2019_gt"]),
            config["dir"]["isic2019_img"])

    kf = StratifiedKFold(n_splits=10, shuffle=True, random_state=seed)
    folds = list(kf.split(df_train_val, df_train_val["dx"]))
    train_idx, val_idx = folds[params_cfg["fold"]]
    df_train = df_train_val.iloc[train_idx]
    df_val = df_train_val.iloc[val_idx]

    train_records = DermRecords(df_train)
    val_records = DermRecords(df_val)
    batch_size = params_cfg["batch_size"]
    sampler_rng = np.random.RandomState(seed)

    def train_batches(epoch):
        order = weighted_sample_indices(
            df_train["dx"].values.astype(int), None, sampler_rng)
        bs = batch_size
        if multiproc:  # same global order everywhere; each host its sub-rows
            order, bs, _ = dist.process_epoch_order(order, batch_size)
        return DeviceLoader(train_records, bs, order=order,
                            transform=augment.POLICIES["mae_train"],
                            rng_stream=pool["augment"], drop_last=True,
                            place=place)

    def val_batches():
        if multiproc:
            order, bs, _ = dist.process_epoch_order(
                np.arange(len(val_records)), 64, pad_to_full=True)
            return DeviceLoader(val_records, bs, order=order,
                                transform=augment.POLICIES["mae_eval"],
                                place=place)
        return DeviceLoader(val_records, 64,
                            transform=augment.POLICIES["mae_eval"])

    def local_val_batches():
        """Process-local loader for the coordinator's viz/diagnostic hook —
        no collectives, so non-participating processes are fine."""
        return DeviceLoader(val_records, 64,
                            transform=augment.POLICIES["mae_eval"])

    use_flash = bool(params_cfg.get("use_flash_attention", False))
    remat = bool(params_cfg.get("remat_blocks", False))
    # fused LN-MLP needs lane-aligned conv dims (base: 256/384) and pays off
    # on the MXU; tiny's 32/48 dims and CPU runs take the unfused path
    fused_mlp = (bool(params_cfg.get("use_fused_mlp", True))
                 and jax.default_backend() == "tpu")
    if params_cfg.get("model_size", "base") == "tiny":
        from ..models.convmae import ConvMAE
        model = ConvMAE(embed_dims=(32, 48, 64), depths=(1, 1, 2), num_heads=4,
                        decoder_dim=32, decoder_depth=1, decoder_heads=4,
                        norm_pix_loss=params_cfg["norm_pix_loss"],
                        use_flash_attention=use_flash, remat_blocks=remat)
    else:
        from ..models.convmae import ConvMAE
        model = ConvMAE(norm_pix_loss=params_cfg["norm_pix_loss"],
                        use_flash_attention=use_flash, remat_blocks=remat,
                        use_fused_mlp=fused_mlp)
    params = init_mae(model, pool["init"].next())
    if multiproc:
        params = jax.device_put(params, replicated(mesh))

    # pretrained initialization with strict=False semantics (the reference
    # loads the upstream ConvMAE/checkpoint.pth this way, train_ae.py:136-141)
    pretrained = params_cfg.get("pretrained_ckpt", "")
    if pretrained:
        if pretrained.endswith((".pth", ".pt")):  # torch checkpoint
            import torch

            from ..models.convmae import load_pretrained
            blob = torch.load(pretrained, map_location="cpu",
                              weights_only=False)
            if isinstance(blob, dict) and isinstance(blob.get("model"), dict):
                blob = blob["model"]  # upstream wraps the state dict
            params = load_pretrained(
                params, {k: np.asarray(v) for k, v in blob.items()}, model)
            print(f"Initialized from torch checkpoint {pretrained}")
        else:  # this framework's npz checkpoint dir
            params = ckpt.restore_partial(pretrained, params)
            print(f"Initialized from checkpoint {pretrained}")

    logger = (RunLogger(config.get("log_dir", "runs"),
                        config=config.to_dict())
              if dist.is_coordinator() else None)
    encoder_step = make_encoder_step(model)

    def epoch_hook(epoch, cur_params):
        if epoch % 10 == 0 or epoch == params_cfg["epochs"] - 1:
            from ..utils.viz import latent_scatter, reconstruction_grid
            if multiproc:
                # pull a host copy so the coordinator-only diagnostics run
                # on ITS devices, not as a collective on the global mesh
                cur_params = jax.device_get(cur_params)
            feats, targets = [], []
            for batch in local_val_batches():
                latent, _ = encoder_step(cur_params, batch["image"])
                feats.append(np.asarray(concat_patch_moments(latent)))
                targets.append(np.asarray(batch["target"]))
            feats = np.concatenate(feats)
            targets = np.concatenate(targets)
            np.savez(logger.artifact_path(f"latent_moments_ep{epoch}.npz"),
                     feats=feats, targets=targets)
            latent_scatter(feats, targets,
                           logger.artifact_path(f"latent_scatter_ep{epoch}.png"),
                           title=f"MomentsConcat scatter (epoch {epoch})",
                           seed=seed)
            # reconstruction grids for 4 val samples (utils.py:94-148)
            batch = next(iter(local_val_batches()))
            for i in range(min(4, batch["image"].shape[0])):
                img = batch["image"][i:i + 1]
                _, pred, msk = model.apply(
                    {"params": cur_params}, img,
                    mask_ratio=params_cfg["masking_ratio"],
                    rng=jax.random.PRNGKey(epoch))
                reconstruction_grid(
                    np.asarray(img)[0], np.asarray(pred)[0], np.asarray(msk)[0],
                    logger.artifact_path(f"image_comparison_{i + 1}_ep{epoch}.png"),
                    norm_pix_loss=params_cfg["norm_pix_loss"])

    # device_cache: stage both splits' decoded crops in HBM once and run
    # every train/val epoch as ONE scanned device program — the r5 fix for
    # per-batch dispatch overhead on slow links (see cli.main / BENCH_DISK).
    fused_train = fused_val = None
    if params_cfg["device_cache"] and not multiproc:
        import jax.numpy as jnp

        from ..data import DeviceDataset
        from ..train.mae import (make_mae_eval_epoch, make_mae_eval_step,
                                 make_mae_train_epoch, mae_optimizer)
        train_dset = DeviceDataset(train_records)
        val_dset = DeviceDataset(val_records)
        print(f"device_cache: {len(train_dset)} train + {len(val_dset)} val "
              f"crops staged in HBM")
        optimizer = mae_optimizer()
        train_ep = make_mae_train_epoch(
            model, optimizer, params_cfg["masking_ratio"],
            use_lesion_mask=params_cfg["include_lesion_mask"],
            transform=augment.POLICIES["mae_train"])
        val_ep = make_mae_eval_epoch(model, params_cfg["eval_masking_ratio"],
                                     transform=augment.POLICIES["mae_eval"])
        val_tail_step = make_mae_eval_step(model,
                                           params_cfg["eval_masking_ratio"])
        val_bs = min(64, len(val_dset))
        n_full = len(val_dset) // val_bs
        val_order = np.arange(n_full * val_bs).reshape(-1, val_bs).astype(
            np.int32)
        tail = np.arange(n_full * val_bs, len(val_dset))

        def fused_train(state, epoch, key):
            order = weighted_sample_indices(
                df_train["dx"].values.astype(int), None, sampler_rng)
            step_idx = train_dset.epoch_order(batch_size, order=order)
            return train_ep(state, train_dset.images, train_dset.masks,
                            jnp.asarray(step_idx), key)

        def fused_val(cur_params, key):
            loss = float(val_ep(cur_params, val_dset.images, val_dset.masks,
                                jnp.asarray(val_order), key)) * len(
                                    val_order.ravel())
            if len(tail):  # partial final batch, evaluated outside the scan
                img, msk = augment.POLICIES["mae_eval"](
                    val_dset.images[tail[0]:], val_dset.masks[tail[0]:])
                loss += float(val_tail_step(cur_params, img, key)) * len(tail)
            return loss / len(val_dset)

    coord = dist.is_coordinator()
    result = train_mae(
        model, params, train_batches, val_batches,
        num_epochs=params_cfg["epochs"],
        mask_ratio=params_cfg["masking_ratio"],
        eval_mask_ratio=params_cfg["eval_masking_ratio"],
        rng=pool["train"].next(),
        use_lesion_mask=params_cfg["include_lesion_mask"],
        logger=logger,
        # resumable checkpoints + viz artifacts are per-JOB: coordinator only
        checkpoint_dir=(os.path.join(config["model_path"], "mae_ckpt")
                        if coord else None),
        epoch_hook=epoch_hook if coord else None,
        # wrap-padded multi-process val loader: trim gathered per-sample
        # losses back to the true val-set size before averaging
        val_n_true=len(val_records) if multiproc else None,
        fused_train=fused_train, fused_val=fused_val,
    )

    if coord:
        os.makedirs(config["model_path"], exist_ok=True)
        model_path = os.path.join(config["model_path"], f"{uuid.uuid4().hex}")
        ckpt.save_checkpoint(model_path, result["best_params"],
                             metadata={"val_loss": result["best_val_loss"]})
        logger.assign("best_model_path", model_path)
        logger.print(f"Saved Best Model at {model_path}")


if __name__ == "__main__":
    main()
