"""CLI: multimodal fusion training (reference ``main.py``, the primary entry).

    python -m multimodal_isic_tpu.cli.main --config_path config.yml

Workload: manifests → StratifiedKFold(10) fold select → fusion-policy loaders
→ MultiModalFusionNet(modality, fusion_level, fusion) → SGD(1e-3, wd 1e-4) +
CE → epoch loop with early stopping on val loss → best weights saved under a
fresh hex name → fresh reload → test() with classification report.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd

from ..core import checkpoint as ckpt
from ..core.early_stopping import EarlyStopping
from ..core.rng import RngPool
from ..core.splits import StratifiedKFold
from ..core.train_state import TrainState
from ..data import DermRecords, DeviceLoader, augment
from ..models.fusion import MultiModalFusionNet
from ..train.fusion import (
    evaluate_test, fusion_optimizer, init_fusion, make_fusion_eval_step,
    make_fusion_train_step, train_epoch, validate_epoch,
)
from ..utils.logging import RunLogger
from .common import parse_config

# eval-side image size for the FUSED validation epoch (the policies bake
# 380² in; tests monkeypatch this alongside their small policies)
FUSED_EVAL_HW = (380, 380)


def main(argv=None) -> None:
    # Multi-process mode (ISIC_COORDINATOR/... env or TPU-pod auto-detect):
    # the SAME script runs on every host — each loads only its slice of
    # every global batch, the assembled global arrays are sharded over the
    # global mesh's data axis, and XLA inserts the gradient/BN collectives
    # (ICI in-slice, DCN across hosts) from those shardings; the jitted
    # train/eval steps below are unchanged.
    # parse_config FIRST: its device key pins jax's platform (cpu override
    # for sitecustomize-preset environments) and must land before setup()'s
    # process_count() probe initializes the backend — on a shared-TPU host
    # a second process touching the accelerator hangs, it doesn't error.
    config = parse_config(argv)
    from ..parallel import distributed as dist
    multiproc, mesh, place = dist.setup()
    import jax

    if multiproc:
        from ..parallel import replicated
    plan = config["training_plan"]
    params_cfg = plan["parameters"]
    seed = config["seed"]
    pool = RngPool(seed)  # same seed on every process: identical epoch
    # orders and dropout keys everywhere, as the global program requires

    df_train_val = pd.read_pickle(config["dir"]["df"])
    df_test = pd.read_pickle(config["dir"]["df_test"])

    radiomics = radiomics_test = None
    rad_path = config["dir"].get("radiomics_red")
    if rad_path and os.path.exists(rad_path):
        radiomics = pd.read_pickle(rad_path).values
        radiomics_test = pd.read_pickle(config["dir"]["radiomics_test_red"]).values

    kf = StratifiedKFold(n_splits=10, shuffle=True, random_state=seed)
    folds = list(kf.split(df_train_val, df_train_val["dx"]))
    current_fold = params_cfg["fold"]
    train_idx, val_idx = folds[current_fold]
    df_train = df_train_val.iloc[train_idx]
    df_val = df_train_val.iloc[val_idx]
    print(f"Train set size: {len(df_train)}")
    print(f"Val set size: {len(df_val)}")
    print(f"Test set size: {len(df_test)}")

    # image-less modality subsets never read the image branch: skip decode +
    # the 380×380 augmentation pipeline entirely (metadata-only records)
    with_image = "image" in plan["modality"]
    train_policy = ("fusion_train_fast" if params_cfg["augment_fast"]
                    else "fusion_train")
    train_tf = augment.POLICIES[train_policy] if with_image else None
    eval_tf = augment.POLICIES["fusion_eval"] if with_image else None

    def records(df, rad, idx=None):
        r = rad[idx] if (rad is not None and idx is not None) else rad
        return DermRecords(df, radiomics=r, with_image=with_image)

    shuffle_rng = pool["shuffle"]
    train_records = records(df_train, radiomics, train_idx)
    GLOBAL_BS = 16  # reference batch size (main.py:120-126) = the global batch

    def eval_loader(recs):
        """Eval loader; multi-process wraps the order to full global batches
        (predictions trimmed back to n_true by evaluate_test)."""
        if not multiproc:
            return DeviceLoader(recs, GLOBAL_BS, transform=eval_tf), None
        order, per_bs, n_true = dist.process_epoch_order(
            np.arange(len(recs)), GLOBAL_BS, pad_to_full=True)
        return DeviceLoader(recs, per_bs, order=order, transform=eval_tf,
                            place=place), n_true

    val_loader, val_n = eval_loader(records(df_val, radiomics, val_idx))
    test_loader, test_n = eval_loader(records(df_test, radiomics_test))

    rad_dim = radiomics.shape[1] if radiomics is not None else 780
    model = MultiModalFusionNet(modality=plan["modality"],
                                fusion_level=plan["fusion_level"],
                                fusion_strategy=plan["fusion"],
                                radiomics_dim=rad_dim,
                                backbone=params_cfg["backbone"],
                                backbone_remat=params_cfg["backbone_remat"])
    # one run record per JOB, not per process: non-coordinators train the
    # same global program but stay silent
    logger = (RunLogger(config.get("log_dir", "runs"),
                        config=config.to_dict())
              if dist.is_coordinator() else None)
    if logger:
        logger.assign("group_tags", list(plan["modality"]) + [plan["fusion"]])
        logger.assign("train/current_fold", current_fold)

    first = next(iter(DeviceLoader(train_records, 2, transform=eval_tf)))
    params, batch_stats = init_fusion(model, pool["init"].next(), first)
    if multiproc:
        # params live replicated over the global mesh; the batch shardings
        # alone then drive XLA's DP partitioning of the unchanged steps
        params = jax.device_put(params, replicated(mesh))
        batch_stats = jax.device_put(batch_stats, replicated(mesh))
    optimizer = fusion_optimizer(lr=1e-3, weight_decay=1e-4)
    state = TrainState.create(params, optimizer, pool["train"].next())
    train_step = make_fusion_train_step(model, optimizer)
    eval_step = make_fusion_eval_step(model)

    early_stopping = EarlyStopping(patience=params_cfg["patience"],
                                   log=logger.log if logger else None)
    # device_cache: stage the train split's decoded crops in HBM ONCE, then
    # run every epoch as ONE scanned device program (gather → augment →
    # step; train.fusion.make_fusion_train_epoch) — the r5 measured fix for
    # slow host→device links and per-batch dispatch overhead
    # (61 img/s streaming → 127 per-batch resident → fused epoch, see
    # scripts/train_from_disk_bench.py / BENCH_DISK.json).  Multi-process
    # runs keep the streaming loader (batches shard host-side).
    device_dataset, fused_epoch = None, None
    val_device, fused_val = None, None
    if params_cfg["device_cache"] and with_image and not multiproc:
        from ..data import DeviceDataset
        from ..train.fusion import (log_train_epoch, make_fusion_eval_epoch,
                                    make_fusion_train_epoch,
                                    padded_epoch_order)
        # the fast policy never touches masks — skip staging them (saves
        # ~25 % of the one-time upload and HBM footprint)
        device_dataset = DeviceDataset(
            train_records, with_masks=not params_cfg["augment_fast"])
        fused_epoch = make_fusion_train_epoch(model, optimizer,
                                              transform=train_tf)
        # validation epochs fuse too: without this each epoch re-streams
        # the val split over the ~25-40 MB/s link, costing more than the
        # fused train epoch (masks never consumed → not staged)
        val_device = DeviceDataset(records(df_val, radiomics, val_idx),
                                   with_masks=False)
        fused_val = make_fusion_eval_epoch(model, out_hw=FUSED_EVAL_HW)
        val_order, val_valid = padded_epoch_order(len(val_device), GLOBAL_BS)
        print(f"device_cache: {len(device_dataset)} train + "
              f"{len(val_device)} val crops staged in HBM "
              f"({(device_dataset.images.nbytes + val_device.images.nbytes) / 1e9:.2f} GB)")
    for epoch in range(1, params_cfg["epochs"] + 1):
        order = np.random.RandomState(seed + epoch).permutation(len(df_train))
        if multiproc:  # same permutation everywhere; each host its sub-rows
            order, per_bs, _ = dist.process_epoch_order(order, GLOBAL_BS)
        if device_dataset is not None:
            step_idx = device_dataset.epoch_order(GLOBAL_BS, order=order)
            state, batch_stats, ep_loss, ncorr = fused_epoch(
                state, batch_stats, device_dataset.images,
                device_dataset.masks, device_dataset.meta, step_idx,
                pool["fused_epoch"].next())
            log_train_epoch(logger, state, epoch, float(ep_loss),
                            int(ncorr) / step_idx.size)
        else:
            train_loader = DeviceLoader(train_records,
                                        per_bs if multiproc else GLOBAL_BS,
                                        order=order, transform=train_tf,
                                        rng_stream=pool["augment"] if with_image
                                        else None, place=place)
            state, batch_stats, _, _ = train_epoch(
                train_step, state, batch_stats, train_loader, pool["dropout"],
                logger=logger, epoch=epoch)
        if fused_val is not None:
            vloss, vcorr = fused_val(state.params, batch_stats,
                                     val_device.images, val_device.meta,
                                     val_order, val_valid)
            val_loss, val_acc = float(vloss), int(vcorr) / len(val_device)
            if logger:  # same lines as validate_epoch (net_utils.py:34)
                logger.log("val/epoch_loss", val_loss, step=epoch)
                logger.log("val/epoch_acc", val_acc, step=epoch)
                logger.print(f"Epoch {epoch} - Val Loss: {val_loss:.4f}, "
                             f"Accuracy: {val_acc:.4f}")
        else:
            val_loss = validate_epoch(eval_step, state.params, batch_stats,
                                      val_loader, logger=logger, epoch=epoch,
                                      n_true=val_n, group_size=GLOBAL_BS)
        if early_stopping(val_loss, (state.params, batch_stats)):
            print(f"Early stopping at epoch {epoch}")
            break

    best_params, best_stats = early_stopping.get_best_params() or (
        state.params, batch_stats)
    name_hex = uuid.uuid4().hex
    if multiproc:
        # every process must restore the SAME path: broadcast the
        # coordinator's uuid (checkpoints live on a shared filesystem)
        from jax.experimental import multihost_utils
        raw = multihost_utils.broadcast_one_to_all(
            np.frombuffer(uuid.UUID(hex=name_hex).bytes, np.uint8))
        name_hex = uuid.UUID(bytes=np.asarray(raw).tobytes()).hex
    model_name = os.path.join(config["model_path"], name_hex)
    os.makedirs(config["model_path"], exist_ok=True)
    if dist.is_coordinator():
        ckpt.save_checkpoint(model_name, {"params": best_params,
                                          "batch_stats": best_stats})
    if multiproc:
        multihost_utils.sync_global_devices("fusion_ckpt_saved")
    if logger:
        logger.assign("best_model_path", model_name)

    restored = ckpt.restore_checkpoint(
        model_name, {"params": best_params, "batch_stats": best_stats})
    if multiproc:
        restored = jax.device_put(restored, replicated(mesh))
    if params_cfg["fold_bn_eval"] and with_image:
        # serving path: fold backbone BN into conv weights for the final
        # test pass — identical outputs, no BatchNorm ops in the graph
        from ..models.fusion import fold_fusion_params
        folded_model = MultiModalFusionNet(
            modality=plan["modality"], fusion_level=plan["fusion_level"],
            fusion_strategy=plan["fusion"], radiomics_dim=rad_dim,
            backbone=params_cfg["backbone"], backbone_bn_folded=True)
        folded = fold_fusion_params(jax.device_get(restored["params"]),
                                    jax.device_get(restored["batch_stats"]),
                                    backbone=params_cfg["backbone"])
        if multiproc:
            folded = jax.device_put(folded, replicated(mesh))
        evaluate_test(make_fusion_eval_step(folded_model), folded, {},
                      test_loader, logger=logger, n_true=test_n)
    else:
        evaluate_test(eval_step, restored["params"], restored["batch_stats"],
                      test_loader, logger=logger, n_true=test_n)


if __name__ == "__main__":
    main()
