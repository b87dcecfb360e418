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


def main(argv=None) -> None:
    # join the multi-host runtime when ISIC_COORDINATOR/... are set (TPU
    # pods auto-detect); a no-op single-process otherwise
    from ..parallel import distributed as dist
    dist.initialize()
    config = parse_config(argv)
    plan = config["training_plan"]
    params_cfg = plan["parameters"]
    seed = config["seed"]
    pool = RngPool(seed)

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
    train_tf = augment.POLICIES["fusion_train"] if with_image else None
    eval_tf = augment.POLICIES["fusion_eval"] if with_image else None

    def records(df, rad, idx=None):
        r = rad[idx] if (rad is not None and idx is not None) else rad
        return DermRecords(df, radiomics=r, with_image=with_image)

    shuffle_rng = pool["shuffle"]
    train_records = records(df_train, radiomics, train_idx)
    loaders = {
        "val": DeviceLoader(records(df_val, radiomics, val_idx), 16,
                            transform=eval_tf),
        "test": DeviceLoader(records(df_test, radiomics_test), 16,
                             transform=eval_tf),
    }

    rad_dim = radiomics.shape[1] if radiomics is not None else 780
    model = MultiModalFusionNet(modality=plan["modality"],
                                fusion_level=plan["fusion_level"],
                                fusion_strategy=plan["fusion"],
                                radiomics_dim=rad_dim,
                                backbone_remat=params_cfg["backbone_remat"])
    logger = RunLogger(config.get("log_dir", "runs"), config=config.to_dict())
    logger.assign("group_tags", list(plan["modality"]) + [plan["fusion"]])
    logger.assign("train/current_fold", current_fold)

    first = next(iter(DeviceLoader(train_records, 2, transform=eval_tf)))
    params, batch_stats = init_fusion(model, pool["init"].next(), first)
    optimizer = fusion_optimizer(lr=1e-3, weight_decay=1e-4)
    state = TrainState.create(params, optimizer, pool["train"].next())
    train_step = make_fusion_train_step(model, optimizer)
    eval_step = make_fusion_eval_step(model)

    early_stopping = EarlyStopping(patience=params_cfg["patience"],
                                   log=logger.log)
    import numpy as np
    for epoch in range(1, params_cfg["epochs"] + 1):
        order = np.random.RandomState(seed + epoch).permutation(len(df_train))
        train_loader = DeviceLoader(train_records, 16, order=order,
                                    transform=train_tf,
                                    rng_stream=pool["augment"] if with_image
                                    else None)
        state, batch_stats, _, _ = train_epoch(
            train_step, state, batch_stats, train_loader, pool["dropout"],
            logger=logger, epoch=epoch)
        val_loss = validate_epoch(eval_step, state.params, batch_stats,
                                  loaders["val"], logger=logger, epoch=epoch)
        if early_stopping(val_loss, (state.params, batch_stats)):
            print(f"Early stopping at epoch {epoch}")
            break

    best_params, best_stats = early_stopping.get_best_params() or (
        state.params, batch_stats)
    model_name = os.path.join(config["model_path"], uuid.uuid4().hex)
    os.makedirs(config["model_path"], exist_ok=True)
    ckpt.save_checkpoint(model_name, {"params": best_params,
                                      "batch_stats": best_stats})
    logger.assign("best_model_path", model_name)

    restored = ckpt.restore_checkpoint(
        model_name, {"params": best_params, "batch_stats": best_stats})
    if params_cfg["fold_bn_eval"] and with_image:
        # serving path: fold backbone BN into conv weights for the final
        # test pass — identical outputs, no BatchNorm ops in the graph
        from ..models.fusion import fold_fusion_params
        folded_model = MultiModalFusionNet(
            modality=plan["modality"], fusion_level=plan["fusion_level"],
            fusion_strategy=plan["fusion"], radiomics_dim=rad_dim,
            backbone_bn_folded=True)
        folded = fold_fusion_params(restored["params"],
                                    restored["batch_stats"])
        evaluate_test(make_fusion_eval_step(folded_model), folded, {},
                      loaders["test"], logger=logger)
    else:
        evaluate_test(eval_step, restored["params"], restored["batch_stats"],
                      loaders["test"], logger=logger)


if __name__ == "__main__":
    main()
