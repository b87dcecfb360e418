"""Typed configuration system.

Covers the union of config keys consumed anywhere in the reference pipeline,
including keys absent from the checked-in sample config (see the reference's
``main.py:40-41``, ``train_ae.py:130-156``, ``reduce_dim.py:124-125``,
``save_latent.py:159``, ``tune_mil.py:244``, ``use_latent.py:283,303``).

The config is a frozen dataclass tree loadable from YAML.  Dict-style access
(``config["seed"]``, ``config["dir"]["df"]``) is supported for drop-in
compatibility with the reference's ``yaml.load`` dicts, while attribute access
(``config.training_plan.parameters.lr``) gives typed, validated reads.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


class _DictAccess:
    """Mixin giving dataclasses dict-style item access and ``.get``."""

    def __getitem__(self, key: str) -> Any:
        key = key.replace("-", "_")
        if not hasattr(self, key):
            raise KeyError(key)
        return getattr(self, key)

    def get(self, key: str, default: Any = None) -> Any:
        try:
            return self[key]
        except KeyError:
            return default

    def __contains__(self, key: str) -> bool:
        return hasattr(self, key.replace("-", "_"))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclass(frozen=True)
class DirConfig(_DictAccess):
    """Dataset artifact locations (reference ``config.yml:6-17``)."""

    csv: str = ""
    img: str = ""
    seg: str = ""
    radiomics: str = ""
    radiomics_red: str = ""
    df: str = ""
    csv_test: str = ""
    img_test: str = ""
    seg_test: str = ""
    radiomics_test: str = ""
    radiomics_test_red: str = ""
    df_test: str = ""
    # latent-pipeline artifacts (reference pickles DataFrames ad hoc;
    # we give them first-class config slots)
    latents: str = ""
    latents_test: str = ""
    # optional ISIC2019 augmentation for MAE pretraining (the reference
    # hard-codes these paths at train_ae.py:43-45)
    isic2019_csv: str = ""
    isic2019_img: str = ""
    isic2019_gt: str = ""


@dataclass(frozen=True)
class TrainParameters(_DictAccess):
    """Union of ``training_plan.parameters.*`` keys (reference
    ``config.yml:29-32`` plus out-of-repo keys at ``train_ae.py:130-156``)."""

    patience: int = 10
    epochs: int = 1
    fold: int = 0
    batch_size: int = 16
    lr: float = 1e-3
    weight_decay: float = 1e-4
    norm_pix_loss: bool = False
    masking_ratio: float = 0.75
    eval_masking_ratio: float = 0.75
    include_lesion_mask: bool = False
    model_size: str = "base"  # 'base' (ConvViT-B) | 'tiny' (tests/demos)
    pretrained_ckpt: str = ""  # torch .pth (upstream ConvMAE naming) or this
    # framework's checkpoint dir; loaded strict=False (train_ae.py:136-141)
    use_flash_attention: bool = False  # Pallas blockwise attention in the
    # ConvMAE ViT/decoder blocks (ops/attention.py)
    use_fused_mlp: bool = True  # Pallas fused LN→MLP→residual in the ConvMAE
    # conv stages (ops/fused_mlp.py): +10% train / +13% fwd on v5e; applied
    # only on TPU with lane-aligned dims (base model), ignored for 'tiny'
    remat_blocks: bool = False  # jax.checkpoint ConvMAE blocks: ~1/3 extra
    # fwd FLOPs for O(depth) less activation HBM (bs=64 -> 256 on 16 GB)
    backbone: str = "efficientnet-b3"  # fusion image backbone (the
    # reference is fixed to B3, model.py:58; smaller variants serve tests
    # and scaled-down deployments)
    backbone_remat: str = "none"  # EfficientNet activation remat for the
    # fusion train step: 'none' | 'conv' (save only conv outputs; recompute
    # BN/silu/SE chains in backward) | 'block' (save block boundaries only)
    fold_bn_eval: bool = False  # serving option: run the FINAL test
    # evaluation with BatchNorm folded into the conv weights
    # (models.efficientnet.fold_batchnorm) — same outputs, no BN ops
    device_cache: bool = False  # stage the split's decoded 450² crops in
    # HBM once (data.pipeline.DeviceDataset) and run epochs as pure device
    # work — the r5 mitigation for slow host→device links (this tunnel moves
    # ~25-40 MB/s; HAM10000's train split is ~6 GB of a 16 GB chip).
    # Single-process runs only (multi-process shards batches host-side).
    augment_fast: bool = False  # fusion train augmentation via the
    # gather-free Pallas warp + batch MXU resize (augment.POLICIES
    # ['fusion_train_fast']): same augmentations/RNG streams, resampler
    # float-rounding differences only (tests/test_pallas_warp.py); masks
    # pass through untransformed (the fusion step never consumes them)


@dataclass(frozen=True)
class TrainingPlan(_DictAccess):
    modality: List[str] = field(
        default_factory=lambda: ["image", "radiomics", "clinical", "artifacts"]
    )
    fusion: str = "concat"  # 'concat' | 'weighted' | 'attention'
    fusion_level: str = "intermediate"  # 'intermediate' | 'late'
    parameters: TrainParameters = field(default_factory=TrainParameters)


@dataclass(frozen=True)
class MeshConfig(_DictAccess):
    """Device-mesh layout for pjit/shard_map parallelism (new in this build;
    the reference is single-device — SURVEY.md §2.3)."""

    data: int = -1  # -1: use all available devices on the data axis
    model: int = 1  # reserved for tensor parallelism


@dataclass(frozen=True)
class Config(_DictAccess):
    neptune: bool = False  # kept for config-surface parity; maps to local logging
    seed: int = 42
    device: str = "tpu"
    dir: DirConfig = field(default_factory=DirConfig)
    model_path: str = "models"
    pca: bool = False  # save_latent.py:159
    num_classes: int = 7  # tune_mil.py:244
    # encoder-only latent extraction compute dtype ('bfloat16' | 'float32');
    # bf16 is the measured-fastest v5e configuration, latents re-cast to f32
    latent_dtype: str = "bfloat16"
    training_plan: TrainingPlan = field(default_factory=TrainingPlan)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # Best-hyperparameter records consumed by the CV harness
    # (use_latent.py:283,303).  Stored as plain dicts: HPO output.
    best_params: Dict[str, Any] = field(default_factory=dict)
    best_params_graph_mil: Dict[str, Any] = field(default_factory=dict)
    # Local metrics sink (replaces Neptune/wandb SaaS): JSONL path.
    log_dir: str = "runs"


def _build(cls, data: Dict[str, Any]):
    """Recursively construct a dataclass from a dict, ignoring unknown keys
    only if they are None-valued; unknown non-trivial keys raise so typos in
    experiment configs fail fast."""
    if data is None:
        return cls()
    field_map = {f.name: f for f in dataclasses.fields(cls)}
    kwargs: Dict[str, Any] = {}
    for key, value in data.items():
        norm = key.replace("-", "_")
        if norm not in field_map:
            if value is None:
                continue
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
        f = field_map[norm]
        if dataclasses.is_dataclass(f.type) or f.type in (
            DirConfig,
            TrainParameters,
            TrainingPlan,
            MeshConfig,
        ):
            kwargs[norm] = _build(f.type, value)
        else:
            kwargs[norm] = value
    return cls(**kwargs)


_NESTED = {
    "dir": DirConfig,
    "parameters": TrainParameters,
    "training_plan": TrainingPlan,
    "mesh": MeshConfig,
}


def config_from_dict(data: Dict[str, Any]) -> Config:
    """Build a :class:`Config` from a plain (YAML-loaded) dict."""
    data = dict(data or {})
    kwargs: Dict[str, Any] = {}
    field_map = {f.name: f for f in dataclasses.fields(Config)}
    for key, value in data.items():
        norm = key.replace("-", "_")
        if norm not in field_map:
            if value is None:
                continue
            raise KeyError(f"unknown config key {key!r}")
        if norm == "dir":
            kwargs[norm] = _build(DirConfig, value)
        elif norm == "training_plan":
            tp = dict(value or {})
            params = _build(TrainParameters, tp.pop("parameters", None))
            kwargs[norm] = TrainingPlan(parameters=params, **{
                k.replace("-", "_"): v for k, v in tp.items()
            })
        elif norm == "mesh":
            kwargs[norm] = _build(MeshConfig, value)
        else:
            kwargs[norm] = value
    return Config(**kwargs)


def load_config(path: str) -> Config:
    """Load a YAML config file into a typed :class:`Config`.

    Replaces the five duplicated ``--config_path`` parsers in the reference
    (``main.py:27-35``, ``utils.py:151-158``, ``prepare_df.py:16-24``,
    ``extract_radiomics.py:22-30``, ``reduce_dim.py:66-74``).
    """
    with open(path) as f:
        raw = yaml.safe_load(f)
    return config_from_dict(raw or {})
