"""Multimodal fusion classifier.

Re-creates the reference's ``MultiModalFusionNet`` (``model.py:42-227``)
semantics exactly — modality subsets, intermediate/late fusion ×
concat/weighted/attention (including the late-'concat'-is-actually-sum
behavior, ``model.py:219-221``) — as a flax module whose per-sample outputs
match the torch implementation to float tolerance given ported weights.

Branch dims (reference contract): image backbone 1536 → 256 → 128;
radiomics 780 → 256 → 128; clinical 13 (age + sex-emb 4 + loc-emb 8) → 64 →
128; artifacts 12 (6 × Embedding(2,2)) → 64 → 128.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .efficientnet import EfficientNet, feature_dim

SHARED_DIM = 128


class ProjMlp(nn.Module):
    """Linear→LayerNorm→ReLU→Dropout ×2 projector (model.py:63-105)."""
    hidden: int
    out: int
    drop1: float
    drop2: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.LayerNorm(name="ln1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.drop1, deterministic=not train)(x)
        x = nn.Dense(self.out, name="fc2")(x)
        x = nn.LayerNorm(name="ln2")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.drop2, deterministic=not train)(x)
        return x


class AttentionFusion(nn.Module):
    """Feature-level attention (model.py:6-23): per-modality scalar scores via
    Linear(D,128)→Tanh→Linear(128,1), softmax over modalities, weighted sum."""

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        stacked = jnp.stack(features, axis=1)  # [B, M, D]
        scores = nn.Dense(128, name="attn1")(stacked)
        scores = nn.Dense(1, name="attn2")(jnp.tanh(scores))[..., 0]  # [B, M]
        weights = jax.nn.softmax(scores, axis=1)[..., None]
        return (stacked * weights).sum(axis=1)


class AttentionFusionLate(nn.Module):
    """Logit-level attention (model.py:25-40): concat per-modality logits →
    Linear→ReLU→Linear(M) → softmax weights → weighted logit sum."""
    num_modalities: int

    @nn.compact
    def __call__(self, logits: Sequence[jnp.ndarray]):
        concat = jnp.concatenate(logits, axis=1)  # [B, M*C]
        scores = nn.Dense(128, name="attn1")(concat)
        scores = nn.Dense(self.num_modalities, name="attn2")(nn.relu(scores))
        weights = jax.nn.softmax(scores, axis=1)[..., None]  # [B, M, 1]
        return (jnp.stack(logits, axis=1) * weights).sum(axis=1)


class MultiModalFusionNet(nn.Module):
    modality: Sequence[str] = ("image", "radiomics", "clinical", "artifacts")
    fusion_level: str = "intermediate"   # 'intermediate' | 'late'
    fusion_strategy: str = "attention"   # 'concat' | 'weighted' | 'attention'
    radiomics_dim: int = 780
    num_sex_classes: int = 3
    num_loc_classes: int = 15
    num_artifact_classes: int = 6
    num_classes: int = 7
    backbone: str = "efficientnet-b3"
    dtype: jnp.dtype = jnp.float32  # backbone compute dtype (branch MLPs and
    # fusion heads are tiny and stay f32)
    backbone_remat: str = "none"  # EfficientNet.remat: 'none'|'conv'|'block'
    backbone_bn_folded: bool = False  # inference-only: backbone BN pre-folded
    # into conv weights (see efficientnet.fold_batchnorm / fold_fusion_params)
    backbone_conv_fission: bool = False  # split XLA's expand→depthwise
    # mega-fusions in the backbone (see EfficientNet.conv_fission —
    # measured 0.944× r4, kept for A/B)
    backbone_pallas_serving: bool = False  # fused Pallas MBConv serving
    # kernels in the backbone; requires backbone_bn_folded.  Measured 0.49×
    # r4 — kept for A/B (see EfficientNet.pallas_serving)

    @nn.compact
    def __call__(self, image=None, radiomics=None, age=None, sex=None,
                 loc=None, artifacts=None, train: bool = False,
                 image_features: Optional[jnp.ndarray] = None):
        """Per-modality branches → fusion → [B, num_classes] logits.

        ``image_features`` (pre-extracted backbone features) may replace the
        raw image for backbone-free evaluation/tests.
        """
        features = []
        logits = []
        late = self.fusion_level == "late"

        def head(name):
            return nn.Dense(self.num_classes, name=f"head_{name}")

        if "image" in self.modality:
            if image_features is None:
                image_features = EfficientNet(
                    self.backbone, dtype=self.dtype,
                    remat=self.backbone_remat,
                    bn_folded=self.backbone_bn_folded,
                    conv_fission=self.backbone_conv_fission,
                    pallas_serving=self.backbone_pallas_serving,
                    name="image_model")(image, train=train)
            feat = ProjMlp(256, SHARED_DIM, 0.3, 0.2, name="image_proj")(
                image_features, train=train)
            (logits if late else features).append(
                head("image")(feat) if late else feat)

        if "radiomics" in self.modality:
            feat = ProjMlp(256, SHARED_DIM, 0.4, 0.3, name="radiomics_mlp")(
                radiomics, train=train)
            (logits if late else features).append(
                head("radiomics")(feat) if late else feat)

        if "clinical" in self.modality:
            sex_feat = nn.Embed(self.num_sex_classes, 4, name="sex_emb")(sex)
            loc_feat = nn.Embed(self.num_loc_classes, 8, name="loc_emb")(loc)
            clin = jnp.concatenate([age[:, None], sex_feat, loc_feat], axis=1)
            feat = ProjMlp(64, SHARED_DIM, 0.2, 0.2, name="clinical_mlp")(
                clin, train=train)
            (logits if late else features).append(
                head("clinical")(feat) if late else feat)

        if "artifacts" in self.modality:
            art_feats = [
                nn.Embed(2, 2, name=f"artifact_emb_{i}")(artifacts[:, i])
                for i in range(self.num_artifact_classes)
            ]
            feat = ProjMlp(64, SHARED_DIM, 0.2, 0.2, name="artifact_mlp")(
                jnp.concatenate(art_feats, axis=1), train=train)
            (logits if late else features).append(
                head("artifacts")(feat) if late else feat)

        m = len(self.modality)
        if not late:
            if self.fusion_strategy == "concat":
                fused = jnp.concatenate(features, axis=1)
            elif self.fusion_strategy == "weighted":
                w = self.param("weights", lambda k, s: jnp.ones(s) / m, (m,))
                norm_w = jax.nn.softmax(w)
                fused = jnp.concatenate(
                    [wi * f for wi, f in zip(norm_w, features)], axis=1)
            elif self.fusion_strategy == "attention":
                fused = AttentionFusion(name="attention")(features)
            else:
                raise ValueError(self.fusion_strategy)
            x = nn.Dense(256, name="fusion_fc1")(fused)
            x = nn.relu(x)
            x = nn.Dropout(0.4, deterministic=not train)(x)
            return nn.Dense(self.num_classes, name="fusion_fc2")(x)

        # late fusion over per-modality logits
        if self.fusion_strategy == "concat":  # sum of logits (model.py:219-221)
            return jnp.stack(logits, axis=1).sum(axis=1)
        if self.fusion_strategy == "weighted":
            w = self.param("weights", lambda k, s: jnp.ones(s) / m, (m,))
            norm_w = jax.nn.softmax(w)
            return sum(wi * z for wi, z in zip(norm_w, logits))
        if self.fusion_strategy == "attention":
            return AttentionFusionLate(m, name="attention")(logits)
        raise ValueError(self.fusion_strategy)


def fold_fusion_params(params, batch_stats, backbone="efficientnet-b3"):
    """Serving-time transform for the full fusion net: fold the image
    backbone's BN into its conv weights.  Returns the param tree for
    ``MultiModalFusionNet(backbone_bn_folded=True)``; the folded model is
    applied WITHOUT a batch_stats collection (the backbone held the only
    BatchNorm layers — branch MLPs and fusion heads use LayerNorm)."""
    from .efficientnet import fold_batchnorm

    out = dict(params)
    if "image_model" in params:
        out["image_model"] = fold_batchnorm(
            params["image_model"], batch_stats["image_model"], backbone)
    return out
