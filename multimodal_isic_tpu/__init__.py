"""multimodal_isic_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for the
multimodal ISIC skin-lesion stack.

Brand-new architecture providing the capabilities of the reference pipeline
(`rbuler/multimodal-isic`): multimodal fusion classification, conv-MAE masked
autoencoder pretraining, on-device radiomics feature extraction, latent
analysis (PCA / k-means / cluster purity), MIL & Graph-MIL heads with ASHA
hyperparameter search, and data-parallel training over a TPU device mesh.

Subpackages
-----------
core      config, RNG streams, metrics, splitters, optimizers, train state,
          checkpointing, early stopping.
data      manifest ETL, device input pipeline, crops, augmentations,
          synthetic dataset generation.
ops       compute kernels: image filter bank, radiomics texture features
          (first-order / GLCM / GLRLM / GLSZM / GLDM / NGTDM / shape2D),
          patchify, blockwise attention.
models    conv-MAE, EfficientNet-B3, multimodal fusion net, MIL / Graph-MIL.
train     jitted train steps and loops per workload.
analysis  latent extraction, PCA, k-means, cluster statistics, feature
          reduction.
hpo       ASHA successive-halving search over vmapped/host-scheduled trials.
parallel  mesh construction and sharding helpers (DP over ICI).
cli       one entry point per reference workload.
utils     reporting and experiment tooling.
"""

__version__ = "0.1.0"
