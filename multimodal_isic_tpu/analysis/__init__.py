from .latents import concat_patch_moments  # noqa: F401
from . import pca, kmeans, cluster, reduce, radiomics, latent_pipeline  # noqa: F401
