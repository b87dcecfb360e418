from .patches import patch_overlap_mask, patchify, unpatchify  # noqa: F401
from .attention import flash_attention  # noqa: F401
from . import filters, texture, texture_extra, pallas_glcm  # noqa: F401
