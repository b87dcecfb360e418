from .manifest import (  # noqa: F401
    ARTIFACT_COLS, LabelEncoder, build_manifests, merge_isic2019, prepare_manifests,
)
from .crop import centroid_crop, centroid_crop_bounds, centroid_crop_device  # noqa: F401
from .pipeline import (  # noqa: F401
    DermRecords, DeviceDataset, DeviceLoader, RADIOMICS_PLACEHOLDER_DIM)
from .synthetic import make_synthetic_isic, DX_CLASSES  # noqa: F401
from . import augment  # noqa: F401
