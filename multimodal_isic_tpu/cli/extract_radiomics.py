"""CLI: radiomics feature extraction (reference ``extract_radiomics.py``).

    python -m multimodal_isic_tpu.cli.extract_radiomics --config_path config.yml
"""

from __future__ import annotations

import pandas as pd

from ..analysis.radiomics import RadiomicsExtractor, extract_radiomics_frames
from .common import parse_config


def _maybe_mesh(config):
    """Shard extraction over the config's device mesh when more than one
    device is available (``mesh: {data: N}``) — each chunk's image×channel
    maps axis must divide the data-axis size, so chunk batch = data size."""
    import jax

    n = config["mesh"]["data"]
    if n == -1:
        n = len(jax.devices())
    if n <= 1 or len(jax.devices()) < n:
        return None, 16  # single device: measured-best chunk (README)
    from ..parallel import make_mesh
    return make_mesh(n_data=n, n_model=1), n  # batch=n → n·4 maps divide n


def main(argv=None) -> None:
    config = parse_config(argv)
    df_train = pd.read_pickle(config["dir"]["df"])
    df_test = pd.read_pickle(config["dir"]["df_test"])
    mesh, batch = _maybe_mesh(config)
    extractor = RadiomicsExtractor(mesh=mesh, batch=batch)
    if mesh is not None:
        print(f"Extraction sharded over mesh {dict(mesh.shape)}")
    print("Enabled image types:", extractor.get_enabled_image_types())
    print("Enabled features:", extractor.get_enabled_features())
    train, test = extract_radiomics_frames(config, df_train, df_test, extractor)
    print(f"Radiomics train frame: {train.shape} -> {config['dir']['radiomics']}")
    print(f"Radiomics test frame: {test.shape} -> {config['dir']['radiomics_test']}")


if __name__ == "__main__":
    main()
