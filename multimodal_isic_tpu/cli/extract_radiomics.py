"""CLI: radiomics feature extraction (reference ``extract_radiomics.py``).

    python -m multimodal_isic_tpu.cli.extract_radiomics --config_path config.yml
"""

from __future__ import annotations

import pandas as pd

from ..analysis.radiomics import RadiomicsExtractor, extract_radiomics_frames
from .common import parse_config


def main(argv=None) -> None:
    config = parse_config(argv)
    df_train = pd.read_pickle(config["dir"]["df"])
    df_test = pd.read_pickle(config["dir"]["df_test"])
    extractor = RadiomicsExtractor()
    print("Enabled image types:", extractor.get_enabled_image_types())
    print("Enabled features:", extractor.get_enabled_features())
    train, test = extract_radiomics_frames(config, df_train, df_test, extractor)
    print(f"Radiomics train frame: {train.shape} -> {config['dir']['radiomics']}")
    print(f"Radiomics test frame: {test.shape} -> {config['dir']['radiomics_test']}")


if __name__ == "__main__":
    main()
