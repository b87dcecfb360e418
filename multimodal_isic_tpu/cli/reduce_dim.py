"""CLI: radiomics feature reduction (reference ``reduce_dim.py``).

    python -m multimodal_isic_tpu.cli.reduce_dim --config_path config.yml
"""

from __future__ import annotations

import pandas as pd

from ..analysis.reduce import reduce_features
from .common import parse_config


def main(argv=None) -> None:
    config = parse_config(argv)
    rad_train = pd.read_pickle(config["dir"]["radiomics"])
    rad_test = pd.read_pickle(config["dir"]["radiomics_test"])
    df_train = pd.read_pickle(config["dir"]["df"])
    tr, te = reduce_features(rad_train, rad_test, df_train["dx"],
                             seed=config["seed"])
    tr.to_pickle(config["dir"]["radiomics_red"])
    te.to_pickle(config["dir"]["radiomics_test_red"])
    print(f"Reduced radiomics saved: train {tr.shape} -> "
          f"{config['dir']['radiomics_red']}, test {te.shape} -> "
          f"{config['dir']['radiomics_test_red']}")


if __name__ == "__main__":
    main()
