"""Shared CLI plumbing: the single ``--config_path`` flag every reference
entry point duplicates (``main.py:27-35`` etc.), done once."""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

from ..core.config import Config, load_config


def parse_config(argv: Optional[Sequence[str]] = None,
                 default_path: str = "config.yml") -> Config:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, default=default_path,
                        help="path to .yml config file specifying "
                             "datasets/training params")
    args, _ = parser.parse_known_args(argv)
    return load_config(args.config_path)
