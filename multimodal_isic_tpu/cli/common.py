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
    config = load_config(args.config_path)
    _apply_device(config.get("device", ""))
    return config


def _apply_device(device: str) -> None:
    """Honor the config's ``device`` key (reference ``config.yml:4`` selects
    hardware with e.g. ``'cuda:1'``): ``'cpu'`` pins the CPU backend —
    required in environments whose sitecustomize imports jax with another
    platform preset, where env vars alone cannot switch — and ``'tpu'`` (the
    default) leaves jax's platform selection untouched."""
    if device.lower() == "cpu":
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialized; jax's choice stands
