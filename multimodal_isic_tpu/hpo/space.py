"""Hyperparameter search spaces.

Samplers mirror Ray Tune's primitives, and the two concrete spaces reproduce
the reference's (``tune_mil.py:161-200``): the classic-MIL space (hidden/att
dims 32-1024, dropout 0-0.75, adam/adamw, log-uniform lr/wd) and the 19-dim
Graph-MIL space (gat/transformer, 2-8 layers, grid/knn graphs, k ∈
{4,8,12,16}, heads, residual/layer-norm toggles...).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Sequence

import numpy as np


@dataclass(frozen=True)
class Uniform:
    low: float
    high: float

    def sample(self, rng):
        return float(rng.uniform(self.low, self.high))


@dataclass(frozen=True)
class LogUniform:
    low: float
    high: float

    def sample(self, rng):
        return float(np.exp(rng.uniform(np.log(self.low), np.log(self.high))))


@dataclass(frozen=True)
class QRandInt:
    low: int
    high: int
    q: int = 1

    def sample(self, rng):
        v = rng.randint(self.low, self.high + 1)
        return int(round(v / self.q) * self.q)


@dataclass(frozen=True)
class Choice:
    options: Sequence[Any]

    def sample(self, rng):
        return self.options[rng.randint(len(self.options))]


def sample_config(space: Dict[str, Any], rng: np.random.RandomState) -> Dict[str, Any]:
    out = {}
    for key, spec in space.items():
        out[key] = spec.sample(rng) if hasattr(spec, "sample") else spec
    return out


# the reference's classic-MIL space (tune_mil.py:161-168)
MIL_SPACE: Dict[str, Any] = {
    "hidden_dim": QRandInt(32, 1024),
    "att_dim": QRandInt(32, 1024),
    "dropout": Uniform(0.0, 0.75),
    "optimizer": Choice(["adam", "adamw"]),
    "lr": LogUniform(1e-7, 1e-3),
    "weight_decay": LogUniform(1e-6, 1e-3),
}

# the reference's Graph-MIL space (tune_mil.py:170-200)
GRAPH_MIL_SPACE: Dict[str, Any] = {
    "gnn_type": Choice(["gat", "transformer"]),
    "gnn_hidden": QRandInt(64, 512, q=64),
    "gnn_layers": QRandInt(2, 8),
    "gnn_dropout": Uniform(0.0, 0.6),
    "gnn_heads": Choice([1, 2, 4, 8]),
    "gnn_concat": Choice([True, False]),
    "graph_type": Choice(["grid", "knn"]),
    "k_neighbors": Choice([4, 8, 12, 16]),
    "connect_diagonals": Choice([True, False]),
    "att_dim": QRandInt(64, 512, q=64),
    "att_heads": Choice([1, 2, 4]),
    "pool_dropout": Uniform(0.0, 0.6),
    "classifier_dim": Choice([64, 128, 256]),
    "classifier_light": Choice([True, False]),
    "use_residual": Choice([True, False]),
    "use_layer_norm": Choice([True, False]),
    "optimizer": Choice(["adam", "adamw"]),
    "lr": LogUniform(1e-6, 1e-3),
    "weight_decay": LogUniform(1e-6, 1e-3),
}
