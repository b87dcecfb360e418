"""Device mesh construction and sharding helpers.

This is the build's distributed-communication slot (SURVEY.md §2.3): the
reference has no comm backend at all (single CUDA device; Ray object store for
HPO IPC only).  Here parallelism is expressed as shardings over a
``jax.sharding.Mesh`` and XLA inserts the collectives — gradient reductions
ride ICI within a slice; nothing in model code names a transport.

Axes: ``data`` (batch / DP all-reduce) and ``model`` (reserved for tensor
parallelism; unused at reference scale but kept first-class so enabling TP is
a mesh-shape change, not a redesign).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int = -1, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(data, model)`` mesh.  ``n_data=-1`` uses all remaining
    devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        if len(devices) % n_model:
            raise ValueError(f"{len(devices)} devices not divisible by model={n_model}")
        n_data = len(devices) // n_model
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-sharded over
    ``data``.  Leading dims must divide the data-axis size (callers pad)."""
    def place(x):
        return jax.device_put(x, data_sharding(mesh, ndim=np.ndim(x)))
    return jax.tree_util.tree_map(place, batch)
