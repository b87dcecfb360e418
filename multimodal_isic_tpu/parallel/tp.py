"""Tensor parallelism over the mesh's ``model`` axis, the GSPMD way.

The reference is single-device and needs no TP (SURVEY.md §2.3); this module
makes the build's reserved ``model`` axis real: ConvMAE's transformer blocks
are Megatron-partitioned by ANNOTATION ONLY — column-split the QKV and MLP
up-projections, row-split the attention output and MLP down-projections —
and XLA's SPMD partitioner inserts the all-reduces over ICI.  No model code
changes, no transport named: placing the params with these shardings is the
entire integration (the jitted train steps pick the layout up from their
inputs).

Constraint: 3·dim, mlp hidden and num_heads must divide the model-axis size.
Equivalence with the replicated layout is tested on the virtual CPU mesh
(`tests/test_parallel.py`).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import MODEL_AXIS

# path-suffix → PartitionSpec inside a transformer block (flax auto-names:
# Attention_0/Dense_0 = fused QKV, Dense_1 = output projection;
# Mlp_0/Dense_0 = up-projection, Dense_1 = down-projection)
_BLOCK_RULES = (
    ("Attention_0/Dense_0/kernel", P(None, MODEL_AXIS)),  # column (heads)
    ("Attention_0/Dense_0/bias", P(MODEL_AXIS)),
    ("Attention_0/Dense_1/kernel", P(MODEL_AXIS, None)),  # row (psum after)
    ("Mlp_0/Dense_0/kernel", P(None, MODEL_AXIS)),        # column (hidden)
    ("Mlp_0/Dense_0/bias", P(MODEL_AXIS)),
    ("Mlp_0/Dense_1/kernel", P(MODEL_AXIS, None)),        # row (psum after)
)
_BLOCK_PREFIXES = ("vit_", "dec_blocks_")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def megatron_spec(path) -> P:
    """PartitionSpec for one ConvMAE parameter path."""
    s = _path_str(path)
    if s.startswith(_BLOCK_PREFIXES):
        for suffix, spec in _BLOCK_RULES:
            if s.endswith(suffix):
                return spec
    return P()


def convmae_tp_shardings(params, mesh: Mesh):
    """NamedSharding pytree Megatron-partitioning ConvMAE's transformer
    blocks over ``model``; conv stages, embeddings and norms replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, megatron_spec(path)), params)


def place_tp(params, mesh: Mesh):
    """Commit a ConvMAE param tree to the mesh with the Megatron layout."""
    return jax.device_put(params, convmae_tp_shardings(params, mesh))
