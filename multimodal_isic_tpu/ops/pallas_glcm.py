"""Pallas TPU kernel: gray-level co-occurrence matrices on masked ROIs.

The BASELINE.json north-star kernel.  The XLA formulation
(``texture.glcm_matrices``) materializes a [H·W, NG] float one-hot per angle
in HBM (~50 MB per 450² image) and runs 8 separate contractions; here XLA
only prepares five compact int columns (center + the 4 neighbor values with
pair validity folded in — ~4 MB), and the kernel builds one-hot tiles on the
fly in VMEM (broadcast-compare against an NG iota) and accumulates all four
angles' co-occurrence counts on the MXU across a single grid sweep.

Layout notes: levels are 0 outside the ROI and 1..NG inside; a zero level
yields an all-zero one-hot row, so masking is free.  Tiles are [BLK, 1]
columns — sublane-aligned loads with the one-hot's NG on the lane dim.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .texture import ANGLES_2D, NG

BLK = 2048  # pixels per grid step


def _one_hot(col_ref, rows: int) -> jnp.ndarray:
    """[BLK, 1] int levels → [BLK, NG] float one-hot (level 0 → zero row)."""
    lv = col_ref[:]  # [BLK, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, NG), 1)
    return (lv - 1 == cols).astype(jnp.float32)


def _glcm_kernel(center_ref, n0_ref, n1_ref, n2_ref, n3_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = _one_hot(center_ref, BLK)
    for slot, nbr_ref in enumerate((n0_ref, n1_ref, n2_ref, n3_ref)):
        b = _one_hot(nbr_ref, BLK)
        acc_ref[pl.ds(slot * NG, NG), :] += jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _neighbor_columns(lv: jnp.ndarray) -> list:
    """Shifted neighbor levels with pair validity folded in (0 = no pair)."""
    h, w = lv.shape
    cols = []
    for dy, dx in ANGLES_2D:
        nbr = jnp.roll(jnp.roll(lv, -dy, axis=0), -dx, axis=1)
        valid = jnp.ones((h, w), bool)
        if dy > 0:
            valid = valid.at[h - dy:, :].set(False)
        if dx > 0:
            valid = valid.at[:, w - dx:].set(False)
        elif dx < 0:
            valid = valid.at[:, :-dx].set(False)
        cols.append(jnp.where((lv > 0) & valid, nbr, 0))
    return cols


@partial(jax.jit, static_argnames=("interpret",))
def glcm_matrices_pallas(levels: jnp.ndarray, mask: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ``texture.glcm_matrices`` → [4, NG, NG]
    symmetric co-occurrence counts."""
    h, w = levels.shape
    lv = jnp.where(mask > 0, levels, 0).astype(jnp.int32)
    n = h * w
    n_pad = ((n + BLK - 1) // BLK) * BLK

    def column(x):
        return jnp.pad(x.reshape(-1), (0, n_pad - n)).reshape(n_pad, 1)

    center = column(lv)
    nbrs = [column(c) for c in _neighbor_columns(lv)]

    spec = pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    flat = pl.pallas_call(
        _glcm_kernel,
        grid=(n_pad // BLK,),
        out_shape=jax.ShapeDtypeStruct((4 * NG, NG), jnp.float32),
        in_specs=[spec] * 5,
        out_specs=pl.BlockSpec((4 * NG, NG), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4 * NG, NG), jnp.float32)],
        interpret=interpret,
    )(center, *nbrs)
    mats = flat.reshape(4, NG, NG)
    return mats + mats.transpose(0, 2, 1)  # symmetrical GLCM
