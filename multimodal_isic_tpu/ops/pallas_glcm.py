"""Pallas TPU kernel: gray-level co-occurrence matrices on masked ROIs.

The BASELINE.json north-star kernel.  The XLA formulation
(``texture.glcm_matrices``) materializes a [H·W, NG] float one-hot per angle
in HBM (~50 MB per 450² image) and runs 8 separate contractions; here XLA
only prepares ONE compact [P, 8] int tile stream (center + the 4 neighbor
values with pair validity folded in — ~7 MB at 450²), and the kernel builds
bf16 one-hot tiles on the fly in VMEM and contracts ALL FOUR angles in a
single MXU call per grid step.

Round-2 redesign (the r1 kernel measured 0.97× XLA):
- one packed [BLK, 8] input block instead of five [BLK, 1] columns — one DMA
  per step and an 8-lane-dense layout instead of five 1-lane buffers;
- the four per-angle [NG,BLK]×[BLK,NG] matmuls fuse into one
  [4·NG, BLK]×[BLK, 128] contraction (M=256, N=128, K=BLK — full MXU tiles
  instead of quarter-height 64×64 products);
- one-hots are bf16 (exact for 0/1) with a float32 accumulator.

Layout notes: levels are 0 outside the ROI and 1..NG inside; a zero level
yields an all-zero one-hot row, so masking is free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .texture import ANGLES_2D, NG

BLK = 8192   # pixels per grid step (on lanes)
LANES = 128  # center one-hot padded to full sublane width


def _glcm_kernel(cols_ref, out_ref, acc_ref):
    """cols [8, BLK] — PIXELS ON LANES: row 0 = center level, rows 1..4 =
    neighbor levels (0 = invalid pair).  One-hots are built TRANSPOSED
    ([level, pixel]) by comparing each level row against a sublane iota, so
    no buffer ever carries a sub-128 lane dim; the single MXU contraction
    runs over the lane (pixel) axis.  acc [4·NG, LANES]: rows a·NG+g_nbr,
    cols g_center."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sub_c = jax.lax.broadcasted_iota(jnp.int32, (LANES, BLK), 0)
    sub_n = jax.lax.broadcasted_iota(jnp.int32, (NG, BLK), 0)
    a_t = (cols_ref[0:1, :] - 1 == sub_c).astype(jnp.bfloat16)  # [128, BLK]
    b_t = jnp.concatenate(
        [(cols_ref[s + 1:s + 2, :] - 1 == sub_n).astype(jnp.bfloat16)
         for s in range(4)], axis=0)                             # [4·NG, BLK]
    acc_ref[:] += jax.lax.dot_general(
        b_t, a_t, dimension_numbers=(((1,), (1,)), ((), ())),
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

    cols = jnp.stack([lv.reshape(-1)]
                     + [c.reshape(-1) for c in _neighbor_columns(lv)], axis=0)
    cols = jnp.pad(cols, ((0, 3), (0, n_pad - n)))  # [8, n_pad], pixel-major

    acc = pl.pallas_call(
        _glcm_kernel,
        grid=(n_pad // BLK,),
        out_shape=jax.ShapeDtypeStruct((4 * NG, LANES), jnp.float32),
        in_specs=[pl.BlockSpec((8, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4 * NG, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4 * NG, LANES), jnp.float32)],
        interpret=interpret,
    )(cols)
    # acc[a·NG + g_nbr, g_center] → [4, NG(center), NG(nbr)]
    mats = acc.reshape(4, NG, LANES)[:, :, :NG].transpose(0, 2, 1)
    return mats + mats.transpose(0, 2, 1)  # symmetrical GLCM
