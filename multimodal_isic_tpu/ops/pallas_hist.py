"""Pallas TPU kernels: joint histograms and first-order moment accumulation.

Completes the north-star kernel trio (first-order / GLCM / GLRLM — see
``pallas_glcm`` for the fused 4-angle GLCM):

- ``joint_histogram_pallas``: P[a-1, b-1] = Σ 𝟙[codes_a=a ∧ codes_b=b] via
  on-the-fly one-hot tiles contracted on the MXU — the building block behind
  the GLRLM (gray × run-length) matrix, replacing XLA scatter-add bincounts.
- ``firstorder_accumulate_pallas``: a two-phase sweep over the VMEM-resident
  ROI producing count/min/max, the discretized histogram and the centered
  moments Σ(x−μ)^{1..4} and Σ|x−μ| in one kernel (μ from phase 0's scratch;
  grid steps execute sequentially on TPU, so phase 1 sees phase 0's result).
  Percentile features still use an XLA sort; everything else assembles from
  this kernel's outputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .texture import NG

BLK = 2048


def _one_hot_rows(codes: jnp.ndarray, width: int) -> jnp.ndarray:
    """[BLK] int codes (1-based, 0 = invalid) → [width, BLK] one-hot."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (width, codes.shape[0]), 0)
    return (rows == codes[None, :] - 1).astype(jnp.float32)


def _one_hot_col(ref, rows: int, width: int) -> jnp.ndarray:
    lv = ref[:]  # [rows, 1] int32, 0 = invalid
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    return (lv - 1 == cols).astype(jnp.float32)


def _joint_hist_kernel(a_ref, b_ref, out_ref, acc_ref, *, nb: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # operands are [8, BLK] blocks (TPU needs the second-to-last block dim
    # divisible by 8; a [n, 1] column layout tiles to T(8,128) with the
    # trailing 1 padded to 128 lanes — a 128× HBM blowup on the forced
    # custom-call operand copy at large batch).  One MXU contraction per row
    # keeps the [nb, BLK] one-hot inside the VMEM budget.
    for r in range(8):
        a = _one_hot_rows(a_ref[r, :], acc_ref.shape[0])   # [na, BLK]
        b = _one_hot_rows(b_ref[r, :], nb)                 # [nb, BLK]
        acc_ref[:] += jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("na", "nb", "interpret"))
def joint_histogram_pallas(codes_a: jnp.ndarray, codes_b: jnp.ndarray,
                           na: int, nb: int,
                           interpret: bool = False) -> jnp.ndarray:
    """codes in 1..n (0 = skip), any shape → [na, nb] float counts."""
    a = codes_a.reshape(-1).astype(jnp.int32)
    b = codes_b.reshape(-1).astype(jnp.int32)
    n = a.shape[0]
    chunk = 8 * BLK
    n_pad = ((n + chunk - 1) // chunk) * chunk
    na_pad = ((na + 7) // 8) * 8
    nb_pad = ((nb + 127) // 128) * 128
    a = jnp.pad(a, (0, n_pad - n)).reshape(n_pad // BLK, BLK)
    b = jnp.pad(b, (0, n_pad - n)).reshape(n_pad // BLK, BLK)

    spec = pl.BlockSpec((8, BLK), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_joint_hist_kernel, nb=nb_pad),
        grid=(n_pad // chunk,),
        out_shape=jax.ShapeDtypeStruct((na_pad, nb_pad), jnp.float32),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((na_pad, nb_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((na_pad, nb_pad), jnp.float32)],
        interpret=interpret,
    )(a, b)
    return out[:na, :nb]


def glrlm_matrix_pallas(levels, inside, dy, dx, max_len: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas-backed GLRLM matrix for one angle: run detection stays XLA
    (reverse-cummin, scatter-free), the (gray × length) histogram runs on the
    MXU."""
    from .texture import run_starts_and_lengths
    start, gray, length = run_starts_and_lengths(levels, inside, dy, dx)
    g_codes = jnp.where(start, gray, 0)
    l_codes = jnp.where(start, jnp.clip(length, 1, max_len), 0)
    return joint_histogram_pallas(g_codes, l_codes, NG, max_len,
                                  interpret=interpret)


# ------------------------------------------------------------- first order

def _firstorder_kernel(x_ref, codes_ref, out_ref, acc_ref, *, ng_pad: int):
    """Grid (2, n_blocks): phase 0 accumulates n/Σx/min/max + histogram,
    phase 1 the centered sums.  acc layout (rows of [*, ng_pad]):
      row 0: [n, Σx, min, max, Σ(x−μ), Σ(x−μ)², Σ(x−μ)³, Σ(x−μ)⁴, Σ|x−μ|, …]
      row 1: histogram
    Mosaic forbids scalar VMEM stores, so the stats row is updated with
    lane-masked full-row vector ops (iota == slot selects the lane).
    """
    phase = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, ng_pad), 1)

    @pl.when((phase == 0) & (pl.program_id(1) == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        init = jnp.where(lane == 2, 3.4e38, 0.0) + jnp.where(lane == 3, -3.4e38, 0.0)
        acc_ref[0:1, :] = init.astype(jnp.float32)

    x = x_ref[:]           # [BLK, 1] — stay 2D: Mosaic 1D reductions are limited
    valid = codes_ref[:] > 0
    xv = jnp.where(valid, x, 0.0)

    @pl.when(phase == 0)
    def _():
        row = acc_ref[0:1, :]
        row = row + jnp.where(lane == 0, valid.astype(jnp.float32).sum(), 0.0)
        row = row + jnp.where(lane == 1, xv.sum(), 0.0)
        blk_min = jnp.min(jnp.where(valid, x, 3.4e38))
        blk_max = jnp.max(jnp.where(valid, x, -3.4e38))
        row = jnp.where(lane == 2, jnp.minimum(row, blk_min), row)
        row = jnp.where(lane == 3, jnp.maximum(row, blk_max), row)
        acc_ref[0:1, :] = row
        onehot = _one_hot_col(codes_ref, x_ref.shape[0], ng_pad)
        acc_ref[1:2, :] += onehot.sum(axis=0, keepdims=True)

    @pl.when(phase == 1)
    def _():
        row = acc_ref[0:1, :]
        total = jnp.sum(jnp.where(lane == 0, row, 0.0))
        sx = jnp.sum(jnp.where(lane == 1, row, 0.0))
        mu = sx / jnp.maximum(total, 1.0)
        c = jnp.where(valid, x - mu, 0.0)
        for slot, val in ((4, c.sum()), (5, (c ** 2).sum()), (6, (c ** 3).sum()),
                          (7, (c ** 4).sum()), (8, jnp.abs(c).sum())):
            row = row + jnp.where(lane == slot, val, 0.0)
        acc_ref[0:1, :] = row

    @pl.when((phase == 1) & (pl.program_id(1) == pl.num_programs(1) - 1))
    def _():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("interpret",))
def firstorder_accumulate_pallas(image: jnp.ndarray, levels: jnp.ndarray,
                                 interpret: bool = False):
    """→ (stats [9], hist [NG]): n, Σx, min, max, Σ(x−μ), Σ(x−μ)², Σ(x−μ)³,
    Σ(x−μ)⁴, Σ|x−μ| over the ROI (levels > 0), plus the discretized
    histogram — one pass-pair over the image."""
    x = image.reshape(-1).astype(jnp.float32)
    codes = levels.reshape(-1).astype(jnp.int32)
    n = x.shape[0]
    n_pad = ((n + BLK - 1) // BLK) * BLK
    x = jnp.pad(x, (0, n_pad - n)).reshape(n_pad, 1)
    codes = jnp.pad(codes, (0, n_pad - n)).reshape(n_pad, 1)
    ng_pad = ((NG + 127) // 128) * 128

    spec = pl.BlockSpec((BLK, 1), lambda p, i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_firstorder_kernel, ng_pad=ng_pad),
        grid=(2, n_pad // BLK),
        out_shape=jax.ShapeDtypeStruct((2, ng_pad), jnp.float32),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((2, ng_pad), lambda p, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, ng_pad), jnp.float32)],
        interpret=interpret,
    )(x, codes)
    return out[0, :9], out[1, :NG]
