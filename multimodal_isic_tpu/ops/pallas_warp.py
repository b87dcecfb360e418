"""Gather-free batched affine image warp (bilinear, REFLECT_101) on the MXU.

Motivation (r5 fused-epoch measurement, BENCH_DISK.json + scripts/warp_ab.py):
the ShiftScaleRotate warp inside the fusion train policy is the last cost
between HBM-resident training (187.5 img/s) and the bare train step
(678 img/s).  Its TPU-natural formulation — a packed 4-tap row-gather
(``data/augment._warp_taps``) — costs 447 ms per 128×380² batch because the
TPU VPU has no hardware gather: XLA serializes 18.5 M tiny-row loads.

This kernel removes the gather entirely.  Bilinear interpolation is a
2-tap tent-weighted contraction per axis, and for an affine map the source
coordinates of one output row lie inside a narrow static band, so the warp
becomes dense linear algebra the MXU already knows how to run:

  for each output row r and 128-column block:
    vx[j]   = i11·x_j + i12·r + i13        (f32, exact coordinates)
    vy[j]   = i21·x_j + i22·r + i23
    S_band  = src[ky : ky+BY, kx : kx+BX]  (VMEM slice, band start from the
                                            block's corner coords)
    Wx[p,j] = max(0, 1 − |(kx+p) − vx_j|)  (tent weights built by iota —
                                            nonzero only at the 2 x-taps)
    T       = S_bandᵀ-contract: [BY, BX] @ [BX, 128] per channel   (MXU)
    Wy[q,j] = max(0, 1 − |(ky+q) − vy_j|)
    out[r,j]= Σ_q Wy[q,j]·T[q,j]           (VPU sublane reduce)

Because vx does not depend on the y-tap (the map is affine), this computes
EXACT direct bilinear interpolation — the same values as ``_warp_taps``
(tested, interpret mode), not the classic separable two-pass approximation.

REFLECT_101 borders are materialized once per batch by ``mirror_pad`` (the
XLA-side concat costs ~1 ms of HBM traffic); coordinates are then plain
affine and single-fold reflection is exact for overhangs ≤ ``pad``.

Numerics: coordinates and tent weights are computed in f32 (bf16 ULP at
coordinate scale is ~2 px), then weights and source are cast to
``compute_dtype`` (bf16 default: source intensities 0..255 are exact in
bf16; weight rounding contributes ≲0.4 % ≈ 1 intensity unit) and the
matmul accumulates in f32.  ``compute_dtype=float32`` gives ~1e-3-exact
values for the equivalence tests.

Validity domain (static band sizes; the band covers a whole 8×128 output
tile): |i11|·127 + |i12|·7 ≤ BX−128−3 (|i11| ≤ 1.93 at the default
BX=384) and |i21|·127 + |i22|·7 ≤ BY−8−3 (|i21| ≤ 0.35 at the default
BY=64 with |i22| ≤ 1.1) — the fusion policy's ShiftScaleRotate limits
(±15°, scale ±0.1 ⇒ |i21| ≤ 0.29, |i11| ≤ 1.17) sit inside with margin.
Forward-only by design: augmentation is never differentiated (like the
serving kernels in ``fused_dwconv.py``).

Mosaic compile note (r5, found by the real-TPU drive): the first version
unrolled (row × column-block) Python loops of dynamically-sliced loads —
24 bodies/step — which Mosaic could not compile in 15 min.  This layout
compiles in seconds: one grid step per output tile, one shared source
band, all 8 rows' tent weights packed as a [BX, 8·128] matmul operand.

Matches the reference's albumentations ShiftScaleRotate resampling
(reference ``main.py:76-87`` train pipeline); the semantics themselves are
tested against ``_warp_taps``, which is map_coordinates-golden.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mirror_pad(imgs: jnp.ndarray, pad: int) -> jnp.ndarray:
    """REFLECT_101-pad [B, H, W, C] by ``pad`` on every image edge.

    Row/col ``-k`` maps to ``k`` and ``n-1+k`` to ``n-1-k`` — exactly
    ``_mirror_coord``'s single fold, so warps with overhang ≤ pad are
    border-exact.  Requires pad ≤ min(H, W) − 1.
    """
    if pad >= min(imgs.shape[1], imgs.shape[2]):
        raise ValueError(f"pad {pad} needs > {pad} interior rows/cols")
    top = imgs[:, 1:pad + 1][:, ::-1]
    bot = imgs[:, -pad - 1:-1][:, ::-1]
    x = jnp.concatenate([top, imgs, bot], axis=1)
    left = x[:, :, 1:pad + 1][:, :, ::-1]
    right = x[:, :, -pad - 1:-1][:, :, ::-1]
    return jnp.concatenate([left, x, right], axis=2)


def _warp_kernel(inv_ref, src_ref, out_ref, *, row_block, band_y, band_x,
                 pad, compute_dtype):
    b = pl.program_id(0)
    rb = pl.program_id(1)
    sb = pl.program_id(2)
    i11 = inv_ref[b, 0]
    i12 = inv_ref[b, 1]
    i13 = inv_ref[b, 2] + pad
    i21 = inv_ref[b, 3]
    i22 = inv_ref[b, 4]
    i23 = inv_ref[b, 5] + pad

    c_dim, hp, wp = src_ref.shape[1], src_ref.shape[2], src_ref.shape[3]
    cols = row_block * 128
    # fused (row, lane) axis: column l of the weight operands is output
    # pixel (y = r0 + l>>7, x = x0 + (l&127)) — all row_block rows of the
    # tile ride ONE matmul per channel (Mosaic's tpu.iota is integer-only)
    l = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
    ox = (l & 127).astype(jnp.float32)
    oy = (l >> 7).astype(jnp.float32)
    iota_x = jax.lax.broadcasted_iota(
        jnp.int32, (band_x, cols), 0).astype(jnp.float32)
    iota_y = jax.lax.broadcasted_iota(
        jnp.int32, (band_y, cols), 0).astype(jnp.float32)

    x0 = (sb * 128).astype(jnp.float32)
    r0 = (rb * row_block).astype(jnp.float32)
    # band start from the tile's corner coordinates (affine ⇒ extrema at
    # corners), aligned down so the VMEM slice start stays on (8, 128)
    # tile boundaries — pl.multiple_of makes the alignment provable
    x1, y1 = x0 + 127.0, r0 + float(row_block - 1)
    vx_c = jnp.minimum(jnp.minimum(i11 * x0 + i12 * r0, i11 * x1 + i12 * r0),
                       jnp.minimum(i11 * x0 + i12 * y1, i11 * x1 + i12 * y1))
    vy_c = jnp.minimum(jnp.minimum(i21 * x0 + i22 * r0, i21 * x1 + i22 * r0),
                       jnp.minimum(i21 * x0 + i22 * y1, i21 * x1 + i22 * y1))
    kx_raw = jnp.floor(vx_c + i13).astype(jnp.int32) - 1
    ky_raw = jnp.floor(vy_c + i23).astype(jnp.int32) - 1
    kx = pl.multiple_of(
        jnp.clip((kx_raw // 128) * 128, 0, wp - band_x), 128)
    ky = pl.multiple_of(
        jnp.clip((ky_raw // 8) * 8, 0, hp - band_y), 8)

    vx = i11 * (x0 + ox) + i12 * (r0 + oy) + i13     # [1, cols] f32
    vy = i21 * (x0 + ox) + i22 * (r0 + oy) + i23
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(
        kx.astype(jnp.float32) + iota_x - vx)).astype(compute_dtype)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(
        ky.astype(jnp.float32) + iota_y - vy))

    # HIGHEST so f32 mode is genuinely f32 on the MXU (DEFAULT runs f32
    # matmuls as bf16 passes ⇒ ~1-intensity error, bf16-grade); bf16 mode
    # is unaffected
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    for c in range(c_dim):
        band = src_ref[0, c, pl.ds(ky, band_y), pl.ds(kx, band_x)]
        t = jnp.dot(band, wx, preferred_element_type=jnp.float32,
                    precision=prec)
        row = jnp.sum(t * wy, axis=0, keepdims=True)     # [1, cols]
        for r_in in range(row_block):
            out_ref[0, c, r_in, :] = row[0, r_in * 128:(r_in + 1) * 128]


@functools.partial(jax.jit, static_argnames=(
    "out_hw", "pad", "band_y", "band_x", "row_block", "compute_dtype",
    "interpret"))
def affine_warp_batch(imgs: jnp.ndarray, inv: jnp.ndarray,
                      out_hw=(380, 380), pad: int = 128, band_y: int = 64,
                      band_x: int = 384, row_block: int = 8,
                      compute_dtype=jnp.bfloat16,
                      interpret: bool = False) -> jnp.ndarray:
    """Warp [B, H, W, C] f32 by per-image inverse affines [B, 6] → [B, oh, ow, C].

    ``inv`` rows are (i11, i12, i13, i21, i22, i23) mapping OUTPUT pixel
    (x, y) to SOURCE coordinates sx = i11·x + i12·y + i13,
    sy = i21·x + i22·y + i23 — the matrix ``shift_scale_rotate`` builds.
    Values equal ``_warp_taps(…, order=1)`` for |sx−x|,|sy−y| overhang ≤ pad
    and rotations inside the band domain (see module docstring).
    """
    bsz, h, w, c = imgs.shape
    oh, ow = out_hw
    ohp = -(-oh // row_block) * row_block
    owp = -(-ow // 128) * 128
    n_sub = owp // 128

    x = mirror_pad(imgs, pad)                       # [B, H+2p, W+2p, C]
    hp = -(-x.shape[1] // 8) * 8
    wp = -(-x.shape[2] // 128) * 128
    x = jnp.pad(x, ((0, 0), (0, hp - x.shape[1]), (0, wp - x.shape[2]),
                    (0, 0)), mode="edge")
    x = jnp.moveaxis(x, -1, 1).astype(compute_dtype)  # [B, C, HP, WP] planes

    kernel = functools.partial(
        _warp_kernel, row_block=row_block, band_y=band_y, band_x=band_x,
        pad=float(pad), compute_dtype=compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, ohp // row_block, n_sub),
        in_specs=[pl.BlockSpec((1, c, hp, wp),
                               lambda b, rb, sb, *_: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, c, row_block, 128),
                               lambda b, rb, sb, *_: (b, 0, rb, sb)),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c, ohp, owp), jnp.float32),
        interpret=interpret,
    )(inv.astype(jnp.float32), x)
    return jnp.moveaxis(out, 1, -1)[:, :oh, :ow]
