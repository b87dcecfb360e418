"""Fused MBConv expand → depthwise → silu → SE-pool Pallas kernels (serving).

Motivation (r4 per-op trace of the BN-folded serving forward, bs=512): the
top ops are XLA mega-fusions of [expand 1×1 conv → silu → depthwise K×K →
silu → SE global pool] that run at only 7-16 TFLOP/s with 0% DMA stall —
the small-contraction expand matmul and the VPU depthwise serialize inside
one emitted loop.  Splitting them with an ``optimization_barrier``
(``EfficientNet.conv_fission``) LOSES 5.6% end-to-end: the expand output's
HBM round-trip costs more than the in-fusion recompute (measured r4
negative result, kept as an opt-in A/B flag).  These kernels get both
halves of the win instead: ``expand_dw_silu_pool`` computes the expand
matmul on the MXU directly into VMEM scratch (no HBM round-trip), runs the
depthwise chain [K×K depthwise + folded-BN bias + silu] over that scratch,
and emits the squeeze-excite global mean from the same pass as a [1, C]
f32 accumulator — x is read once and the silu output written once.
``dw_silu_pool`` is the expand-less variant for ``expand_ratio == 1``
blocks.

Grid layout: ``(batch, row_tiles)``.  The input image stays VMEM-resident
across its row tiles (the index map repeats the block, so pallas fetches it
once per image); each grid step computes ``T`` output rows, recomputing the
expand matmul for the ``(k-1)//2``-row halo (cheap) so the f32 depthwise
accumulator is bounded at ``[T, W, C]`` instead of ``[H, W, C]`` — the r4
whole-image variant OOMed scoped VMEM at 44.6 MB on the 190² stage-1 blocks
because the lane dim pads 24 → 128.  ``pick_row_tile_*`` model the REAL
VMEM working set (sublane/lane padding to the (8|16, 128) tile, double
buffering, the f32 accumulator and expand temporaries) and return the
largest row tile that fits, or None → the block keeps the XLA path
(``MBConv`` dispatches per block at trace time).  Stride-2 blocks and the
190² stage-1 blocks (whose resident input alone exceeds VMEM) stay on XLA.
Forward-only by design — the training graph keeps XLA's conv fusions (r3
measured them bandwidth-bound already).  Matches the reference backbone's
MBConv stage (`efficientnet_pytorch` ``_expand_conv → _bn0 → swish →
_depthwise_conv → _bn1 → swish → SE pool``, used at reference
``model.py:58``).

Numerics: taps multiply in bf16 (the serving compute dtype), accumulate in
f32, bias-add and silu in f32, output cast back to the compute dtype; the
pool accumulates the POST-silu activations in f32 — all exactly the unfused
graph's rounding structure.

MEASURED NEGATIVE (r4, bs=512 bf16 folded serving, B3@380): end-to-end
0.49× — every fused block is SLOWER than XLA's mega-fusion of the same
chain (per-block trace, ms per step):

    block      geometry            XLA    pallas-total  pallas-kernel
    3/4        95²  c192 k3 t=5   10.6         37.6          22.8
    6/7        48²  c288 k5 t=24   8.4         31.9          26.8
    9-12       24²  c576 k3        1.9          5.3           3.2
    14-17      24²  c816 k5        6.8         11.8           8.7
    19-23      12²  c1392 k5       2.9          5.5           4.1

Why: the depthwise tap loop is VPU f32 multiply-accumulate at ~k²·T·W·C
FLOPs — the same algorithm XLA's conv emitter schedules, and XLA's
emitted loop already runs at or below this kernel's VPU arithmetic floor
(hoisting the k² sublane realignments to k changed nothing: 0.479→0.490×).
The fusion thesis fails because XLA's mega-fusion has 0% DMA stall (no
HBM round-trip to save) and does NOT pay a k²× expand recompute (its
7-16 TFLOP/s within-fusion rate already prices the expand once).  Beating
it would need a different depthwise ALGORITHM (MXU-friendly), not a fused
schedule of the same one.  Kept as an opt-in A/B flag
(``EfficientNet.pallas_serving``) with equivalence tests; the serving
default stays on the XLA path, like ``conv_fission`` (0.944×, same
conclusion from the fission side).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-step VMEM budget (bytes) for a kernel's modeled working set.  The
# chip has 16 MB/core of scoped VMEM (the r4 OOM message states the limit);
# 13 MB leaves headroom for Mosaic's unrolled-tap temporaries, spills and
# semaphores beyond what the model below counts.
VMEM_BUDGET = 13 * 1024 * 1024


def _pad_wc(w: int, c: int, dtype) -> int:
    """Padded element count of the last-two-dims (sublane, lane) plane: the
    TPU tiles arrays as (8, 128) f32 / (16, 128) bf16, so W rounds up to the
    sublane count and C to 128 lanes."""
    sub = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    return -(-w // sub) * sub * (-(-c // 128) * 128)


def _divisors_desc(n: int):
    return sorted((d for d in range(1, n + 1) if n % d == 0), reverse=True)


def pick_row_tile_dw(h: int, w: int, c: int, k: int, stride: int,
                     dtype) -> int | None:
    """Largest row tile T (a divisor of h) whose working set fits
    VMEM_BUDGET for the expand-less kernel, or None.  Working set: resident
    padded input [h+2p, W, C] ×2 (double-buffered across images), output
    tile [T, W, C] ×2, halo scratch [T+2p, W+2p, C], f32 accumulator
    [T, W, C] ×2 (acc + one Mosaic temporary), weights."""
    if stride != 1:
        return None
    isz = jnp.dtype(dtype).itemsize
    pad = (k - 1) // 2
    x_res = (h + 2 * pad) * _pad_wc(w, c, dtype) * isz * 2
    weights = k * k * _pad_wc(1, c, dtype) * isz + _pad_wc(1, c, jnp.float32) * 4
    for t in _divisors_desc(h):
        y_io = t * _pad_wc(w, c, dtype) * isz * 2
        scratch = (t + 2 * pad) * _pad_wc(w + 2 * pad, c, dtype) * isz
        acc = t * _pad_wc(w, c, jnp.float32) * 4 * 2
        if x_res + y_io + scratch + acc + weights <= VMEM_BUDGET:
            return t
    return None


def pick_row_tile_expand_dw(h: int, w: int, cin: int, cmid: int, k: int,
                            stride: int, dtype) -> int | None:
    """Row tile for the combined expand+depthwise kernel (None → XLA path).
    Adds the f32 expand temporary [(T+2p)*W, Cmid] and the [Cin, Cmid]
    expand weight to the dw model; the resident input is [h+2p, W, Cin]."""
    if stride != 1:
        return None
    isz = jnp.dtype(dtype).itemsize
    pad = (k - 1) // 2
    x_res = (h + 2 * pad) * _pad_wc(w, cin, dtype) * isz * 2
    weights = (_pad_wc(cin, cmid, dtype) + k * k * _pad_wc(1, cmid, dtype)) \
        * isz + 2 * _pad_wc(1, cmid, jnp.float32) * 4
    for t in _divisors_desc(h):
        y_io = t * _pad_wc(w, cmid, dtype) * isz * 2
        scratch = (t + 2 * pad) * _pad_wc(w + 2 * pad, cmid, dtype) * isz
        acc = t * _pad_wc(w, cmid, jnp.float32) * 4 * 2
        e_tmp = _pad_wc((t + 2 * pad) * w, cmid, jnp.float32) * 4
        if x_res + y_io + scratch + acc + e_tmp + weights <= VMEM_BUDGET:
            return t
    return None


def _pad_rows(x: jnp.ndarray, pad: int, n_rows: int) -> jnp.ndarray:
    """Zero-pad the H dim to [pad | H | n_rows-H-pad] so every row tile's
    halo read is a fixed-size in-bounds slice."""
    b, h, w, c = x.shape
    return jnp.pad(x, ((0, 0), (pad, n_rows - h - pad), (0, 0), (0, 0)))


def _sublane(dtype) -> int:
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _dw_tile(mid_ref, wd_ref, bd_ref, y_ref, pool_ref, *, k: int, t: int,
             denom: float):
    """Shared tail: depthwise over the halo scratch → bias → silu → write
    the y tile and accumulate the f32 SE pool."""
    w_out = y_ref.shape[2]
    acc = jnp.zeros((t, w_out, y_ref.shape[3]), jnp.float32)
    # kx slices offset the SUBLANE dim (W) and cost a vector-realignment
    # copy each; hoisting them out of the ky loop pays k realignments
    # instead of k² (ky offsets live on the untiled row dim — free slices
    # of the loaded value).
    for kx in range(k):
        shifted = mid_ref[:, kx:kx + w_out, :].astype(jnp.float32)
        for ky in range(k):
            acc += shifted[ky:ky + t] * wd_ref[ky * k + kx, :].astype(
                jnp.float32)
    acc += bd_ref[0, :].astype(jnp.float32)
    act = acc * jax.nn.sigmoid(acc)  # silu in f32, like XLA's fused conv+silu
    y_ref[0] = act.astype(y_ref.dtype)
    # pool block is [1, 8, C]: Mosaic needs the sublane dim divisible by 8,
    # so the scalar-per-channel sum is broadcast over 8 rows (sliced outside)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        pool_ref[:] = jnp.zeros_like(pool_ref)

    pool_ref[0] += jnp.broadcast_to(
        (jnp.sum(act, axis=(0, 1)) * jnp.float32(denom))[None, :],
        pool_ref.shape[1:])


def _dw_kernel(x_ref, w_ref, b_ref, y_ref, pool_ref, xp_ref, *, k: int,
               t: int, denom: float):
    """One grid step = rows [t_idx*T, t_idx*T+T) of one image.  x (row-padded
    input) [1, H+2p, W, C] resident per image, w [k*k, C], b [1, C]; scratch
    xp [T+k-1, W+k-1, C] (SAME zero borders) → y tile [1, T, W, C]
    silu(dw+b), pool [1, 8, C] f32 running sum·denom."""
    w_img = y_ref.shape[2]
    pad = (k - 1) // 2
    t_idx = pl.program_id(1)

    # W borders stay zero across all grid steps; zero the scratch once
    @pl.when((pl.program_id(0) == 0) & (t_idx == 0))
    def _zero():
        xp_ref[:] = jnp.zeros_like(xp_ref)

    rows = t + 2 * pad
    xs = x_ref[0, pl.ds(t_idx * t, rows), :, :]
    # halo rows beyond the image are zero by construction (_pad_rows), so no
    # mask is needed: depthwise taps see the unfused graph's SAME zeros
    xp_ref[:, pad:pad + w_img, :] = xs
    _dw_tile(xp_ref, w_ref, b_ref, y_ref, pool_ref, k=k, t=t, denom=denom)


def _exp_dw_kernel(x_ref, we_ref, be_ref, wd_ref, bd_ref, y_ref, pool_ref,
                   mid_ref, *, k: int, t: int, h: int, w_img: int, ws: int,
                   denom: float):
    """Row-tiled expand variant: x arrives FLATTENED [1, (H+2p)*Ws, Cin]
    (rows zero-padded by p top/bottom, W zero-padded to the sublane multiple
    Ws) and resident per image; we [Cin, Cmid], be [1, Cmid], wd [k*k, Cmid],
    bd [1, Cmid]; scratch mid [T+k-1, Ws+k-1, Cmid] holds silu(expand) for
    the tile + halo (recomputed per tile — 2p rows of overlap, cheap on the
    MXU) → y tile, pool.

    The flat layout exists because Mosaic cannot reshape a (rows, W, Cin)
    vector with unaligned W into (rows·W, Cin) for the matmul (r4:
    "infer-vector-layout: unsupported shape cast" at W=95) — so the matmul
    runs on a 2D slice of the pre-flattened input (slice offsets are
    multiples of Ws, i.e. sublane-aligned) and the un-flatten is a per-row
    store loop into the 3D scratch, which needs no reshape at all."""
    dt = y_ref.dtype
    cin = x_ref.shape[2]
    cmid = y_ref.shape[3]
    pad = (k - 1) // 2
    t_idx = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (t_idx == 0))
    def _zero():
        mid_ref[:] = jnp.zeros_like(mid_ref)

    rows = t + 2 * pad
    xs = x_ref[0, pl.ds(t_idx * t * ws, rows * ws), :]
    # expand matmul on the MXU; silu in f32; cast to dt like the unfused
    # expand-conv output.  Halo rows / pad columns outside the image must
    # stay EXACTLY zero (the unfused graph pads AFTER expand+silu, and
    # silu(0 @ we + be) = silu(be) ≠ 0), hence the masks below.
    e = jax.lax.dot_general(xs, we_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    e += be_ref[0, :].astype(jnp.float32)
    e = e * jax.nn.sigmoid(e)
    col_ok = (jax.lax.broadcasted_iota(jnp.int32, (ws, 1), 0)
              < w_img).astype(jnp.float32)
    for i in range(rows):
        gi = t_idx * t - pad + i  # global image row of scratch row i
        row_ok = jnp.logical_and(gi >= 0, gi < h).astype(jnp.float32)
        mid_ref[i, pad:pad + ws, :] = (
            e[i * ws:(i + 1) * ws, :] * (row_ok * col_ok)).astype(dt)
    _dw_tile(mid_ref, wd_ref, bd_ref, y_ref, pool_ref, k=k, t=t, denom=denom)


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def dw_silu_pool(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 row_tile: int | None = None, interpret: bool = False):
    """Stride-1 SAME depthwise conv + bias + silu + global mean.

    x [B, H, W, C] (any float dtype), w [K, K, 1, C] (flax depthwise layout),
    b [C] → (y [B, H, W, C] in x.dtype, pool_mean [B, C] f32).
    ``pool_mean`` equals ``y.mean(axis=(1, 2))`` computed in f32 — the SE
    squeeze input — without the extra HBM read of y.  ``row_tile`` must
    divide H (default: ``pick_row_tile_dw``); SAME padding happens inside
    VMEM scratch (no host-graph ``jnp.pad`` HBM round-trip for W; the H halo
    is a one-off row pad so every tile's halo read is in-bounds).
    """
    bsz, h, ww, c = x.shape
    k = w.shape[0]
    pad = (k - 1) // 2
    t = row_tile if row_tile is not None else pick_row_tile_dw(
        h, ww, c, k, 1, x.dtype)
    if t is None or h % t:
        raise ValueError(f"row_tile {t} invalid for H={h}")
    nt = h // t
    xp = _pad_rows(x, pad, h + 2 * pad)
    wk = w.reshape(k * k, c).astype(x.dtype)
    y, pool = pl.pallas_call(
        functools.partial(_dw_kernel, k=k, t=t, denom=1.0 / (h * ww)),
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, h + 2 * pad, ww, c), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((k * k, c), lambda i, j: (0, 0)),   # resident
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, t, ww, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 8, c), lambda i, j: (i, 0, 0)),  # revisited
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, ww, c), x.dtype),
            jax.ShapeDtypeStruct((bsz, 8, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t + 2 * pad, ww + 2 * pad, c), x.dtype),
        ],
        interpret=interpret,
    )(xp, wk, b.reshape(1, c).astype(jnp.float32))
    return y, pool[:, 0, :]


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def expand_dw_silu_pool(x: jnp.ndarray, we: jnp.ndarray, be: jnp.ndarray,
                        wd: jnp.ndarray, bd: jnp.ndarray,
                        row_tile: int | None = None, interpret: bool = False):
    """silu(x @ we + be) → stride-1 SAME depthwise(wd) + bd → silu → pool.

    x [B, H, W, Cin], we [1, 1, Cin, Cmid] or [Cin, Cmid], be [Cmid],
    wd [K, K, 1, Cmid], bd [Cmid] → (y [B, H, W, Cmid] in x.dtype,
    pool_mean [B, Cmid] f32).  The [H, W, Cmid] expand intermediate exists
    only as per-tile VMEM scratch — never in HBM.  ``row_tile`` must divide
    H (default: ``pick_row_tile_expand_dw``).  The input is shipped to the
    kernel flattened to [B, (H+2p)·Ws, Cin] with W zero-padded to the
    sublane multiple Ws — one extra XLA pad+reshape of the (small) block
    input; see _exp_dw_kernel for why.
    """
    bsz, h, ww, cin = x.shape
    we2 = we.reshape(cin, -1)
    cmid = we2.shape[1]
    k = wd.shape[0]
    pad = (k - 1) // 2
    t = row_tile if row_tile is not None else pick_row_tile_expand_dw(
        h, ww, cin, cmid, k, 1, x.dtype)
    if t is None or h % t:
        raise ValueError(f"row_tile {t} invalid for H={h}")
    nt = h // t
    ws = -(-ww // _sublane(x.dtype)) * _sublane(x.dtype)
    hp = h + 2 * pad
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, ws - ww), (0, 0)))
    xp = xp.reshape(bsz, hp * ws, cin)
    wk = wd.reshape(k * k, cmid).astype(x.dtype)
    y, pool = pl.pallas_call(
        functools.partial(_exp_dw_kernel, k=k, t=t, h=h, w_img=ww, ws=ws,
                          denom=1.0 / (h * ww)),
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, hp * ws, cin), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((cin, cmid), lambda i, j: (0, 0)),   # resident
            pl.BlockSpec((1, cmid), lambda i, j: (0, 0)),
            pl.BlockSpec((k * k, cmid), lambda i, j: (0, 0)),  # resident
            pl.BlockSpec((1, cmid), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, t, ww, cmid), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 8, cmid), lambda i, j: (i, 0, 0)),  # revisited
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, ww, cmid), x.dtype),
            jax.ShapeDtypeStruct((bsz, 8, cmid), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t + 2 * pad, ws + 2 * pad, cmid), x.dtype),
        ],
        interpret=interpret,
    )(xp, we2.astype(x.dtype), be.reshape(1, cmid).astype(jnp.float32),
      wk, bd.reshape(1, cmid).astype(jnp.float32))
    return y, pool[:, 0, :]


def fits_pallas_dw(h: int, w: int, c: int, k: int, stride: int,
                   dtype) -> bool:
    """Dispatch rule for the expand-less kernel (see pick_row_tile_dw)."""
    return pick_row_tile_dw(h, w, c, k, stride, dtype) is not None


def fits_pallas_expand_dw(h: int, w: int, cin: int, cmid: int, k: int,
                          stride: int, dtype) -> bool:
    """Dispatch rule for the combined kernel (see
    pick_row_tile_expand_dw)."""
    return pick_row_tile_expand_dw(h, w, cin, cmid, k, stride, dtype) \
        is not None
