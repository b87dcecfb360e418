"""Pallas TPU kernel: GLRLM run bookkeeping for all four angles, VMEM-resident.

The run-length matrices need, per angle, each run-START cell's gray level and
run length (``texture.run_starts_and_lengths``).  The XLA formulation is a
chain of ~15 shift/min ops per angle over the [H, W] map in HBM — measured
~3 ms per whole-map op at [16, 450, 600], it dominates the GLRLM class.  This
kernel keeps the map in VMEM (same machinery as ``pallas_cc``): run starts and
ends from neighbor comparisons, the first-end-at-or-after position by doubling
reverse-cummin along the run direction (shifting along an angle's offset stays
on the same line), all four angles unrolled in ONE kernel invocation.

Output packs (start, gray, length) into one int32 per cell per angle:
``start << 18 | gray << 11 | length`` — gray ≤ NG = 64 (7 bits), length ≤
line length ≤ max(H, W) < 2048 (11 bits).  The histogram stays in
``pallas_hist.joint_histogram_pallas``.

Matches ``texture.run_starts_and_lengths`` exactly (interpret-mode and
on-chip equivalence tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .texture import ANGLES_2D

LEN_BITS = 11
GRAY_SHIFT = LEN_BITS
START_SHIFT = LEN_BITS + 7


def _shift(x, dy: int, dx: int, fill, rows, cols, hp: int, wp: int):
    out = x
    if dy != 0:
        out = jnp.roll(out, dy, axis=0)
        if dy > 0:
            out = jnp.where(rows < dy, fill, out)
        else:
            out = jnp.where(rows >= hp + dy, fill, out)
    if dx != 0:
        out = jnp.roll(out, dx, axis=1)
        if dx > 0:
            out = jnp.where(cols < dx, fill, out)
        else:
            out = jnp.where(cols >= wp + dx, fill, out)
    return out


def _runs_kernel(lv_ref, ins_ref, out_ref):
    lv = lv_ref[:]
    ins = ins_ref[:]  # int32 0/1 (i1 vectors don't shift on Mosaic)
    hp, wp = lv.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    one = jnp.int32(1)
    big = jnp.int32(hp + wp)

    def sh(x, dy, dx, fill):
        return _shift(x, dy, dx, fill, rows, cols, hp, wp)

    for a, (dy, dx) in enumerate(ANGLES_2D):
        prev_lv = sh(lv, dy, dx, jnp.int32(-1))
        prev_in = sh(ins, dy, dx, jnp.int32(0))
        start = (ins == one) & ((prev_in == 0) | (lv != prev_lv))
        next_lv = sh(lv, -dy, -dx, jnp.int32(-1))
        next_in = sh(ins, -dy, -dx, jnp.int32(0))
        is_end = (ins == one) & ((next_in == 0) | (lv != next_lv))

        t = rows if dy != 0 else cols
        span = hp if dy != 0 else wp
        end_t = jnp.where(is_end, t, big)
        k = 1
        while k < span:
            end_t = jnp.minimum(end_t, sh(end_t, -dy * k, -dx * k, big))
            k <<= 1
        length = jnp.clip(end_t - t + 1, 0, (1 << LEN_BITS) - 1)
        packed = (jnp.where(start, one << START_SHIFT, 0)
                  | (lv << GRAY_SHIFT) | length)
        out_ref[a] = jnp.where(ins == one, packed, jnp.int32(0))


@partial(jax.jit, static_argnames=("interpret",))
def glrlm_runs_pallas(levels: jnp.ndarray, inside: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """[H, W] levels (1..NG, 0 outside) + bool inside → packed [4, H, W]
    int32 run bookkeeping (see module docstring for the bit layout)."""
    h, w = levels.shape
    # packed-run layout invariants: 11 length bits (runs < 2048) and 7 gray
    # bits (levels <= 127) — fail loudly rather than corrupt features
    assert h < (1 << LEN_BITS) and w < (1 << LEN_BITS), (
        f"glrlm_runs_pallas packs run lengths into {LEN_BITS} bits; "
        f"{h}x{w} images can have longer runs")
    from .texture import NG as _NG
    assert _NG <= 127, f"gray levels must fit 7 bits, NG={_NG}"
    hp = ((h + 7) // 8) * 8
    wp = ((w + 127) // 128) * 128
    lv = jnp.pad(levels.astype(jnp.int32), ((0, hp - h), (0, wp - w)),
                 constant_values=-1)
    ins = jnp.pad(inside.astype(jnp.int32), ((0, hp - h), (0, wp - w)))
    out = pl.pallas_call(
        _runs_kernel,
        out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lv, ins)
    return out[:, :h, :w]


def unpack_runs(packed: jnp.ndarray):
    """packed [..., H, W] → (start bool, gray int32, length int32)."""
    start = (packed >> START_SHIFT) > 0
    gray = (packed >> GRAY_SHIFT) & 0x7F
    length = packed & ((1 << LEN_BITS) - 1)
    return start, gray, length
