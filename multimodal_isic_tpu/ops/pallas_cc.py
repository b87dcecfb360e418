"""Pallas TPU kernel: same-gray 8-connected components, VMEM-resident.

The GLSZM zone labeling (pyradiomics ``_cmatrices`` flood fill,
``RadiomicExtractor.py:38-48`` via the glszm feature class) is the most
expensive radiomics primitive on TPU when written against XLA: union-find
style hooking needs per-element gather/scatter over the H·W label table, and
TPU scatters execute near-serially (~160 ms per 16 maps per hooking round at
450×600).

This kernel keeps the WHOLE map in VMEM and uses only vector ops:

- per-sweep, labels are min-reduced along every horizontal run and every
  vertical run with segmented Hillis–Steele doubling (shift-by-2^k + same-run
  connectivity masks — no gather), then min-hopped across the 8 neighbor
  offsets once (diagonal links);
- sweeps repeat under ``lax.while_loop`` until NO label changes.  Every stage
  is elementwise-decreasing, so an unchanged sweep means the 8-neighbor min
  is at a fixed point: labels are constant on every 8-connected same-level
  component and equal to the component's minimum linear index — the exact
  result, not an approximation.  ``max_sweeps`` is a safety bound only
  (geodesic propagation converges in ~tens of sweeps on real lesion maps;
  each sweep is ~100 µs of pure VPU work).

Matches ``ops.texture_extra.connected_components`` exactly (tested in
interpret mode and on chip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(x, dy: int, dx: int, fill, rows, cols, hp: int, wp: int):
    """Shift x by (dy, dx) filling vacated cells — roll + iota masks (no
    scatter; ``.at[].set`` is not a vector op on TPU)."""
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


def _cc_kernel(lv_ref, ins_ref, out_ref, *, w_orig: int, big: int,
               max_sweeps: int):
    # connectivity masks live as int32 0/1 vectors: Mosaic cannot shift/store
    # i1 vectors ("unsupported target bitwidth for truncation"), so booleans
    # appear only as comparison predicates.
    lv = lv_ref[:]
    ins = ins_ref[:]  # int32 0/1
    hp, wp = lv.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    # linear index in UNPADDED coordinates: ordering matches the XLA
    # formulation (padded cells are never inside, so w_orig-based indices of
    # valid cells are exactly the reference labels)
    lin = rows * w_orig + cols
    big_i = jnp.int32(big)
    one = jnp.int32(1)

    def sh(x, dy, dx, fill):
        return _shift(x, dy, dx, fill, rows, cols, hp, wp)

    # same-run connectivity, computed once (levels are constant):
    # conn(dy, dx)[p] = neighbor p-(dy,dx) exists, is inside, same level.
    # lv is 1..NG inside, 0 outside ROI, -1 in padding — equality with the
    # (-2)-filled shift implies both cells are inside.
    def conn(dy, dx):
        return jnp.where((ins == one) & (sh(lv, dy, dx, jnp.int32(-2)) == lv),
                         one, jnp.int32(0))

    cl = conn(0, 1)    # left neighbor same run
    cr = conn(0, -1)   # right neighbor same run
    cu = conn(1, 0)    # upper neighbor same vertical run
    cd = conn(-1, 0)   # lower neighbor same vertical run

    def seg_reduce(lab, c_init, axis_dy, axis_dx, span):
        """Segmented doubling min along one direction: after ceil(log2(span))
        steps every cell holds the min over its run in that direction."""
        c = c_init
        k = 1
        while k < span:
            vs = sh(lab, axis_dy * k, axis_dx * k, big_i)
            cs = sh(c, axis_dy * k, axis_dx * k, jnp.int32(0))
            lab = jnp.minimum(lab, jnp.where(c == one, vs, big_i))
            c = c * cs
            k <<= 1
        return lab

    # only the 4 DIAGONAL hops are needed: orthogonal same-level neighbors
    # are by definition in the same horizontal/vertical run, which the line
    # reductions already make label-constant.  Diagonal connectivity is
    # recomputed per sweep rather than stored — 8 persistent [hp, wp] masks
    # overflowed the 16 MB VMEM budget.
    diag4 = ((-1, -1), (-1, 1), (1, -1), (1, 1))

    def sweep(lab):
        lab = seg_reduce(lab, cl, 0, 1, wp)    # prefix along rows
        lab = seg_reduce(lab, cr, 0, -1, wp)   # suffix along rows
        lab = seg_reduce(lab, cu, 1, 0, hp)    # prefix along cols
        lab = seg_reduce(lab, cd, -1, 0, hp)   # suffix along cols
        for dy, dx in diag4:                   # one diagonal hop
            lab = jnp.where(conn(dy, dx) == one,
                            jnp.minimum(lab, sh(lab, dy, dx, big_i)), lab)
        return lab

    def body(carry):
        lab, _, i = carry
        new = sweep(lab)
        changed = jnp.sum(jnp.where(new != lab, one, jnp.int32(0)))
        return new, changed, i + 1

    def cond(carry):
        _, changed, i = carry
        return (changed > 0) & (i < max_sweeps)

    lab0 = jnp.where(ins == one, lin, big_i)
    lab, _, _ = jax.lax.while_loop(cond, body, (lab0, one, jnp.int32(0)))
    out_ref[:] = jnp.where(ins == one, lab, big_i)


@partial(jax.jit, static_argnames=("max_sweeps", "interpret"))
def connected_components_pallas(levels: jnp.ndarray, inside: jnp.ndarray,
                                max_sweeps: int = 1024,
                                interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ``texture_extra.connected_components``: [H, W] int32
    levels + bool inside → per-pixel min-linear-index component label
    (H·W outside the ROI)."""
    h, w = levels.shape
    hp = ((h + 7) // 8) * 8
    wp = ((w + 127) // 128) * 128
    lv = jnp.pad(levels.astype(jnp.int32), ((0, hp - h), (0, wp - w)),
                 constant_values=-1)
    ins = jnp.pad(inside.astype(jnp.int32), ((0, hp - h), (0, wp - w)))
    out = pl.pallas_call(
        partial(_cc_kernel, w_orig=w, big=h * w, max_sweeps=max_sweeps),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lv, ins)
    return out[:h, :w]
