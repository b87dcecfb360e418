"""Fused ConvBlock FIRST half (LN → 1×1 → mask → depthwise-5×5 → GELU → 1×1
→ residual) Pallas kernel.

Motivation: after r3's ``fused_ln_mlp`` took ConvBlock's second half to one
kernel (+10% train, +13.5% forward), the remaining trace-identified hot ops
in the ConvMAE train step are the FIRST half's 1×1 conv matmuls and the
tensors between them (VERDICT r4 #7; reference hot loop
``train_ae.py:163-175`` via its external ConvMAE conv blocks).  XLA cannot
fuse conv→conv, so the chain LN → Conv_0 → keep-mask → depthwise-5×5 →
GELU → Conv_2 → residual (``models/convmae.py::ConvBlock``) round-trips five
[B·H·W, C] tensors through HBM.  This kernel reads x once and writes the
residual sum once; everything between lives in VMEM.

Schedule: grid ``(B, row_tiles)``.  The input image (and keep mask) arrive
host-padded by the depthwise halo (2 rows of zeros top/bottom), stay
VMEM-resident across their row tiles, and each grid step computes ``t``
output rows from a ``t+4``-row slice: LN and the first matmul are recomputed
on the 2-row halo (cheap), halo rows outside the real image are masked to
zero after the first matmul (exactly the SAME-padding zeros the unfused
depthwise sees), the 5×5 depthwise runs as 25 shifted multiply-accumulates
in f32 over the VMEM slice, and the second matmul lands on the MXU directly
from the GELU output.

Numerics match the model's bf16 path: f32 LN stats, f32 MXU accumulation
with bias in f32 then cast (as ``fused_ln_mlp``), depthwise products
accumulated in f32 with the bias added in the compute dtype (as
``DepthwiseConv``), exact-erf GELU.

Backward is recompute-based ``jax.vjp`` over the XLA reference — exact
gradients, no stored intermediates.

MEASURED NEGATIVE (r5, ConvMAE-base bf16 bs=64 on v5e, loss match 4e-6):
forward 1898 → 1797 img/s (0.95×), train 718 → 620 img/s (0.86×), identical
at row tiles t=14 and t=28.  Unlike the second half (``fused_ln_mlp``, +10%
train), the first half's matmuls are square C→C (no 4× expansion), so the
HBM bytes the kernel saves are ~3× smaller, while it still pays the
pallas-boundary fusion breaks, the in-kernel VPU depthwise (the same
arithmetic floor the r4 MBConv study measured XLA already sitting at), and
the k-row halo recompute; the recompute-vjp backward then re-runs the whole
block once more.  Same conclusion as the serving study: fusing past a
depthwise on TPU needs a different depthwise algorithm, not a fused
schedule.  The flag stays as a tested, numerics-proven A/B option
(``ConvMAE(use_fused_front=True)``), default OFF.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_mlp import _gelu_exact, _ln_rows


def _front_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, wd_ref, bd_ref,
                  w2_ref, b2_ref, keep_ref, o_ref, *, eps: float, t: int,
                  h: int, w: int, has_keep: bool):
    dt = x_ref.dtype
    c = x_ref.shape[-1]
    i = pl.program_id(1)

    # t+4-row halo'd slice of the (host-padded) resident image
    blk = x_ref[0, pl.ds(i * t, t + 4)]                 # [t+4, w, c]
    m = (t + 4) * w
    xf = blk.reshape(m, c).astype(jnp.float32)
    y = _ln_rows(xf, ls_ref[:].astype(jnp.float32),
                 lb_ref[:].astype(jnp.float32), eps).astype(dt)
    h1 = (jax.lax.dot_general(
        y, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + b1_ref[:].astype(jnp.float32)).astype(dt)     # [m, c]

    # keep-mask and halo masking happen in the [t+4, w, c] layout: the lane
    # dim (c) stays put, so no Mosaic shape casts (a (m, 1) reshape of the
    # (t+4, w) keep slice moves lanes to sublanes — unsupported)
    img = h1.reshape(t + 4, w, c)
    if has_keep:
        img = img * keep_ref[0, pl.ds(i * t, t + 4)].astype(dt)  # [t+4,w,1]
    # zero the halo rows that lie outside the real image: the unfused
    # depthwise sees SAME-padding zeros there, not LN(0)-propagated values
    row = jax.lax.broadcasted_iota(jnp.int32, (t + 4, w, c), 0)
    real = i * t + row - 2
    img = jnp.where((real >= 0) & (real < h), img, jnp.zeros_like(img))
    imgp = jnp.pad(img, ((0, 0), (2, 2), (0, 0)))       # W-axis SAME pad
    acc = jnp.zeros((t, w, c), jnp.float32)
    for ky in range(5):
        for kx in range(5):
            tap = imgp[ky:ky + t, kx:kx + w].astype(jnp.float32)
            acc = acc + tap * wd_ref[ky * 5 + kx].astype(jnp.float32)
    d = acc.astype(dt) + bd_ref[:].astype(dt)           # DepthwiseConv bias
    g = _gelu_exact(d).reshape(t * w, c)
    out = (jax.lax.dot_general(
        g, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + b2_ref[:].astype(jnp.float32)).astype(dt)
    resid = x_ref[0, pl.ds(i * t + 2, t)].reshape(t * w, c)
    o_ref[0] = (resid + out).reshape(t, w, c)


def _pick_t(h: int) -> int:
    # biggest divisor tile whose f32 working set stays well inside VMEM —
    # small tiles lose to grid overhead (r5 measured t=14 at 0.88×)
    for t in (28, 16, 14, 8, 7, 4, 2, 1):
        if h % t == 0:
            return t
    return 1


def _reference_front(x, ls, lb, w1, b1, wd, bd, w2, b2, keep, eps=1e-6):
    """XLA twin of the kernel (ConvBlock's own math, used for the backward
    and as the tests' oracle)."""
    from .depthwise import depthwise_conv2d
    dt = x.dtype
    b_, h_, w_, c = x.shape
    xf = x.reshape(-1, c).astype(jnp.float32)
    y = _ln_rows(xf, ls.astype(jnp.float32), lb.astype(jnp.float32),
                 eps).astype(dt)
    h1 = (jnp.dot(y, w1, preferred_element_type=jnp.float32)
          + b1.astype(jnp.float32)).astype(dt)
    h1 = h1.reshape(b_, h_, w_, c)
    if keep is not None:
        h1 = h1 * keep.astype(dt)
    d = depthwise_conv2d(h1, wd.reshape(5, 5, 1, c).astype(dt),
                         padding="SAME") + bd.astype(dt)
    g = jax.nn.gelu(d, approximate=False).reshape(-1, c)
    out = (jnp.dot(g, w2, preferred_element_type=jnp.float32)
           + b2.astype(jnp.float32)).astype(dt)
    return x + out.reshape(x.shape)


def _fused_forward(x, ls, lb, w1, b1, wd, bd, w2, b2, keep, eps: float,
                   interpret: bool):
    b_, h_, w_, c = x.shape
    assert c % 128 == 0, f"fused_front needs lane-aligned C, got {c}"
    assert wd.shape[:2] == (5, 5)
    t = _pick_t(h_)
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))   # row halo
    has_keep = keep is not None
    if has_keep:
        keepp = jnp.pad(keep.reshape(b_, h_, w_, 1),
                        ((0, 0), (2, 2), (0, 0), (0, 0)))
    else:  # dummy operand keeps one kernel signature
        keepp = jnp.zeros((b_, 1, w_, 1), x.dtype)
    out = pl.pallas_call(
        functools.partial(_front_kernel, eps=eps, t=t, h=h_, w=w_,
                          has_keep=has_keep),
        grid=(b_, h_ // t),
        in_specs=[
            pl.BlockSpec((1, h_ + 4, w_, c), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda b, i: (0, 0)),
            pl.BlockSpec((1, c), lambda b, i: (0, 0)),
            pl.BlockSpec((c, c), lambda b, i: (0, 0)),      # resident
            pl.BlockSpec((1, c), lambda b, i: (0, 0)),
            pl.BlockSpec((25, c), lambda b, i: (0, 0)),
            pl.BlockSpec((1, c), lambda b, i: (0, 0)),
            pl.BlockSpec((c, c), lambda b, i: (0, 0)),      # resident
            pl.BlockSpec((1, c), lambda b, i: (0, 0)),
            pl.BlockSpec((1, h_ + 4 if has_keep else 1, w_, 1),
                         lambda b, i: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, w_, c), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_, h_, w_, c), x.dtype),
        interpret=interpret,
    )(xp, ls.reshape(1, c), lb.reshape(1, c), w1, b1.reshape(1, c),
      wd.reshape(25, c), bd.reshape(1, c), w2, b2.reshape(1, c), keepp)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_front(x, ls, lb, w1, b1, wd, bd, w2, b2, keep=None,
                eps: float = 1e-6, interpret: bool = False):
    """ConvBlock's first half in one kernel:
    ``x + conv1x1(gelu(dw5x5(keep * conv1x1(layernorm(x)))))``.

    x [B, H, W, C]; w1/w2 [C, C]; wd [5, 5, C] (depthwise taps); keep
    optional [B, H, W, 1] visibility mask (1 = visible)."""
    return _fused_forward(x, ls, lb, w1, b1, wd, bd, w2, b2, keep, eps,
                          interpret)


def _fwd(x, ls, lb, w1, b1, wd, bd, w2, b2, keep, eps, interpret):
    return (_fused_forward(x, ls, lb, w1, b1, wd, bd, w2, b2, keep, eps,
                           interpret),
            (x, ls, lb, w1, b1, wd, bd, w2, b2, keep))


def _bwd(eps, interpret, res, g):
    x, ls, lb, w1, b1, wd, bd, w2, b2, keep = res
    if keep is None:
        ref = lambda *a: _reference_front(*a, None, eps=eps)
        grads = jax.vjp(ref, x, ls, lb, w1, b1, wd, bd, w2, b2)[1](g)
        return grads + (None,)
    ref = functools.partial(_reference_front, eps=eps)
    return jax.vjp(ref, x, ls, lb, w1, b1, wd, bd, w2, b2, keep)[1](g)


fused_front.defvjp(_fwd, _bwd)
