"""Depthwise 2-D convolution with an efficient custom weight-gradient.

Both backbones use depthwise convolutions (EfficientNet's MBConv stage,
re-creating ``efficientnet_pytorch``'s ``_depthwise_conv`` used at reference
``model.py:58``; ConvMAE's 5×5 conv-stage filters).  XLA's autodiff rule for
a ``feature_group_count=C`` convolution materialises the FULL dense filter
gradient ``[K, K, C, C]`` and then masks it down to the block diagonal — for
B3's widest stage that is a ``[3, 3, 2304, 2304]`` (190M-element)
intermediate, ~C× more FLOPs and memory traffic than the depthwise weight
gradient actually needs.  This was measured dominating the backward pass on
the virtual CPU mesh (67 s/device/step) and wastes MXU/VPU cycles on TPU.

``depthwise_conv2d`` computes the identical forward via
``lax.conv_general_dilated`` but supplies a custom VJP:

- d/dx: XLA's own input-gradient rule (a grouped transposed conv — fine);
- d/dw: the theoretical-minimum formulation
  ``dw[ky,kx,c] = Σ_{b,oy,ox} x_pad[b, oy·s+ky, ox·s+kx, c] · dy[b,oy,ox,c]``
  as K² strided slices + elementwise multiply-reduce (f32 accumulation).

Backend selection (measured, r3): the K²-slice VJP wins big on the CPU
backend (the virtual multi-chip mesh: 67 s → sub-second per step), but on
the real TPU XLA's native grouped-conv transpose rule is ~40% faster for the
whole B3 train step (712 vs 516 img/s at bs=128) — the TPU conv emitter
handles the grouped filter gradient without the dense materialization the
CPU path suffers.  ``use_custom_vjp=None`` therefore resolves at TRACE time
to "custom on CPU, native elsewhere"; pass True/False to force either.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Pads = Tuple[Tuple[int, int], Tuple[int, int]]


def same_pads(n: int, k: int, s: int) -> Tuple[int, int]:
    """TF-style SAME padding for one spatial dim (what lax/flax 'SAME' does)."""
    out = -(-n // s)  # ceil
    total = max((out - 1) * s + k - n, 0)
    lo = total // 2
    return lo, total - lo


def _raw(x: jnp.ndarray, w: jnp.ndarray, stride: Tuple[int, int],
         pads: Pads) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w, stride, pads, feature_group_count=w.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _dw_conv(x: jnp.ndarray, w: jnp.ndarray, stride: Tuple[int, int],
             pads: Pads) -> jnp.ndarray:
    return _raw(x, w, stride, pads)


def _dw_conv_fwd(x, w, stride, pads):
    return _raw(x, w, stride, pads), (x, w)


def _weight_grad(x, dy, wshape, stride, pads):
    kh, kw, _, c = wshape
    sh, sw = stride
    b, oh, ow, _ = dy.shape
    xp = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    dyf = dy.astype(jnp.float32)
    taps = []
    for ky in range(kh):
        for kx in range(kw):
            win = lax.slice(
                xp, (0, ky, kx, 0),
                (b, ky + (oh - 1) * sh + 1, kx + (ow - 1) * sw + 1, c),
                (1, sh, sw, 1))
            taps.append(jnp.einsum("bhwc,bhwc->c",
                                   win.astype(jnp.float32), dyf))
    return jnp.stack(taps).reshape(kh, kw, 1, c)


def _dw_conv_bwd(stride, pads, res, dy):
    x, w = res
    _, vjp_x = jax.vjp(lambda xx: _raw(xx, w, stride, pads), x)
    dx, = vjp_x(dy)
    dw = _weight_grad(x, dy, w.shape, stride, pads).astype(w.dtype)
    return dx, dw


_dw_conv.defvjp(_dw_conv_fwd, _dw_conv_bwd)


def depthwise_conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
                     padding: str = "SAME",
                     use_custom_vjp: Optional[bool] = None) -> jnp.ndarray:
    """NHWC depthwise conv, ``w: [K, K, 1, C]``.

    ``padding`` is 'SAME' or 'VALID' (resolved statically so the backward
    pass sees explicit pad amounts).  ``use_custom_vjp=None`` picks the
    measured-best gradient rule for the backend being traced (see module
    docstring); both rules agree to 1e-5 (tests/test_depthwise.py).
    """
    kh, kw = w.shape[0], w.shape[1]
    if padding == "SAME":
        pads = (same_pads(x.shape[1], kh, stride),
                same_pads(x.shape[2], kw, stride))
    elif padding == "VALID":
        pads = ((0, 0), (0, 0))
    else:
        raise ValueError(f"padding must be SAME or VALID, got {padding!r}")
    if use_custom_vjp is None:
        use_custom_vjp = jax.default_backend() == "cpu"
    if use_custom_vjp:
        return _dw_conv(x, w, (stride, stride), pads)
    return _raw(x, w, (stride, stride), pads)


class DepthwiseConv(nn.Module):
    """Drop-in replacement for ``nn.Conv(C, (k, k), feature_group_count=C)``
    with the same parameter tree ('kernel' [K,K,1,C], optional 'bias' [C])
    and initializers, but the efficient depthwise VJP."""
    features: int
    kernel_size: Tuple[int, int]
    stride: int = 1
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    use_custom_vjp: Optional[bool] = None  # None = trace-time backend auto

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, 1, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        y = depthwise_conv2d(x, kernel, stride=self.stride,
                             padding=self.padding,
                             use_custom_vjp=self.use_custom_vjp)
        if bias is not None:
            y = y + bias
        return y
