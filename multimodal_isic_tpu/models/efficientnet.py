"""EfficientNet (B0-B7) in flax, TPU-native NHWC.

The reference's image backbone is a pretrained EfficientNet-B3 with its
classifier replaced by Identity, yielding 1536-d features
(``model.py:58-59``).  This implements the architecture from its published
recipe — MBConv with expand/depthwise/SE/project, swish, TF-SAME padding,
BN(eps=1e-3), per-block-scaled drop-connect, compound width/depth scaling —
plus a weight-porting loader for ``efficientnet_pytorch`` state dicts so
pretrained torch checkpoints can be carried over for per-sample parity.
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..ops.depthwise import DepthwiseConv

# (expand_ratio, kernel, stride, in_filters, out_filters, num_repeat) — B0 base
_BASE_BLOCKS = [
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
]

# name: (width_coefficient, depth_coefficient, resolution, dropout)
PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
}

BN_EPS = 1e-3
SE_RATIO = 0.25


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's running-statistics semantics.

    flax's ``nn.BatchNorm`` folds the BIASED batch variance into the running
    variance; ``torch.nn.BatchNorm2d`` normalizes with the biased variance but
    updates the running variance with the UNBIASED one (Bessel correction
    n/(n-1)).  The reference trains its backbone with torch BN
    (``model.py:58``, ``net_utils.py:6-44``), so N-step training trajectories
    only match a ported torch twin when the running stats follow the torch
    rule (tests/test_trajectory_parity.py).  The ``batch_stats`` layout
    ({mean, var}) and the normalization math are unchanged from flax;
    ``momentum`` keeps the flax decay convention (0.99 ≡ torch momentum 0.01).
    Stats and normalization are computed in f32 regardless of ``dtype``
    (mixed-precision hygiene); the output is cast back to ``dtype``.
    """
    use_running_average: bool = True
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        # stats math in f32 at least; f64 when the input is f64 (x64 parity
        # tests run the whole trajectory in double precision)
        stat_dtype = jnp.promote_types(jnp.float32, x.dtype)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(stat_dtype)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        y = ((x.astype(stat_dtype) - mean)
             * jax.lax.rsqrt(var + jnp.asarray(self.epsilon, stat_dtype)))
        return (y * scale + bias).astype(self.dtype)


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def block_args(name: str) -> List[Tuple[int, int, int, int, int]]:
    """Expanded per-block (expand, kernel, stride, in, out) list."""
    width, depth, _, _ = PARAMS[name]
    blocks = []
    for expand, kernel, stride, cin, cout, repeat in _BASE_BLOCKS:
        cin = round_filters(cin, width)
        cout = round_filters(cout, width)
        for i in range(round_repeats(repeat, depth)):
            blocks.append((expand, kernel, stride if i == 0 else 1,
                           cin if i == 0 else cout, cout))
    return blocks


def drop_connect(x: jnp.ndarray, rate: float, deterministic: bool,
                 rng: Optional[jax.Array]) -> jnp.ndarray:
    """Per-sample stochastic depth on the residual branch."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
    return x / keep * mask


class _ConvParams(nn.Module):
    """Declares an ``nn.Conv``-compatible kernel/bias (same names, shapes,
    initializers) WITHOUT computing the convolution, so the fused Pallas
    serving kernels can consume the raw folded weights while staying
    checkpoint-compatible with the ``fold_batchnorm`` param layout."""
    kernel_shape: Tuple[int, int, int, int]  # HWIO (depthwise: I=1)

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       self.kernel_shape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.kernel_shape[-1],), jnp.float32)
        return k, b


class MBConv(nn.Module):
    expand_ratio: int
    kernel: int
    stride: int
    in_filters: int
    out_filters: int
    drop_rate: float
    dtype: jnp.dtype = jnp.float32
    bn_folded: bool = False  # inference-only: BN pre-folded into conv weights
    conv_fission: bool = False  # break XLA's expand→depthwise mega-fusion
    # (see EfficientNet.conv_fission)
    pallas_serving: bool = False  # fused expand→dw→silu→SE-pool Pallas path
    # for fitting stride-1 blocks (see EfficientNet.pallas_serving)

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        mid = self.in_filters * self.expand_ratio
        if self.bn_folded:
            # serving variant: convs carry bias, BN layers are gone (their
            # scale/shift live inside the conv weights via fold_batchnorm)
            bn = lambda name: (lambda h: h)
        else:
            bn = lambda name: TorchBatchNorm(
                use_running_average=not train, epsilon=BN_EPS, momentum=0.99,
                dtype=self.dtype, name=name)
        use_bias = self.bn_folded

        # Fused serving path: one Pallas pass for [expand 1×1 → silu →]
        # depthwise K×K → silu → SE global pool, the expand intermediate
        # VMEM-resident (ops/fused_dwconv.py).  Init always takes the
        # nn.Conv branch below (params are path-independent; Pallas never
        # lowers during init), and the dispatch is per-block at trace time.
        fused = (self.bn_folded and self.pallas_serving and self.stride == 1
                 and not self.is_initializing())
        if fused:
            from ..ops.fused_dwconv import (
                dw_silu_pool, expand_dw_silu_pool, fits_pallas_dw,
                fits_pallas_expand_dw)
            h_in, w_in = x.shape[1], x.shape[2]
            if self.expand_ratio != 1:
                fused = fits_pallas_expand_dw(h_in, w_in, self.in_filters,
                                              mid, self.kernel, self.stride,
                                              self.dtype)
            else:
                fused = fits_pallas_dw(h_in, w_in, mid, self.kernel,
                                       self.stride, self.dtype)
        if fused:
            interpret = jax.default_backend() != "tpu"
            kk = (self.kernel, self.kernel, 1, mid)
            if self.expand_ratio != 1:
                we, be = _ConvParams((1, 1, self.in_filters, mid),
                                     name="expand_conv")()
                wd, bd = _ConvParams(kk, name="depthwise_conv")()
                x, pool = expand_dw_silu_pool(
                    x.astype(self.dtype), we.astype(self.dtype), be,
                    wd.astype(self.dtype), bd, interpret=interpret)
            else:
                wd, bd = _ConvParams(kk, name="depthwise_conv")()
                x, pool = dw_silu_pool(x.astype(self.dtype),
                                       wd.astype(self.dtype), bd,
                                       interpret=interpret)
            se = pool.reshape(pool.shape[0], 1, 1, mid).astype(self.dtype)
        else:
            if self.expand_ratio != 1:
                x = nn.Conv(mid, (1, 1), use_bias=use_bias, dtype=self.dtype,
                            name="expand_conv")(x)
                # checkpoint_name tags mark conv outputs as the ONLY saved
                # residuals under EfficientNet(remat="conv"): backward
                # recomputes the cheap BN/silu/SE elementwise chains instead
                # of storing their full-size outputs — byte-traffic relief
                # for the HBM-bandwidth-bound train step (identity when
                # unrematted).
                x = checkpoint_name(x, "mbconv_conv_out")
                x = nn.silu(bn("bn0")(x))
                if self.conv_fission:
                    x = jax.lax.optimization_barrier(x)
            x = DepthwiseConv(mid, (self.kernel, self.kernel),
                              stride=self.stride, padding="SAME",
                              use_bias=use_bias, dtype=self.dtype,
                              name="depthwise_conv")(x)
            x = checkpoint_name(x, "mbconv_conv_out")
            x = nn.silu(bn("bn1")(x))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)

        # squeeze-excite on the *input* channel count ratio
        se_ch = max(1, int(self.in_filters * SE_RATIO))
        se = nn.Conv(se_ch, (1, 1), dtype=self.dtype, name="se_reduce")(se)
        se = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(nn.silu(se))
        x = x * jax.nn.sigmoid(se)

        x = nn.Conv(self.out_filters, (1, 1), use_bias=use_bias,
                    dtype=self.dtype, name="project_conv")(x)
        x = checkpoint_name(x, "mbconv_conv_out")
        x = bn("bn2")(x)
        if self.stride == 1 and self.in_filters == self.out_filters:
            rng = self.make_rng("dropout") if (train and self.drop_rate > 0) else None
            x = drop_connect(x, self.drop_rate, not train, rng) + inputs
        return x


class EfficientNet(nn.Module):
    """Feature extractor + optional classification head.

    ``__call__`` returns pooled features (the reference's Identity-fc usage)
    unless ``num_classes`` is set, in which case logits.
    """
    model_name: str = "efficientnet-b3"
    num_classes: Optional[int] = None
    drop_connect_rate: float = 0.2
    feature_dropout: bool = True  # efficientnet_pytorch keeps _dropout before _fc
    dtype: jnp.dtype = jnp.float32  # compute dtype (bf16 = mixed precision)
    remat: str = "none"  # activation rematerialization per MBConv block:
    # 'none'  — standard autodiff residuals;
    # 'conv'  — save only conv outputs (the checkpoint_name tags), recompute
    #           the BN/silu/SE elementwise chains in backward: fewer HBM
    #           bytes for the bandwidth-bound train step at ~zero extra
    #           MXU work;
    # 'block' — save only block boundaries, recompute everything (max
    #           memory relief, most recompute).
    # The param tree is unchanged (lifted transform): checkpoints and the
    # torch porter are unaffected.
    bn_folded: bool = False  # inference-only serving variant: every BN is
    # pre-folded into the preceding conv's weights+bias (fold_batchnorm),
    # deleting the per-element scale/shift from the VPU-bound forward.
    # Param tree changes (convs gain 'bias', bn layers disappear); training
    # is not supported in this variant (there are no batch stats to update).
    conv_fission: bool = False  # place an optimization_barrier between each
    # MBConv's expand-conv(+silu) and its depthwise conv.  The r4 serving
    # trace shows XLA mega-fusing expand→depthwise→SE-pool into single ops
    # that run at only 7-16 TFLOP/s with 0% DMA stall (the small-contraction
    # expand matmul and the VPU depthwise serialize inside one loop), while
    # the pure-conv fusions of the same graph hit 27-55 TFLOP/s.  The barrier
    # forces separate, individually-scheduled convolutions at the price of an
    # extra HBM round-trip for the expand output.  Semantics-free (identity).
    # MEASURED NEGATIVE (r4, bs=512 bf16 folded serving): 0.944× — the HBM
    # round-trip costs more than the in-fusion recompute.  Kept as an A/B
    # flag; the win lives in `pallas_serving` instead.
    pallas_serving: bool = False  # requires bn_folded: route fitting
    # stride-1 MBConv blocks through the fused Pallas serving kernels
    # (ops/fused_dwconv.py) — expand matmul computed once into VMEM scratch,
    # depthwise+silu over scratch, SE pool from the same pass.  Stride-2 and
    # VMEM-oversize blocks keep the XLA path; param tree unchanged.
    # MEASURED NEGATIVE (r4, bs=512 bf16 folded serving): 0.49× end-to-end —
    # every fused block is slower than XLA's own mega-fusion (per-block
    # table + analysis in ops/fused_dwconv.py).  Kept as an A/B flag with
    # equivalence tests; the serving default stays on the XLA path.

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bn_folded and train:
            raise ValueError("bn_folded is an inference-only variant")
        if self.pallas_serving and not self.bn_folded:
            # loud, not silent: the MBConv gate requires bn_folded, so the
            # flag would quietly no-op and an A/B run would time the
            # standard XLA graph while believing it measured the Pallas path
            raise ValueError("pallas_serving requires bn_folded=True")
        width, depth, _, dropout_rate = PARAMS[self.model_name]
        if self.bn_folded:
            bn = lambda name: (lambda h: h)
        else:
            bn = lambda name: TorchBatchNorm(
                use_running_average=not train, epsilon=BN_EPS, momentum=0.99,
                dtype=self.dtype, name=name)

        if self.remat == "conv":
            policy = jax.checkpoint_policies.save_only_these_names(
                "mbconv_conv_out")
            # `train` enters via closure (a static python bool), so the
            # lifted transform never traces it
            run_block = nn.remat(lambda mb, h: mb(h, train=train),
                                 policy=policy)
        elif self.remat == "block":
            run_block = nn.remat(lambda mb, h: mb(h, train=train))
        elif self.remat == "none":
            run_block = lambda mb, h: mb(h, train=train)
        else:
            raise ValueError(f"remat must be none|conv|block, got {self.remat!r}")

        x = x.astype(self.dtype)
        stem = round_filters(32, width)
        x = nn.Conv(stem, (3, 3), strides=2, padding="SAME",
                    use_bias=self.bn_folded, dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.silu(bn("stem_bn")(x))

        blocks = block_args(self.model_name)
        n = len(blocks)
        for i, (expand, kernel, stride, cin, cout) in enumerate(blocks):
            x = run_block(MBConv(expand, kernel, stride, cin, cout,
                                 drop_rate=self.drop_connect_rate * i / n,
                                 dtype=self.dtype, bn_folded=self.bn_folded,
                                 conv_fission=self.conv_fission,
                                 pallas_serving=self.pallas_serving,
                                 name=f"block_{i}"), x)

        head = round_filters(1280, width)
        x = nn.Conv(head, (1, 1), use_bias=self.bn_folded, dtype=self.dtype,
                    name="head_conv")(x)
        x = nn.silu(bn("head_bn")(x))
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # pooled feats in f32
        if self.feature_dropout:
            x = nn.Dropout(dropout_rate, deterministic=not train)(x)
        if self.num_classes is not None:
            x = nn.Dense(self.num_classes, name="fc")(x)
        return x


def feature_dim(model_name: str = "efficientnet-b3") -> int:
    width = PARAMS[model_name][0]
    return round_filters(1280, width)


# ------------------------------------------------------- weight porting

def port_torch_state_dict(state_dict: Dict[str, Any],
                          model_name: str = "efficientnet-b3"):
    """Convert an ``efficientnet_pytorch`` state dict (tensor or ndarray
    values) into (params, batch_stats) pytrees for :class:`EfficientNet`.

    Mapping: torch OIHW conv weights → flax HWIO; depthwise OIHW(O=ch,I=1) →
    HWIO(I=1, feature_group_count); BN weight/bias → scale/bias and
    running_mean/var → batch_stats.
    """
    # Deep-copy: torch state_dict tensors share storage with the LIVE model,
    # and jnp.asarray on CPU zero-copies contiguous numpy arrays — without
    # the copy, a later torch optimizer step would mutate the "ported" JAX
    # parameters in place (observed: nondeterministic trajectory tests).
    sd = {k: np.array(v, copy=True) for k, v in state_dict.items()}

    def conv_w(key):
        w = sd[key]
        return jnp.asarray(w.transpose(2, 3, 1, 0))  # OIHW -> HWIO

    def dw_conv_w(key):
        w = sd[key]  # [ch, 1, k, k]
        return jnp.asarray(w.transpose(2, 3, 1, 0))  # -> [k, k, 1, ch]

    def bn(prefix):
        return (
            {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
             "bias": jnp.asarray(sd[f"{prefix}.bias"])},
            {"mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
             "var": jnp.asarray(sd[f"{prefix}.running_var"])},
        )

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem_conv"] = {"kernel": conv_w("_conv_stem.weight")}
    params["stem_bn"], stats["stem_bn"] = bn("_bn0")

    n_blocks = len(block_args(model_name))
    for i in range(n_blocks):
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        t = f"_blocks.{i}"
        if f"{t}._expand_conv.weight" in sd:
            p["expand_conv"] = {"kernel": conv_w(f"{t}._expand_conv.weight")}
            p["bn0"], s["bn0"] = bn(f"{t}._bn0")
        p["depthwise_conv"] = {"kernel": dw_conv_w(f"{t}._depthwise_conv.weight")}
        p["bn1"], s["bn1"] = bn(f"{t}._bn1")
        p["se_reduce"] = {"kernel": conv_w(f"{t}._se_reduce.weight"),
                          "bias": jnp.asarray(sd[f"{t}._se_reduce.bias"])}
        p["se_expand"] = {"kernel": conv_w(f"{t}._se_expand.weight"),
                          "bias": jnp.asarray(sd[f"{t}._se_expand.bias"])}
        p["project_conv"] = {"kernel": conv_w(f"{t}._project_conv.weight")}
        p["bn2"], s["bn2"] = bn(f"{t}._bn2")
        params[f"block_{i}"] = p
        stats[f"block_{i}"] = s

    params["head_conv"] = {"kernel": conv_w("_conv_head.weight")}
    params["head_bn"], stats["head_bn"] = bn("_bn1")
    if "_fc.weight" in sd and sd["_fc.weight"].ndim == 2:
        params["fc"] = {"kernel": jnp.asarray(sd["_fc.weight"].T),
                        "bias": jnp.asarray(sd["_fc.bias"])}
    return params, stats


# ------------------------------------------------ inference BN folding

def _fold_pair(conv: Dict[str, Any], bn_p: Dict[str, Any],
               bn_s: Dict[str, Any]) -> Dict[str, Any]:
    """Fold inference BN(scale,bias,mean,var) into a bias-free conv.

    y = scale*(conv(x)-mean)*rsqrt(var+eps) + bias
      = conv_{k*s}(x) + (bias - mean*s),  s = scale*rsqrt(var+eps)

    Output channels sit on the last kernel axis for both dense HWIO and
    depthwise [K,K,1,C] layouts, so one broadcast covers both.
    """
    s = (np.asarray(bn_p["scale"], np.float64)
         / np.sqrt(np.asarray(bn_s["var"], np.float64) + BN_EPS))
    kernel = np.asarray(conv["kernel"], np.float64) * s
    bias = (np.asarray(bn_p["bias"], np.float64)
            - np.asarray(bn_s["mean"], np.float64) * s)
    return {"kernel": jnp.asarray(kernel, np.float32),
            "bias": jnp.asarray(bias, np.float32)}


def fold_batchnorm(params: Dict[str, Any], batch_stats: Dict[str, Any],
                   model_name: str = "efficientnet-b3") -> Dict[str, Any]:
    """Serving-time transform: (params, batch_stats) of a standard
    :class:`EfficientNet` → the param tree of ``EfficientNet(bn_folded=True)``.

    Every conv→BN pair collapses to one conv with bias; SE convs and the
    optional fc head pass through unchanged.  The folded model evaluates
    identically (up to float rounding) while the forward graph carries no
    BatchNorm ops at all — the per-element scale/shift disappears from the
    VPU-bound conv fusions of the inference path (reference eval usage:
    ``/root/reference/main.py:156-160``).
    """
    out: Dict[str, Any] = {
        "stem_conv": _fold_pair(params["stem_conv"], params["stem_bn"],
                                batch_stats["stem_bn"])}
    for i in range(len(block_args(model_name))):
        b, s = params[f"block_{i}"], batch_stats[f"block_{i}"]
        fb: Dict[str, Any] = {}
        if "expand_conv" in b:
            fb["expand_conv"] = _fold_pair(b["expand_conv"], b["bn0"],
                                           s["bn0"])
        fb["depthwise_conv"] = _fold_pair(b["depthwise_conv"], b["bn1"],
                                          s["bn1"])
        fb["project_conv"] = _fold_pair(b["project_conv"], b["bn2"], s["bn2"])
        fb["se_reduce"] = b["se_reduce"]
        fb["se_expand"] = b["se_expand"]
        out[f"block_{i}"] = fb
    out["head_conv"] = _fold_pair(params["head_conv"], params["head_bn"],
                                  batch_stats["head_bn"])
    if "fc" in params:
        out["fc"] = params["fc"]
    return out
