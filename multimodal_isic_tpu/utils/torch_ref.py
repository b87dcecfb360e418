"""Torch EfficientNet oracle (CPU): baseline measurement + parity testing.

Two jobs:
1. **Measured baseline** — BASELINE.md requires the reference's CPU throughput
   as the denominator of the >10× target; ``efficientnet_pytorch`` is not in
   this image, so an architecture-identical torch EfficientNet (same published
   recipe; state-dict keys in ``efficientnet_pytorch`` naming) provides the
   reference-equivalent CPU forward.
2. **Golden oracle** — its state dict feeds
   :func:`..models.efficientnet.port_torch_state_dict`, letting tests assert
   per-sample parity of the JAX backbone against torch to float tolerance.
"""

from __future__ import annotations

import math
from typing import Optional

from ..models.efficientnet import PARAMS, block_args, round_filters

BN_EPS = 1e-3


def build_torch_efficientnet(model_name: str = "efficientnet-b3",
                             num_classes: Optional[int] = 1000):
    """Construct the torch model; returns an ``nn.Module`` whose
    ``state_dict()`` uses efficientnet_pytorch key names."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    width, depth, _, dropout = PARAMS[model_name]
    blocks = block_args(model_name)

    class SamePadConv(nn.Conv2d):
        """TF-SAME padding (asymmetric for stride 2), as in the reference impl."""

        def forward(self, x):
            ih, iw = x.shape[-2:]
            kh, kw = self.weight.shape[-2:]
            sh, sw = self.stride
            oh, ow = math.ceil(ih / sh), math.ceil(iw / sw)
            pad_h = max((oh - 1) * sh + (kh - 1) * self.dilation[0] + 1 - ih, 0)
            pad_w = max((ow - 1) * sw + (kw - 1) * self.dilation[1] + 1 - iw, 0)
            if pad_h > 0 or pad_w > 0:
                x = F.pad(x, [pad_w // 2, pad_w - pad_w // 2,
                              pad_h // 2, pad_h - pad_h // 2])
            return F.conv2d(x, self.weight, self.bias, self.stride, (0, 0),
                            self.dilation, self.groups)

    class MBConv(nn.Module):
        def __init__(self, expand, kernel, stride, cin, cout, drop_rate):
            super().__init__()
            mid = cin * expand
            self.has_expand = expand != 1
            self.stride, self.cin, self.cout = stride, cin, cout
            self.drop_rate = drop_rate
            if self.has_expand:
                self._expand_conv = SamePadConv(cin, mid, 1, bias=False)
                self._bn0 = nn.BatchNorm2d(mid, eps=BN_EPS, momentum=0.01)
            self._depthwise_conv = SamePadConv(mid, mid, kernel, stride=stride,
                                               groups=mid, bias=False)
            self._bn1 = nn.BatchNorm2d(mid, eps=BN_EPS, momentum=0.01)
            se_ch = max(1, int(cin * 0.25))
            self._se_reduce = SamePadConv(mid, se_ch, 1)
            self._se_expand = SamePadConv(se_ch, mid, 1)
            self._project_conv = SamePadConv(mid, cout, 1, bias=False)
            self._bn2 = nn.BatchNorm2d(cout, eps=BN_EPS, momentum=0.01)

        def forward(self, x):
            inputs = x
            if self.has_expand:
                x = F.silu(self._bn0(self._expand_conv(x)))
            x = F.silu(self._bn1(self._depthwise_conv(x)))
            se = x.mean((2, 3), keepdim=True)
            se = self._se_expand(F.silu(self._se_reduce(se)))
            x = torch.sigmoid(se) * x
            x = self._bn2(self._project_conv(x))
            if self.stride == 1 and self.cin == self.cout:
                if self.training and self.drop_rate > 0:
                    keep = 1 - self.drop_rate
                    mask = torch.bernoulli(
                        torch.full((x.shape[0], 1, 1, 1), keep, device=x.device))
                    x = x / keep * mask
                x = x + inputs
            return x

    class EffNet(nn.Module):
        def __init__(self):
            super().__init__()
            stem = round_filters(32, width)
            head = round_filters(1280, width)
            self._conv_stem = SamePadConv(3, stem, 3, stride=2, bias=False)
            self._bn0 = nn.BatchNorm2d(stem, eps=BN_EPS, momentum=0.01)
            n = len(blocks)
            self._blocks = nn.ModuleList([
                MBConv(e, k, s, ci, co, 0.2 * i / n)
                for i, (e, k, s, ci, co) in enumerate(blocks)
            ])
            self._conv_head = SamePadConv(blocks[-1][4], head, 1, bias=False)
            self._bn1 = nn.BatchNorm2d(head, eps=BN_EPS, momentum=0.01)
            self._dropout = nn.Dropout(dropout)
            self._fc = nn.Linear(head, num_classes) if num_classes else nn.Identity()

        def forward(self, x):
            x = F.silu(self._bn0(self._conv_stem(x)))
            for b in self._blocks:
                x = b(x)
            x = F.silu(self._bn1(self._conv_head(x)))
            x = x.mean((2, 3))
            return self._fc(self._dropout(x))

    return EffNet()
