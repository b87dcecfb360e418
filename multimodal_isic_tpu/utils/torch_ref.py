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


def build_torch_convmae(img_size=224, embed_dims=(256, 384, 768),
                        depths=(2, 2, 11), num_heads=12, decoder_dim=512,
                        decoder_depth=8, decoder_heads=16,
                        norm_pix_loss=False):
    """Torch twin of :class:`..models.convmae.ConvMAE` with the upstream
    ConvMAE state-dict naming (``patch_embed{1,2,3}``, ``blocks{1,2,3}``,
    ``norm``, ``decoder_*``, ``mask_token`` — the checkpoint format the
    reference loads at ``train_ae.py:136-141``).  Its ``state_dict()`` feeds
    :func:`..models.convmae.port_torch_state_dict`; its forward takes the
    masking bookkeeping (ids_keep/mask/ids_restore) explicitly so parity
    tests are RNG-free."""
    import numpy as np
    import torch
    import torch.nn as nn

    from ..models.convmae import sincos_pos_embed

    class ChannelLN(nn.Module):
        """LayerNorm over the channel dim of NCHW maps (flax LN on NHWC)."""

        def __init__(self, dim):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(dim))
            self.bias = nn.Parameter(torch.zeros(dim))

        def forward(self, x):  # [B, C, H, W]
            h = x.permute(0, 2, 3, 1)
            h = nn.functional.layer_norm(h, h.shape[-1:], self.weight, self.bias)
            return h.permute(0, 3, 1, 2)

    class CMlp(nn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.fc1 = nn.Conv2d(dim, hidden, 1)
            self.fc2 = nn.Conv2d(hidden, dim, 1)

        def forward(self, x):
            return self.fc2(nn.functional.gelu(self.fc1(x)))

    class CBlock(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.norm1 = ChannelLN(dim)
            self.conv1 = nn.Conv2d(dim, dim, 1)
            self.attn = nn.Conv2d(dim, dim, 5, padding=2, groups=dim)
            self.conv2 = nn.Conv2d(dim, dim, 1)
            self.norm2 = ChannelLN(dim)
            self.mlp = CMlp(dim, dim * 4)

        def forward(self, x, keep=None):
            h = self.conv1(self.norm1(x))
            if keep is not None:
                h = h * keep
            h = self.conv2(nn.functional.gelu(self.attn(h)))
            x = x + h
            return x + self.mlp(self.norm2(x))

    class VitAttention(nn.Module):
        def __init__(self, dim, heads):
            super().__init__()
            self.heads = heads
            self.qkv = nn.Linear(dim, dim * 3)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            b, n, d = x.shape
            hd = d // self.heads
            qkv = self.qkv(x).reshape(b, n, 3, self.heads, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q = q * hd ** -0.5
            attn = torch.einsum("bqhd,bkhd->bhqk", q, k).softmax(dim=-1)
            out = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, d)
            return self.proj(out)

    class VitMlp(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.fc1 = nn.Linear(dim, dim * 4)
            self.fc2 = nn.Linear(dim * 4, dim)

        def forward(self, x):
            return self.fc2(nn.functional.gelu(self.fc1(x)))

    class VitBlock(nn.Module):
        def __init__(self, dim, heads):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim)
            self.attn = VitAttention(dim, heads)
            self.norm2 = nn.LayerNorm(dim)
            self.mlp = VitMlp(dim)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class PatchEmbed(nn.Module):
        def __init__(self, cin, cout, k):
            super().__init__()
            self.proj = nn.Conv2d(cin, cout, k, stride=k)
            self.norm = ChannelLN(cout)

        def forward(self, x):
            return self.norm(self.proj(x))

    class TorchConvMAE(nn.Module):
        def __init__(self):
            super().__init__()
            d0, d1, d2 = embed_dims
            g = img_size // 16
            self.grid = g
            self.patch_embed1 = PatchEmbed(3, d0, 4)
            self.blocks1 = nn.ModuleList(CBlock(d0) for _ in range(depths[0]))
            self.patch_embed2 = PatchEmbed(d0, d1, 2)
            self.blocks2 = nn.ModuleList(CBlock(d1) for _ in range(depths[1]))
            self.patch_embed3 = nn.ModuleDict({
                "proj": nn.Conv2d(d1, d2, 2, stride=2),
                "norm": nn.LayerNorm(d2)})
            self.pos_embed = nn.Parameter(torch.from_numpy(
                np.asarray(sincos_pos_embed(d2, g))[None]).float())
            self.blocks3 = nn.ModuleList(
                VitBlock(d2, num_heads) for _ in range(depths[2]))
            self.norm = nn.LayerNorm(d2)
            self.decoder_embed = nn.Linear(d2, decoder_dim)
            self.mask_token = nn.Parameter(torch.randn(1, 1, decoder_dim) * 0.02)
            self.decoder_blocks = nn.ModuleList(
                VitBlock(decoder_dim, decoder_heads) for _ in range(decoder_depth))
            self.decoder_norm = nn.LayerNorm(decoder_dim)
            self.decoder_pred = nn.Linear(decoder_dim, 16 * 16 * 3)
            self.register_buffer("dec_pos", torch.from_numpy(
                np.asarray(sincos_pos_embed(decoder_dim, g))[None]).float())

        def encode(self, imgs, ids_keep, mask):
            b = imgs.shape[0]
            g = self.grid
            keep3 = (1.0 - mask).reshape(b, 1, g, g)
            keep1 = keep3.repeat_interleave(4, 2).repeat_interleave(4, 3)
            keep2 = keep3.repeat_interleave(2, 2).repeat_interleave(2, 3)
            full = bool((mask == 0).all())
            x = self.patch_embed1(imgs)
            for blk in self.blocks1:
                x = blk(x, None if full else keep1)
            x = self.patch_embed2(x)
            for blk in self.blocks2:
                x = blk(x, None if full else keep2)
            x = self.patch_embed3["proj"](x)
            x = x.flatten(2).transpose(1, 2)  # [B, N, d2]
            x = self.patch_embed3["norm"](x)
            x = x + self.pos_embed
            x = torch.gather(x, 1, ids_keep[:, :, None].expand(-1, -1, x.shape[-1]))
            for blk in self.blocks3:
                x = blk(x)
            return self.norm(x)

        def decode(self, latent, ids_restore):
            b, len_keep, _ = latent.shape
            n = ids_restore.shape[1]
            x = self.decoder_embed(latent)
            fills = self.mask_token.expand(b, n - len_keep, -1)
            x = torch.cat([x, fills], dim=1)
            x = torch.gather(x, 1, ids_restore[:, :, None].expand(-1, -1, x.shape[-1]))
            x = x + self.dec_pos
            for blk in self.decoder_blocks:
                x = blk(x)
            return self.decoder_pred(self.decoder_norm(x))

        def forward(self, imgs, ids_keep, mask, ids_restore):
            """imgs NCHW → (loss, pred, latent); masking bookkeeping given."""
            latent = self.encode(imgs, ids_keep, mask)
            pred = self.decode(latent, ids_restore)
            # patchify, torch-MAE ordering (nchpwq->nhwpqc)
            p = 16
            b, c, h, w = imgs.shape
            target = imgs.reshape(b, c, h // p, p, w // p, p)
            target = torch.einsum("nchpwq->nhwpqc", target).reshape(
                b, (h // p) * (w // p), p * p * c)
            if norm_pix_loss:
                mean = target.mean(-1, keepdim=True)
                var = target.var(-1, unbiased=False, keepdim=True)
                target = (target - mean) / (var + 1e-6).sqrt()
            per_patch = ((pred - target) ** 2).mean(-1)
            loss = (per_patch * mask).sum() / mask.sum().clamp(min=1.0)
            return loss, pred, latent

    return TorchConvMAE()
