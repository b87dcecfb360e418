"""Conv-MAE: hybrid convolutional/ViT masked autoencoder, TPU-first.

Provides the capability surface of the reference's external ConvMAE dependency
(``train_ae.py:24-25,136-141``, ``save_latent.py:17-18,42-60``): a 3-stage
conv→conv→transformer encoder over 224×224 crops (56²→28²→14² grid, dims
256→384→768), random masking at the 14×14=196-token granularity with the mask
upsampled into the conv stages so masked content never leaks, optional
*lesion-guided* masking (the reference's local patch to upstream ConvMAE),
norm-pix reconstruction loss, an encoder-only mode (``with_decoder=False``)
and ``patchify``/``unpatchify``/``forward_encoder`` entry points.

This is a re-design, not a port: channels-last NHWC layout throughout, LayerNorm
conv blocks (5×5 depthwise token mixer between 1×1 projections), static-shape
keep-token gathering (mask ratio is a compile-time constant).  Masking/restore
bookkeeping follows the MAE convention: ``mask`` is [B, N] with 1 = masked,
``ids_restore`` un-shuffles decoder tokens.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.depthwise import DepthwiseConv
from ..ops.patches import patch_overlap_mask, patchify, unpatchify


def sincos_pos_embed(dim: int, grid: int) -> jnp.ndarray:
    """Fixed 2-D sin-cos positional embedding, [grid*grid, dim]."""
    assert dim % 4 == 0
    coords = jnp.arange(grid, dtype=jnp.float32)
    omega = jnp.arange(dim // 4, dtype=jnp.float32) / (dim / 4.0)
    omega = 1.0 / (10000.0 ** omega)
    out = jnp.einsum("g,d->gd", coords, omega)
    emb_1d = jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)  # [g, dim/2]
    emb_h = jnp.repeat(emb_1d[:, None, :], grid, axis=1)
    emb_w = jnp.repeat(emb_1d[None, :, :], grid, axis=0)
    return jnp.concatenate([emb_h, emb_w], axis=-1).reshape(grid * grid, dim)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype)(x)


class Attention(nn.Module):
    dim: int
    num_heads: int
    use_flash: bool = False  # blockwise Pallas kernel (ops.attention)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b, n, h, hd]
        # flax init may run on a CPU-pinned device even in a TPU process
        # (cheap init, see __graft_entry__) — params are path-independent, so
        # init always takes the XLA branch and never lowers Pallas off-TPU
        if self.use_flash and not self.is_initializing():
            from ..ops.attention import flash_attention
            # interpret mode off-TPU so the CPU mesh runs the same model
            out = flash_attention(q.transpose(0, 2, 1, 3).astype(jnp.float32),
                                  k.transpose(0, 2, 1, 3).astype(jnp.float32),
                                  v.transpose(0, 2, 1, 3).astype(jnp.float32),
                                  interpret=jax.default_backend() != "tpu")
            out = out.transpose(0, 2, 1, 3).reshape(b, n, d).astype(q.dtype)
        else:
            q = q * (1.0 / math.sqrt(head_dim))
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k)
            # softmax in f32 for numerical stability under bf16 compute
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, d)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class Block(nn.Module):
    """Pre-LN transformer block (ViT stage / decoder)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + Attention(self.dim, self.num_heads, use_flash=self.use_flash,
                          dtype=self.dtype)(nn.LayerNorm(dtype=self.dtype)(x))
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim,
                    dtype=self.dtype)(nn.LayerNorm(dtype=self.dtype)(x))
        return x


class _LNParams(nn.Module):
    """Parameter twin of ``nn.LayerNorm`` (same names/shapes/initializers,
    no compute) — the fused LN-MLP kernel consumes the raw scale/bias."""

    @nn.compact
    def __call__(self, features: int):
        s = self.param("scale", nn.initializers.ones, (features,))
        b = self.param("bias", nn.initializers.zeros, (features,))
        return s, b


class _Conv1x1Params(nn.Module):
    """Parameter twin of a 1×1 ``nn.Conv``: declares the identical
    kernel/bias (same names, shapes, initializers) WITHOUT computing the
    convolution, so the fused-MLP kernel can consume the raw weights while
    staying checkpoint/porter-compatible with the ``nn.Conv`` layout."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, in_features, self.features))
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,))
        return k, b


class _DWParams(nn.Module):
    """Parameter twin of :class:`DepthwiseConv` (kernel [K, K, 1, C] + bias,
    same names/initializers/dtype, no compute) — the fused front kernel
    consumes the raw taps."""
    features: int
    kernel_size: tuple = (5, 5)

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, 1, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class ConvBlock(nn.Module):
    """Conv stage block: 1×1 → masked 5×5 depthwise → 1×1, then a 1×1 MLP,
    both residual.  ``keep`` ([B, H, W, 1], 1 = visible) zeroes masked
    positions at the depthwise input so masked pixels cannot leak through the
    5×5 receptive field during pretraining.

    ``use_fused_mlp`` routes the whole MLP half (LayerNorm_1 → Conv_3 → GELU
    → Conv_4 → residual) through the ``ops.fused_mlp.fused_ln_mlp`` Pallas
    kernel: the 4×-expansion intermediate, the LN output, and the
    pre-residual MLP output (the top ops of the r3 train-step trace) all
    stay VMEM-resident; parameters and math are unchanged.

    ``use_fused_front`` does the same for the FIRST half (LayerNorm_0 →
    Conv_0 → keep-mask → depthwise Conv_1 → GELU → Conv_2 → residual) via
    ``ops.fused_convblock.fused_front`` — the r5 attack on the remaining
    trace-identified hot ops."""
    dim: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_fused_mlp: bool = False
    use_fused_front: bool = False

    @nn.compact
    def __call__(self, x, keep: Optional[jnp.ndarray] = None):
        if self.use_fused_front and not self.is_initializing():
            from ..ops.fused_convblock import fused_front
            dt = self.dtype
            c = x.shape[-1]
            ls, lb = _LNParams(name="LayerNorm_0")(c)
            k0, b0 = _Conv1x1Params(self.dim, name="Conv_0")(c)
            kd, bd = _DWParams(self.dim, name="Conv_1")()
            k2, b2 = _Conv1x1Params(self.dim, name="Conv_2")(self.dim)
            x = fused_front(
                x.astype(dt), ls.astype(dt), lb.astype(dt),
                k0[0, 0].astype(dt), b0.astype(dt),
                kd.reshape(5, 5, self.dim).astype(dt), bd.astype(dt),
                k2[0, 0].astype(dt), b2.astype(dt), keep,
                interpret=jax.default_backend() != "tpu")
        else:
            # explicit names keep the param tree identical to the original
            # auto-numbered nn.Conv layout (checkpoints + torch porter paths)
            h = nn.LayerNorm(dtype=self.dtype, name="LayerNorm_0")(x)
            h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="Conv_0")(h)
            if keep is not None:
                h = h * keep.astype(h.dtype)
            h = DepthwiseConv(self.dim, (5, 5), padding="SAME",
                              dtype=self.dtype, name="Conv_1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="Conv_2")(h)
            x = x + h
        f = int(self.dim * self.mlp_ratio)
        # init always takes the nn.LayerNorm/nn.Conv branch (params are
        # path-independent and Pallas never lowers off-TPU during init,
        # cf. Attention above)
        if self.use_fused_mlp and not self.is_initializing():
            from ..ops.fused_mlp import fused_ln_mlp
            dt = self.dtype
            bb, hh, ww, c = x.shape
            # explicit names match the unfused branch's auto-numbering
            ls, lb = _LNParams(name="LayerNorm_1")(c)
            k1, b1 = _Conv1x1Params(f, name="Conv_3")(c)
            k2, b2 = _Conv1x1Params(self.dim, name="Conv_4")(f)
            out = fused_ln_mlp(x.reshape(-1, c).astype(dt), ls, lb,
                               k1[0, 0].astype(dt), b1.astype(dt),
                               k2[0, 0].astype(dt), b2.astype(dt),
                               interpret=jax.default_backend() != "tpu")
            return out.reshape(bb, hh, ww, c).astype(dt)
        h = nn.LayerNorm(dtype=self.dtype, name="LayerNorm_1")(x)
        h = nn.Conv(f, (1, 1), dtype=self.dtype, name="Conv_3")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="Conv_4")(h)
        return x + h


def random_masking(key: jax.Array, batch: int, num_patches: int,
                   mask_ratio: float,
                   lesion_overlap: Optional[jnp.ndarray] = None,
                   lesion_bias: float = 1.0):
    """MAE noise-argsort masking with optional lesion guidance.

    Returns (ids_keep [B, len_keep], mask [B, N] 1=masked, ids_restore [B, N]).
    With ``lesion_overlap`` ([B, N] bool) given, lesion patches receive a noise
    bias so they are masked preferentially — forcing the decoder to reconstruct
    lesion texture (the reference's lesion-mask training mode,
    ``train_ae.py:170-172``).
    """
    len_keep = int(round(num_patches * (1.0 - mask_ratio)))
    if len_keep == num_patches:  # no masking: identity ordering, not a shuffle
        ids = jnp.tile(jnp.arange(num_patches)[None, :], (batch, 1))
        return ids, jnp.zeros((batch, num_patches)), ids
    noise = jax.random.uniform(key, (batch, num_patches))
    if lesion_overlap is not None:
        noise = noise + lesion_bias * lesion_overlap.astype(noise.dtype)
    ids_shuffle = jnp.argsort(noise, axis=1)  # ascending: keep smallest
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = jnp.ones((batch, num_patches))
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return ids_keep, mask, ids_restore


class ConvMAE(nn.Module):
    """ConvViT-Base masked autoencoder (dims 256/384/768, depths 2/2/11,
    decoder 512×8) — the configuration of the reference's
    ``convmae_convvit_base_patch16_dec512d8b``."""

    img_size: int = 224
    embed_dims: Sequence[int] = (256, 384, 768)
    depths: Sequence[int] = (2, 2, 11)
    num_heads: int = 12
    decoder_dim: int = 512
    decoder_depth: int = 8
    decoder_heads: int = 16
    norm_pix_loss: bool = False
    with_decoder: bool = True
    use_flash_attention: bool = False  # Pallas blockwise attention for the ViT
    use_fused_mlp: bool = False  # Pallas fused conv-MLP (ops.fused_mlp) for
    # the conv-stage MLP halves — VMEM-resident 4× expansion
    use_fused_front: bool = False  # Pallas fused ConvBlock FIRST half
    # (ops.fused_convblock): LN → 1×1 → keep → dw5×5 → GELU → 1×1 → residual
    dtype: jnp.dtype = jnp.float32  # compute dtype (bf16 = mixed precision;
    # params stay f32, loss computed in f32)
    remat_blocks: bool = False  # jax.checkpoint every conv/ViT/decoder block:
    # trade ~1/3 extra forward FLOPs for O(depth) less activation HBM —
    # raises the max train batch (bs=64 -> 256 for the base model on one
    # 16 GB v5e).  Param tree is unchanged (lifted transform), so
    # checkpoints/porter paths are unaffected.

    @property
    def grid(self) -> int:
        return self.img_size // 16

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    def setup(self):
        d0, d1, d2 = self.embed_dims
        dt = self.dtype
        CB = nn.remat(ConvBlock) if self.remat_blocks else ConvBlock
        Blk = nn.remat(Block) if self.remat_blocks else Block
        self.embed1 = nn.Conv(d0, (4, 4), strides=(4, 4), dtype=dt)
        self.embed1_norm = nn.LayerNorm(dtype=dt)
        self.stage1 = [CB(d0, dtype=dt, use_fused_mlp=self.use_fused_mlp,
                          use_fused_front=self.use_fused_front)
                       for _ in range(self.depths[0])]
        self.embed2 = nn.Conv(d1, (2, 2), strides=(2, 2), dtype=dt)
        self.embed2_norm = nn.LayerNorm(dtype=dt)
        self.stage2 = [CB(d1, dtype=dt, use_fused_mlp=self.use_fused_mlp,
                          use_fused_front=self.use_fused_front)
                       for _ in range(self.depths[1])]
        self.embed3 = nn.Conv(d2, (2, 2), strides=(2, 2), dtype=dt)
        self.embed3_norm = nn.LayerNorm(dtype=dt)
        self.pos_embed = self.param(
            "pos_embed", lambda key, shape: sincos_pos_embed(d2, self.grid),
            (self.num_patches, d2))
        self.vit = [Blk(d2, self.num_heads, use_flash=self.use_flash_attention,
                        dtype=dt)
                    for _ in range(self.depths[2])]
        self.encoder_norm = nn.LayerNorm(dtype=dt)
        if self.with_decoder:
            self.decoder_embed = nn.Dense(self.decoder_dim, dtype=dt)
            self.mask_token = self.param(
                "mask_token", nn.initializers.normal(0.02), (1, 1, self.decoder_dim))
            self.dec_blocks = [Blk(self.decoder_dim, self.decoder_heads,
                                   use_flash=self.use_flash_attention,
                                   dtype=dt)
                               for _ in range(self.decoder_depth)]
            self.decoder_norm = nn.LayerNorm(dtype=dt)
            self.decoder_pred = nn.Dense(16 * 16 * 3, dtype=dt)

    # ------------------------------------------------------------- encoder
    def encode(self, imgs: jnp.ndarray, mask_ratio: float = 0.0,
               rng: Optional[jax.Array] = None,
               lesion_mask: Optional[jnp.ndarray] = None):
        """→ (latent [B, len_keep, 768], mask [B, N], ids_restore [B, N])."""
        b = imgs.shape[0]
        n = self.num_patches
        g = self.grid

        if mask_ratio > 0.0:
            if rng is None:
                rng = self.make_rng("masking")
            overlap = None
            if lesion_mask is not None:
                overlap = patch_overlap_mask(lesion_mask, patch=16)
            ids_keep, mask, ids_restore = random_masking(
                rng, b, n, mask_ratio, overlap)
            keep3 = (1.0 - mask).reshape(b, g, g, 1)  # stage-3 grid visibility
            # upsample visibility into the conv-stage grids (×4, ×2)
            keep1 = jnp.repeat(jnp.repeat(keep3, 4, axis=1), 4, axis=2)
            keep2 = jnp.repeat(jnp.repeat(keep3, 2, axis=1), 2, axis=2)
        else:
            ids_keep = jnp.tile(jnp.arange(n)[None, :], (b, 1))
            mask = jnp.zeros((b, n))
            ids_restore = ids_keep
            keep1 = keep2 = None

        x = self.embed1_norm(self.embed1(imgs.astype(self.dtype)))  # 56×56×256
        for blk in self.stage1:
            x = blk(x, keep1)
        x = self.embed2_norm(self.embed2(x))          # 28×28×384
        for blk in self.stage2:
            x = blk(x, keep2)
        x = self.embed3(x)                            # 14×14×768
        x = x.reshape(b, n, self.embed_dims[2])
        x = self.embed3_norm(x)
        x = x + self.pos_embed[None].astype(x.dtype)

        # drop masked tokens (static len_keep) before the transformer
        x = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
        for blk in self.vit:
            x = blk(x)
        x = self.encoder_norm(x).astype(jnp.float32)  # latents consumed in f32
        return x, mask, ids_restore

    def decode(self, latent: jnp.ndarray, ids_restore: jnp.ndarray):
        """→ predicted patch pixels [B, N, 16*16*3]."""
        b, len_keep, _ = latent.shape
        n = ids_restore.shape[1]
        x = self.decoder_embed(latent)
        fills = jnp.tile(self.mask_token, (b, n - len_keep, 1))
        x = jnp.concatenate([x, fills.astype(x.dtype)], axis=1)
        x = jnp.take_along_axis(x, ids_restore[:, :, None], axis=1)  # unshuffle
        x = x + sincos_pos_embed(self.decoder_dim, self.grid)[None].astype(x.dtype)
        for blk in self.dec_blocks:
            x = blk(x)
        x = self.decoder_norm(x)
        return self.decoder_pred(x).astype(jnp.float32)  # loss in f32

    def loss(self, imgs: jnp.ndarray, pred: jnp.ndarray, mask: jnp.ndarray):
        """MAE reconstruction loss: per-patch MSE averaged over masked patches,
        with optional per-patch pixel normalization of the target."""
        target = patchify(imgs, 16)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        per_patch = jnp.mean((pred - target) ** 2, axis=-1)  # [B, N]
        denom = jnp.maximum(mask.sum(), 1.0)
        return (per_patch * mask).sum() / denom

    def __call__(self, imgs: jnp.ndarray, mask_ratio: float = 0.75,
                 rng: Optional[jax.Array] = None,
                 lesion_mask: Optional[jnp.ndarray] = None):
        """Training forward → (loss, pred, mask) — the reference call signature
        ``ae_model(images, mask_ratio, lesion_mask)`` (``train_ae.py:172``).
        The encoder-only model (``with_decoder=False``) instead returns the
        (latent, mask, ids_restore) triple, matching ``save_latent.py:60``."""
        latent, mask, ids_restore = self.encode(imgs, mask_ratio, rng, lesion_mask)
        if not self.with_decoder:
            return latent, mask, ids_restore
        pred = self.decode(latent, ids_restore)
        loss = self.loss(imgs, pred, mask)
        return loss, pred, mask

    # reference-parity helpers --------------------------------------------
    def forward_encoder(self, imgs, mask_ratio=0.0, rng=None, lesion_mask=None):
        return self.encode(imgs, mask_ratio, rng, lesion_mask)

    @staticmethod
    def patchify(imgs):
        return patchify(imgs, 16)

    @staticmethod
    def unpatchify(pred):
        return unpatchify(pred, 16, 3)


def convmae_convvit_base_patch16_dec512d8b(norm_pix_loss: bool = False,
                                           with_decoder: bool = True,
                                           dtype=jnp.float32,
                                           use_fused_mlp: bool = False,
                                           use_fused_front: bool = False
                                           ) -> ConvMAE:
    """Constructor named for discoverability against the reference import
    (``train_ae.py:25``).  ``dtype=jnp.bfloat16`` = mixed-precision compute
    with fp32 params (the measured TPU training/serving configuration)."""
    return ConvMAE(norm_pix_loss=norm_pix_loss, with_decoder=with_decoder,
                   dtype=dtype, use_fused_mlp=use_fused_mlp,
                   use_fused_front=use_fused_front)


# --------------------------------------------------- torch weight porting

def port_torch_state_dict(state_dict, model: ConvMAE):
    """Convert a torch ConvMAE state dict (upstream ``ConvMAE/checkpoint.pth``
    naming: ``patch_embed{1,2,3}.proj/norm``, ``blocks{1,2}.N`` conv blocks,
    ``blocks3.N`` ViT blocks, ``norm``, ``decoder_*``, ``mask_token``) into a
    params pytree for :class:`ConvMAE`, plus the list of target module names
    the checkpoint did not cover.

    This is the capability behind the reference's
    ``load_state_dict(..., strict=False)`` initialization
    (``train_ae.py:136-141``): missing modules (e.g. a decoder absent from an
    encoder-only dump) are simply reported, and the caller keeps its fresh
    initialization for them — see :func:`load_pretrained`.

    Layout rules: torch OIHW conv → flax HWIO (depthwise [C,1,k,k] →
    [k,k,1,C]); ``Linear.weight`` → transposed Dense kernel; LayerNorm
    weight/bias → scale/bias; ``pos_embed`` [1,N,D] → [N,D].
    """
    import numpy as np

    # Deep-copy: torch state_dict tensors share storage with the live model,
    # and jnp.asarray on CPU zero-copies contiguous numpy arrays — without
    # the copy a later torch optimizer step would mutate the ported params
    # in place (see models/efficientnet.py::port_torch_state_dict).
    sd = {k: np.array(v, copy=True) for k, v in state_dict.items()}
    missing = []

    def conv(prefix):
        out = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
        if f"{prefix}.bias" in sd:
            out["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def dense(prefix):
        out = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T)}
        if f"{prefix}.bias" in sd:
            out["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return out

    def cblock(t):
        return {"LayerNorm_0": ln(f"{t}.norm1"), "Conv_0": conv(f"{t}.conv1"),
                "Conv_1": conv(f"{t}.attn"), "Conv_2": conv(f"{t}.conv2"),
                "LayerNorm_1": ln(f"{t}.norm2"), "Conv_3": conv(f"{t}.mlp.fc1"),
                "Conv_4": conv(f"{t}.mlp.fc2")}

    def vit_block(t):
        return {"LayerNorm_0": ln(f"{t}.norm1"),
                "Attention_0": {"Dense_0": dense(f"{t}.attn.qkv"),
                                "Dense_1": dense(f"{t}.attn.proj")},
                "LayerNorm_1": ln(f"{t}.norm2"),
                "Mlp_0": {"Dense_0": dense(f"{t}.mlp.fc1"),
                          "Dense_1": dense(f"{t}.mlp.fc2")}}

    params = {}

    def put(name, fn, *args):
        try:
            params[name] = fn(*args)
        except KeyError:
            missing.append(name)

    put("embed1", conv, "patch_embed1.proj")
    put("embed1_norm", ln, "patch_embed1.norm")
    put("embed2", conv, "patch_embed2.proj")
    put("embed2_norm", ln, "patch_embed2.norm")
    put("embed3", conv, "patch_embed3.proj")
    put("embed3_norm", ln, "patch_embed3.norm")
    for i in range(model.depths[0]):
        put(f"stage1_{i}", cblock, f"blocks1.{i}")
    for i in range(model.depths[1]):
        put(f"stage2_{i}", cblock, f"blocks2.{i}")
    for i in range(model.depths[2]):
        put(f"vit_{i}", vit_block, f"blocks3.{i}")
    put("encoder_norm", ln, "norm")
    if "pos_embed" in sd:
        params["pos_embed"] = jnp.asarray(
            sd["pos_embed"][0] if sd["pos_embed"].ndim == 3 else sd["pos_embed"])
    else:
        missing.append("pos_embed")
    if model.with_decoder:
        put("decoder_embed", dense, "decoder_embed")
        if "mask_token" in sd:
            params["mask_token"] = jnp.asarray(sd["mask_token"])
        else:
            missing.append("mask_token")
        for i in range(model.decoder_depth):
            put(f"dec_blocks_{i}", vit_block, f"decoder_blocks.{i}")
        put("decoder_norm", ln, "decoder_norm")
        put("decoder_pred", dense, "decoder_pred")
    return params, missing


def load_pretrained(params, state_dict, model: ConvMAE, log=print):
    """Merge a torch ConvMAE checkpoint into freshly initialized ``params``
    with the reference's ``strict=False`` semantics (``train_ae.py:139-141``):
    mapped modules are replaced only when their leaf shapes match; everything
    else keeps its initialization."""
    ported, missing = port_torch_state_dict(state_dict, model)
    merged = dict(params)
    skipped = []
    for name, sub in ported.items():
        if name not in merged:
            skipped.append(name)
            continue
        want = jax.tree_util.tree_map(jnp.shape, merged[name])
        have = jax.tree_util.tree_map(jnp.shape, sub)
        if want != have:
            skipped.append(name)
            continue
        merged[name] = sub
    if (missing or skipped) and log is not None:
        log(f"load_pretrained: kept init for missing={missing} "
            f"shape-mismatched={skipped}")
    return merged
