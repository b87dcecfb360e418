"""Device-side augmentation and preprocessing ops.

Replaces the reference's host-side albumentations pipelines (``main.py:76-94``
fusion policies, ``train_ae.py:88-105`` MAE policies, ``save_latent.py:26-30``
latent policy) with RNG-keyed, jit/vmap-able JAX ops that run batched on TPU.
Deterministic eval transforms (resize + ImageNet normalize) match the
reference numerically to interpolation tolerance; stochastic train transforms
are distributionally equivalent (albumentations' host RNG cannot be replayed).

All per-image ops take float32 [H, W, C] in the 0..255 range and an optional
mask [H, W]; batch policies vmap them under one jit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------- basic ops

def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_LINEAR-equivalent resize (half-pixel centers)."""
    out_shape = (*out_hw, img.shape[-1]) if img.ndim == 3 else out_hw
    # antialias=False: cv2.INTER_LINEAR does plain bilinear on downscale too
    return jax.image.resize(img, out_shape, method="linear", antialias=False)


def resize_nearest(mask: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(mask, out_hw, method="nearest")


@functools.lru_cache(maxsize=32)
def _bilinear_matrix(n_in: int, n_out: int):
    """Dense [n_out, n_in] NUMPY f32 matrix of the half-pixel-center 2-tap
    bilinear weights (antialias=False, edge-clamped) — each row holds the
    two weights cv2.INTER_LINEAR / ``jax.image.resize(method='linear')``
    uses for that output coordinate, so ``W @ x`` IS the 1-D resize.
    Returns numpy (NOT jnp): the cache is shared across jit traces, and a
    jnp array created inside a trace is a tracer — caching it would leak."""
    import numpy as np
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    # clamp the RAW tap indices independently: for src < 0 (upscale left
    # edge) both taps collapse onto pixel 0 with total weight 1 — the
    # edge-replicate rule cv2/jax.image.resize use
    lo_raw = np.floor(src).astype(np.int64)
    lo = np.clip(lo_raw, 0, n_in - 1)
    hi = np.clip(lo_raw + 1, 0, n_in - 1)
    frac = src - lo_raw
    w = np.zeros((n_out, n_in), np.float64)
    w[np.arange(n_out), lo] += 1.0 - frac
    w[np.arange(n_out), hi] += frac
    return np.asarray(w, np.float32)


@functools.partial(jax.jit, static_argnames=("out_hw", "dtype"))
def resize_bilinear_mxu(imgs: jnp.ndarray, out_hw: Tuple[int, int],
                        dtype=jnp.float32) -> jnp.ndarray:
    """Batched bilinear resize as two dense matmuls on the MXU.

    ``jax.image.resize`` lowers the static 450→380 serving resize to 2-tap
    XLA loop fusions that run "Compute"-bound at only 191-298 GB/s (r4
    trace: 11.6 ms of the 158 ms bs=512 serving step).  Expressing the same
    separable resize as ``A_h @ X @ A_wᵀ`` with the 2-tap weights embedded
    in dense banded matrices moves the work to the MXU, where ~225× the
    FLOPs run ~10× faster end-to-end.  ``dtype=bf16`` halves the
    intermediate bytes and doubles the matmul rate — the serving path's
    choice (the backbone computes in bf16 anyway); f32 matches
    ``resize_bilinear`` to float tolerance.

    imgs [B, H, W, C] (any real dtype incl. uint8) → [B, h, w, C] in
    ``dtype``.
    """
    h_out, w_out = out_hw
    _, h_in, w_in, _ = imgs.shape
    wh = jnp.asarray(_bilinear_matrix(h_in, h_out), dtype)   # [h_out, H]
    ww = jnp.asarray(_bilinear_matrix(w_in, w_out), dtype)   # [w_out, W]
    x = imgs.astype(dtype)
    # f32 must actually deliver the documented resize_bilinear parity: the
    # MXU's default f32 matmul rounds inputs through bf16 passes (~0.4% of
    # magnitude ≈ one uint8 LSB), so request full precision there.  The bf16
    # serving path keeps the native rate — bf16 rounding is the contract.
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)
    # contract H: [h_out, H] × [B, H, W, C] → [B, h_out, W, C]
    t = jnp.einsum("oh,bhwc->bowc", wh, x, precision=prec)
    # contract W: [w_out, W] × [B, h_out, W, C] → [B, h_out, w_out, C]
    return jnp.einsum("ow,bhwc->bhoc", ww, t, precision=prec)


@functools.partial(jax.jit, static_argnames=("out_hw", "dtype"))
def preprocess_eval_batch(imgs_u8: jnp.ndarray, out_hw: Tuple[int, int],
                          dtype=jnp.float32) -> jnp.ndarray:
    """Device-side eval/serving preprocess: uint8 batch → MXU resize →
    ImageNet normalize, entirely in ``dtype`` (the per-channel affine fuses
    into the second resize matmul's epilogue).  Matches
    ``normalize_imagenet(resize_bilinear(x))`` — the reference's
    deterministic eval transform (``main.py:88-94``) — to interpolation/
    ``dtype`` tolerance."""
    return normalize_imagenet(resize_bilinear_mxu(imgs_u8, out_hw,
                                                  dtype=dtype))


def normalize_imagenet(img: jnp.ndarray,
                       mean: Tuple[float, ...] = IMAGENET_MEAN,
                       std: Tuple[float, ...] = IMAGENET_STD) -> jnp.ndarray:
    """albumentations.Normalize: (img - 255*mean) / (255*std)."""
    mean = jnp.asarray(mean, img.dtype) * 255.0
    std = jnp.asarray(std, img.dtype) * 255.0
    return (img - mean) / std


def crop_and_resize(img: jnp.ndarray, y0, x0, crop_h, crop_w,
                    out_hw: Tuple[int, int], method: str = "linear") -> jnp.ndarray:
    """Resize an arbitrary (dynamically-positioned/sized) crop window to a
    static output size in one pass — the TPU-friendly formulation of
    RandomResizedCrop (no dynamic shapes; one fused scale_and_translate)."""
    oh, ow = out_hw
    scale = jnp.stack([oh / crop_h, ow / crop_w]).astype(jnp.float32)
    translation = jnp.stack([-y0 * scale[0], -x0 * scale[1]]).astype(jnp.float32)
    return jax.image.scale_and_translate(
        img, (oh, ow, img.shape[-1]), (0, 1), scale, translation,
        method=method, antialias=False)


# ----------------------------------------------------------- geometric augs

def random_flips_rot90(img: jnp.ndarray, mask: Optional[jnp.ndarray],
                       key: jax.Array, p: float = 0.5):
    """HorizontalFlip(p) + VerticalFlip(p) + RandomRotate90(p) applied jointly
    to image and mask (the reference's shared-transform behavior)."""
    k_h, k_v, k_r, k_rk = jax.random.split(key, 4)
    do_h = jax.random.uniform(k_h) < p
    do_v = jax.random.uniform(k_v) < p
    do_r = jax.random.uniform(k_r) < p
    rot_k = jnp.where(do_r, jax.random.randint(k_rk, (), 0, 4), 0)

    def apply(x, hw_axes):
        a0, a1 = hw_axes
        x = jnp.where(do_h, jnp.flip(x, axis=a1), x)
        x = jnp.where(do_v, jnp.flip(x, axis=a0), x)
        x = jax.lax.switch(rot_k, [
            lambda t: t,
            lambda t: jnp.flip(jnp.swapaxes(t, a0, a1), a0),
            lambda t: jnp.flip(jnp.flip(t, a0), a1),
            lambda t: jnp.flip(jnp.swapaxes(t, a0, a1), a1),
        ], x)
        return x

    img = apply(img, (0, 1))
    if mask is not None:
        mask = apply(mask, (0, 1))
    return img, mask


def _mirror_coord(c: jnp.ndarray, n: int) -> jnp.ndarray:
    """Continuous coordinate reflected into [0, n-1] with REFLECT_101
    semantics (period 2n-2, no edge repeat — scipy ``mode='mirror'``, cv2
    BORDER_REFLECT_101).  Reflecting the coordinate BEFORE interpolating is
    exactly scipy's rule, and it guarantees every bilinear tap lands in
    [0, n-1] (the +1 tap can reach n only with weight 0)."""
    period = 2.0 * (n - 1)
    m = jnp.abs(c) % period
    return jnp.minimum(m, period - m)


def _warp_taps(x: jnp.ndarray, src_y: jnp.ndarray, src_x: jnp.ndarray,
               order: int) -> jnp.ndarray:
    """Bilinear (order=1) / nearest (order=0) resample of ``x`` [H, W(, C)]
    at per-pixel source coordinates, REFLECT_101 borders.

    Value-equal to ``jax.scipy.ndimage.map_coordinates(mode='mirror')``
    (tested) but TPU-formulated: coordinates are mirror-reflected in range
    first, the four bilinear taps are packed side by side into one wide row
    ([H·W, 4C], built with pure edge-duplicate slicing), and the warp becomes
    ONE flat row-gather.  r5 on-chip profile, 128×380²: map_coordinates'
    per-channel 2D gathers 3062 ms → four flat takes 988 ms → this packed
    single take 447 ms (6.8×); values bitwise-equal across all three."""
    h, w = x.shape[:2]
    sy = _mirror_coord(src_y, h)
    sx = _mirror_coord(src_x, w)
    x3 = x[..., None] if x.ndim == 2 else x

    if order == 0:
        flat = x3.reshape(h * w, -1)
        yi = jnp.round(sy).astype(jnp.int32)
        xi = jnp.round(sx).astype(jnp.int32)
        out = jnp.take(flat, (yi * w + xi).reshape(-1), axis=0)
        return out.reshape(src_y.shape + x.shape[2:])

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    # 4-tap pack: [p00 | p01 | p10 | p11] per pixel.  Edge duplicates stand
    # in for the +1 taps on the last row/column, where the reflected
    # coordinate makes their weights exactly 0.
    nx = jnp.concatenate([x3[:, 1:], x3[:, -1:]], axis=1)
    ny = jnp.concatenate([x3[1:], x3[-1:]], axis=0)
    nxy = jnp.concatenate([ny[:, 1:], ny[:, -1:]], axis=1)
    q = jnp.concatenate([x3, nx, ny, nxy], axis=-1).reshape(h * w, -1)

    c = x3.shape[-1]
    taps = jnp.take(q, (y0 * w + x0).reshape(-1), axis=0).reshape(
        src_y.shape + (4, c))
    out = (taps[..., 0, :] * (1 - fy) * (1 - fx)
           + taps[..., 1, :] * (1 - fy) * fx
           + taps[..., 2, :] * fy * (1 - fx)
           + taps[..., 3, :] * fy * fx)
    return out.reshape(src_y.shape + x.shape[2:])


def _ssr_draw(key: jax.Array, shift_limit: float, scale_limit: float,
              rotate_limit: float, p: float):
    """ShiftScaleRotate's parameter draws, in its exact RNG-stream order
    (shared by the per-image and batched-Pallas paths so both consume
    identical randomness from the same key)."""
    k_apply, k_sh, k_sv, k_sc, k_rot = jax.random.split(key, 5)
    apply_it = jax.random.uniform(k_apply) < p
    dx = jax.random.uniform(k_sh, minval=-shift_limit, maxval=shift_limit)
    dy = jax.random.uniform(k_sv, minval=-shift_limit, maxval=shift_limit)
    scale = 1.0 + jax.random.uniform(k_sc, minval=-scale_limit, maxval=scale_limit)
    angle = jax.random.uniform(k_rot, minval=-rotate_limit, maxval=rotate_limit)
    return apply_it, dx, dy, scale, angle


def _ssr_inverse(h: int, w: int, dx, dy, scale, angle) -> jnp.ndarray:
    """Inverse affine (dst pixel → src coordinate) for cv2-convention
    shift/scale/rotate about the image center: the 6-vector
    (i11, i12, i13, i21, i22, i23) with sx = i11·x + i12·y + i13,
    sy = i21·x + i22·y + i23."""
    theta = jnp.deg2rad(angle)
    alpha = scale * jnp.cos(theta)
    beta = scale * jnp.sin(theta)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    # forward matrix (src -> dst), cv2.getRotationMatrix2D + shift
    a13 = (1 - alpha) * cx - beta * cy + dx * w
    a23 = beta * cx + (1 - alpha) * cy + dy * h
    det = alpha * alpha + beta * beta
    # inverse mapping: dst pixel -> src coordinate
    i11, i12 = alpha / det, -beta / det
    i21, i22 = beta / det, alpha / det
    i13 = -(i11 * a13 + i12 * a23)
    i23 = -(i21 * a13 + i22 * a23)
    return jnp.stack([i11, i12, i13, i21, i22, i23])


def shift_scale_rotate(img: jnp.ndarray, mask: Optional[jnp.ndarray],
                       key: jax.Array, shift_limit: float = 0.05,
                       scale_limit: float = 0.1, rotate_limit: float = 15.0,
                       p: float = 0.5):
    """Affine warp with cv2 conventions: rotation about the image center,
    uniform scale, fractional shift; REFLECT_101 border, bilinear for the
    image / nearest for the mask (albumentations ShiftScaleRotate defaults)."""
    h, w = img.shape[:2]
    apply_it, dx, dy, scale, angle = _ssr_draw(key, shift_limit, scale_limit,
                                               rotate_limit, p)
    i11, i12, i13, i21, i22, i23 = _ssr_inverse(h, w, dx, dy, scale, angle)

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    src_x = i11 * xs + i12 * ys + i13
    src_y = i21 * xs + i22 * ys + i23

    def warp(x, order):
        return _warp_taps(x, src_y, src_x, order)

    img_out = jnp.where(apply_it, warp(img, 1), img)
    if mask is not None:
        mask_out = jnp.where(apply_it, warp(mask.astype(jnp.float32), 0),
                             mask.astype(jnp.float32)).astype(mask.dtype)
    else:
        mask_out = None
    return img_out, mask_out


def random_resized_crop(img: jnp.ndarray, mask: Optional[jnp.ndarray],
                        key: jax.Array, out_hw: Tuple[int, int],
                        scale: Tuple[float, float] = (0.5, 1.0),
                        ratio: Tuple[float, float] = (0.75, 4.0 / 3.0)):
    """torchvision-semantics RandomResizedCrop (the reference MAE train crop,
    ``train_ae.py:90``): 10 area/aspect attempts, first valid wins, center-crop
    fallback — evaluated branch-free with a fixed 10-attempt batch."""
    h, w = img.shape[:2]
    area = float(h * w)
    k_area, k_ratio, k_i, k_j, k_pick = jax.random.split(key, 5)
    n = 10
    target_area = jax.random.uniform(k_area, (n,), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k_ratio, (n,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    ar = jnp.exp(log_ratio)
    ws = jnp.round(jnp.sqrt(target_area * ar))
    hs = jnp.round(jnp.sqrt(target_area / ar))
    valid = (ws > 0) & (ws <= w) & (hs > 0) & (hs <= h)
    # first valid attempt (argmax returns the first True)
    idx = jnp.argmax(valid)
    any_valid = jnp.any(valid)

    crop_w = jnp.where(any_valid, ws[idx], float(min(h, w)))
    crop_h = jnp.where(any_valid, hs[idx], float(min(h, w)))
    max_i = (h - crop_h).astype(jnp.int32)
    max_j = (w - crop_w).astype(jnp.int32)
    rnd_i = jax.random.randint(k_i, (), 0, jnp.maximum(max_i, 0) + 1)
    rnd_j = jax.random.randint(k_j, (), 0, jnp.maximum(max_j, 0) + 1)
    y0 = jnp.where(any_valid, rnd_i, (h - crop_h) // 2).astype(jnp.float32)
    x0 = jnp.where(any_valid, rnd_j, (w - crop_w) // 2).astype(jnp.float32)

    img_out = crop_and_resize(img, y0, x0, crop_h, crop_w, out_hw)
    mask_out = None
    if mask is not None:
        # scale_and_translate has no nearest kernel; for a binary mask,
        # linear-then-threshold is equivalent to nearest up to tie pixels.
        soft = crop_and_resize(mask.astype(jnp.float32)[..., None], y0, x0,
                               crop_h, crop_w, out_hw)[..., 0]
        mask_out = (soft > 0.5 * jnp.maximum(mask.max(), 1)).astype(
            jnp.float32) * jnp.maximum(mask.max(), 1)
    return img_out, mask_out


# ------------------------------------------------------------- color augs

def _rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # per-pixel 6-way select as where-chains: jnp.choose lowers to a slow
    # per-element gather on TPU (part of the r5 3.9 s/batch color_jitter
    # pathology); selects fuse into one elementwise loop
    def pick(opts):
        out = opts[5]
        for idx in range(4, -1, -1):
            out = jnp.where(i == idx, opts[idx], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(img: jnp.ndarray, key: jax.Array, brightness: float = 0.2,
                 contrast: float = 0.2, saturation: float = 0.2,
                 hue: float = 0.1, p: float = 0.5) -> jnp.ndarray:
    """torchvision-order ColorJitter: the four adjustments run in a random
    permutation with uniformly sampled factors (albumentations mirrors this)."""
    k_apply, k_perm, k_b, k_c, k_s, k_h = jax.random.split(key, 6)
    apply_it = jax.random.uniform(k_apply) < p
    fb = jax.random.uniform(k_b, minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(k_c, minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(k_s, minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(k_h, minval=-hue, maxval=hue)
    perm = jax.random.permutation(k_perm, 4)

    lum_w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)

    def adj_brightness(x):
        return x * fb

    def adj_contrast(x):
        mean = jnp.mean(jnp.clip(x, 0, 255) @ lum_w)
        return mean + fc * (x - mean)

    def adj_saturation(x):
        gray = (jnp.clip(x, 0, 255) @ lum_w)[..., None]
        return gray + fs * (x - gray)

    def adj_hue(x):
        hsv = _rgb_to_hsv(jnp.clip(x, 0, 255) / 255.0)
        # re-stack instead of .at[..., 0].set — the scatter into the channel
        # axis was the other half of the r5 color_jitter pathology
        shifted = jnp.stack([(hsv[..., 0] + fh) % 1.0,
                             hsv[..., 1], hsv[..., 2]], axis=-1)
        return _hsv_to_rgb(shifted) * 255.0

    # unrolled (fori_loop's sequential carry blocked fusion across the four
    # stages); lax.switch keeps the exact random-permutation-order semantics
    out = img
    for step_i in range(4):
        out = jax.lax.switch(perm[step_i], [adj_brightness, adj_contrast,
                                            adj_saturation, adj_hue], out)
    out = jnp.clip(out, 0.0, 255.0)
    return jnp.where(apply_it, out, img)


def gauss_noise(img: jnp.ndarray, key: jax.Array,
                var_limit: Tuple[float, float] = (10.0, 50.0),
                p: float = 0.3) -> jnp.ndarray:
    """Additive gaussian noise on the 0..255 scale (albumentations GaussNoise)."""
    k_apply, k_var, k_noise = jax.random.split(key, 3)
    apply_it = jax.random.uniform(k_apply) < p
    var = jax.random.uniform(k_var, minval=var_limit[0], maxval=var_limit[1])
    noise = jax.random.normal(k_noise, img.shape, img.dtype) * jnp.sqrt(var)
    return jnp.where(apply_it, jnp.clip(img + noise, 0.0, 255.0), img)


# ------------------------------------------------------------- policies

def fusion_train_transform(img: jnp.ndarray, mask: jnp.ndarray,
                           key: jax.Array, out_hw=(380, 380)):
    """Reference fusion train policy (``main.py:76-87``): Resize(380) →
    flips/rot90 → ShiftScaleRotate → ColorJitter → GaussNoise → Normalize."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = resize_bilinear(img, out_hw)
    mask = resize_nearest(mask, out_hw)
    img, mask = random_flips_rot90(img, mask, k1)
    img, mask = shift_scale_rotate(img, mask, k2)
    img = color_jitter(img, k3)
    img = gauss_noise(img, k4)
    return normalize_imagenet(img), mask


def fusion_eval_transform(img: jnp.ndarray, mask: jnp.ndarray, out_hw=(380, 380)):
    """Reference fusion eval policy (``main.py:89-94``)."""
    return normalize_imagenet(resize_bilinear(img, out_hw)), resize_nearest(mask, out_hw)


def mae_train_transform(img: jnp.ndarray, mask: jnp.ndarray, key: jax.Array,
                        out_hw=(224, 224)):
    """Reference MAE train policy (``train_ae.py:88-100``): RandomResizedCrop
    (scale .5-1, ratio .75-1.33) → flips/rot90 → Normalize."""
    k1, k2 = jax.random.split(key)
    img, mask = random_resized_crop(img, mask, k1, out_hw)
    img, mask = random_flips_rot90(img, mask, k2)
    return normalize_imagenet(img), mask


def mae_eval_transform(img: jnp.ndarray, mask: jnp.ndarray, out_hw=(224, 224)):
    """Reference MAE eval / latent-extraction policy (``train_ae.py:102-105``,
    ``save_latent.py:26-30``)."""
    return normalize_imagenet(resize_bilinear(img, out_hw)), resize_nearest(mask, out_hw)


def _batched(fn, stochastic: bool):
    if stochastic:
        def batched(images, masks, key):
            keys = jax.random.split(key, images.shape[0])
            return jax.vmap(fn)(images.astype(jnp.float32),
                                masks.astype(jnp.float32), keys)
    else:
        def batched(images, masks):
            return jax.vmap(fn)(images.astype(jnp.float32),
                                masks.astype(jnp.float32))
    return jax.jit(batched)


fusion_train_batch = _batched(fusion_train_transform, stochastic=True)
fusion_eval_batch = _batched(fusion_eval_transform, stochastic=False)
mae_train_batch = _batched(mae_train_transform, stochastic=True)
mae_eval_batch = _batched(mae_eval_transform, stochastic=False)


def make_fusion_train_fast(out_hw: Tuple[int, int] = (380, 380),
                           warp_dtype=jnp.bfloat16,
                           interpret: Optional[bool] = None):
    """TPU-fast fusion train policy: same augmentations and per-image RNG
    streams as ``fusion_train_transform``, but with the two gather-bound
    stages replaced by MXU formulations (r5 fused-epoch bottleneck,
    BENCH_DISK.json):

      - the batch-constant Resize(380) runs as one ``resize_bilinear_mxu``
        matmul pair over the whole batch instead of a vmapped per-image
        gather resize (the same substitution the serving benchmark made);
      - the ShiftScaleRotate warp runs through the gather-free Pallas
        kernel ``ops.pallas_warp.affine_warp_batch`` (tent-weight matmuls
        over VMEM source bands; value-equal to ``_warp_taps``, tested).

    Values match the reference-faithful ``fusion_train_batch`` for the same
    key up to resize/warp float-rounding (both resamplers are individually
    cv2-convention-exact; ``warp_dtype=bf16`` adds ≲1 intensity unit of
    weight rounding — augmentation-irrelevant, f32 available for tests).

    FUSION-ONLY: the fusion train step never consumes masks
    (``train.fusion.BATCH_KEYS``), so masks pass through untransformed.
    Use the faithful ``mae_train_batch`` wherever masks matter.
    """
    import functools as _ft

    from ..ops.pallas_warp import affine_warp_batch

    oh, ow = out_hw
    # mirror-pad budget: SSR's worst-case overhang is ~0.26·dim (|A−I|·r +
    # shift); 128 covers the 380² production shape, smaller test shapes
    # scale down (pad must stay < the image dims)
    pad = 128 if min(oh, ow) > 160 else max(16, (min(oh, ow) // 3) & ~7)
    wp = -(-(ow + 2 * pad) // 128) * 128
    hp = -(-(oh + 2 * pad) // 8) * 8
    band_x = min(384, wp)
    band_y = min(64, hp)
    draw = _ft.partial(_ssr_draw, shift_limit=0.05, scale_limit=0.1,
                       rotate_limit=15.0, p=0.5)

    @jax.jit
    def batched(images, masks, key):
        images = images.astype(jnp.float32)
        bsz = images.shape[0]
        keys = jax.random.split(key, bsz)
        sub = jax.vmap(lambda k: jax.random.split(k, 4))(keys)   # [B, 4, 2]
        k1, k2, k3, k4 = sub[:, 0], sub[:, 1], sub[:, 2], sub[:, 3]

        imgs = resize_bilinear_mxu(images, out_hw)
        imgs = jax.vmap(lambda im, k: random_flips_rot90(im, None, k)[0])(
            imgs, k1)
        apply_it, dx, dy, scale, angle = jax.vmap(draw)(k2)
        inv = jax.vmap(lambda a, b, c, d: _ssr_inverse(oh, ow, a, b, c, d))(
            dx, dy, scale, angle)
        interp = (jax.default_backend() != "tpu") if interpret is None else interpret
        warped = affine_warp_batch(imgs, inv, out_hw, pad=pad, band_y=band_y,
                                   band_x=band_x, compute_dtype=warp_dtype,
                                   interpret=interp)
        imgs = jnp.where(apply_it[:, None, None, None], warped, imgs)
        imgs = jax.vmap(color_jitter)(imgs, k3)
        imgs = jax.vmap(gauss_noise)(imgs, k4)
        return normalize_imagenet(imgs), masks

    return batched


POLICIES = {
    "fusion_train": fusion_train_batch,
    "fusion_eval": fusion_eval_batch,
    "fusion_train_fast": make_fusion_train_fast(),
    "mae_train": mae_train_batch,
    "mae_eval": mae_eval_batch,
}
