"""A/B candidate formulations of the ShiftScaleRotate warp on the real chip.

The r5 fused-epoch measurement left the warp's gather as the last cost
between HBM-resident training (187.5 img/s) and the bare train step
(678 img/s): ~0.45 s/batch for one packed 4-tap row-gather per image,
vmapped over the batch (``data/augment._warp_taps``).  Candidates:

  A. shipped: vmapped per-image packed single take (447 ms/batch r5)
  B. whole-batch single flat take: one [B*H*W]-row gather into the
     batch-flattened [B*H*W, 4C] pack (removes the vmapped batch dim from
     the gather, letting XLA emit ONE gather op)
  C. nearest-neighbor taps (order=0) — NOT value-equal (bound probe only:
     how much of the cost is the 4-tap pack vs the gather itself)
  D. gather-free Pallas kernel (``ops.pallas_warp.affine_warp_batch``):
     tent-weight matmuls over VMEM source bands — bf16 (serving dtype)
     and f32 variants, max-err vs A reported

Each timed over chains of 10 iterations closed by device readbacks.
    python scripts/warp_ab.py
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

if os.environ.get("DEMO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DEMO_PLATFORM"])

from multimodal_isic_tpu.data.augment import _mirror_coord, _warp_taps

B, H, W, C = 128, 380, 380, 3


def coords(key):
    """Per-image inverse-affine source coordinate fields [B, H, W]."""
    ks = jax.random.split(key, 4)
    angle = jax.random.uniform(ks[0], (B,), minval=-15.0, maxval=15.0)
    scale = 1.0 + jax.random.uniform(ks[1], (B,), minval=-0.1, maxval=0.1)
    dx = jax.random.uniform(ks[2], (B,), minval=-0.05, maxval=0.05) * W
    dy = jax.random.uniform(ks[3], (B,), minval=-0.05, maxval=0.05) * H
    th = jnp.deg2rad(angle)
    al, be = scale * jnp.cos(th), scale * jnp.sin(th)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    a13 = (1 - al) * cx - be * cy + dx
    a23 = be * cx + (1 - al) * cy + dy
    det = al * al + be * be
    i11, i12 = al / det, -be / det
    i21, i22 = be / det, al / det
    i13 = -(i11 * a13 + i12 * a23)
    i23 = -(i21 * a13 + i22 * a23)
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    src_x = i11[:, None, None] * xs + i12[:, None, None] * ys + i13[:, None, None]
    src_y = i21[:, None, None] * xs + i22[:, None, None] * ys + i23[:, None, None]
    inv = jnp.stack([i11, i12, i13, i21, i22, i23], axis=1)
    return src_y, src_x, inv


@jax.jit
def warp_a(imgs, src_y, src_x):
    return jax.vmap(lambda x, sy, sx: _warp_taps(x, sy, sx, 1))(
        imgs, src_y, src_x)


@jax.jit
def warp_b(imgs, src_y, src_x):
    """One global flat gather over the batch-flattened 4-tap pack."""
    sy = _mirror_coord(src_y, H)
    sx = _mirror_coord(src_x, W)
    y0f, x0f = jnp.floor(sy), jnp.floor(sx)
    fy = (sy - y0f)[..., None]
    fx = (sx - x0f)[..., None]
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    nx = jnp.concatenate([imgs[:, :, 1:], imgs[:, :, -1:]], axis=2)
    ny = jnp.concatenate([imgs[:, 1:], imgs[:, -1:]], axis=1)
    nxy = jnp.concatenate([ny[:, :, 1:], ny[:, :, -1:]], axis=2)
    q = jnp.concatenate([imgs, nx, ny, nxy], axis=-1).reshape(B * H * W, 4 * C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None, None]
    idx = (base + y0 * W + x0).reshape(-1)
    taps = jnp.take(q, idx, axis=0).reshape(B, H, W, 4, C)
    return (taps[..., 0, :] * (1 - fy) * (1 - fx)
            + taps[..., 1, :] * (1 - fy) * fx
            + taps[..., 2, :] * fy * (1 - fx)
            + taps[..., 3, :] * fy * fx)


@jax.jit
def warp_c(imgs, src_y, src_x):
    return jax.vmap(lambda x, sy, sx: _warp_taps(x, sy, sx, 0))(
        imgs, src_y, src_x)


def bench(name, fn, imgs, sy, sx, iters=10):
    out = fn(imgs, sy, sx)
    _ = float(out.sum())  # compile + close
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        acc = None
        for _ in range(iters):
            acc = fn(imgs, sy, sx)
        _ = float(acc.sum())
        best = min(best, (time.time() - t0) / iters)
    print(f"{name}: {best * 1000:.1f} ms/batch = {B / best:.0f} img/s",
          flush=True)
    return out, best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, H, W, C), jnp.float32)
    sy, sx, inv = coords(jax.random.PRNGKey(0))
    sy, sx, inv = jax.device_put(sy), jax.device_put(sx), jax.device_put(inv)

    out_a, t_a = bench("A vmapped packed take (shipped)", warp_a, imgs, sy, sx)
    out_b, t_b = bench("B whole-batch flat take", warp_b, imgs, sy, sx)
    err = float(jnp.abs(out_a - out_b).max())
    print(f"A-vs-B max abs err: {err:.2e}", flush=True)
    bench("C nearest probe (not value-equal)", warp_c, imgs, sy, sx)
    print(f"speedup B/A: {t_a / t_b:.2f}x", flush=True)

    from multimodal_isic_tpu.ops.pallas_warp import affine_warp_batch
    interp = jax.default_backend() != "tpu"
    scaled = imgs * 255.0  # kernel errors quoted on the image 0..255 scale

    def warp_d16(im, _sy, _sx, inv=inv):
        return affine_warp_batch(im, inv, (H, W), interpret=interp)

    def warp_d32(im, _sy, _sx, inv=inv):
        return affine_warp_batch(im, inv, (H, W),
                                 compute_dtype=jnp.float32, interpret=interp)

    out_a255 = warp_a(scaled, sy, sx)
    out_d16, t_d16 = bench("D pallas gather-free bf16", warp_d16, scaled, sy, sx)
    out_d32, t_d32 = bench("D pallas gather-free f32", warp_d32, scaled, sy, sx)
    print(f"D16-vs-A max abs err (0..255 scale): "
          f"{float(jnp.abs(out_d16 - out_a255).max()):.3f}", flush=True)
    print(f"D32-vs-A max abs err (0..255 scale): "
          f"{float(jnp.abs(out_d32 - out_a255).max()):.2e}", flush=True)
    print(f"speedup D16/A: {t_a / t_d16:.2f}x, D32/A: {t_a / t_d32:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
