"""Gather-free Pallas affine warp ≡ the packed-take warp (interpret mode).

The kernel computes DIRECT bilinear interpolation (not the separable
two-pass approximation), so its f32 values must match
``data.augment._warp_taps`` — which is map_coordinates-golden — to float
tolerance, including REFLECT_101 borders within the pad budget.
"""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_isic_tpu.data import augment
from multimodal_isic_tpu.data.augment import (_ssr_inverse, _warp_taps,
                                              make_fusion_train_fast)
from multimodal_isic_tpu.ops.pallas_warp import affine_warp_batch, mirror_pad

H = W = 160


def _ref_warp(imgs, inv):
    """vmapped packed-take warp at the same inverse affines."""
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]

    def one(img, p):
        sx = p[0] * xs + p[1] * ys + p[2]
        sy = p[3] * xs + p[4] * ys + p[5]
        return _warp_taps(img, sy, sx, 1)

    return jax.vmap(one)(imgs, inv)


def _ssr_invs(rng, n, rot=15.0, scale=0.1, shift=0.05):
    inv = [np.asarray(_ssr_inverse(
        H, W,
        rng.uniform(-shift, shift), rng.uniform(-shift, shift),
        1.0 + rng.uniform(-scale, scale), rng.uniform(-rot, rot)))
        for _ in range(n)]
    return jnp.asarray(np.stack(inv), jnp.float32)


def test_warp_matches_packed_take_f32():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (3, H, W, 3)), jnp.float32)
    inv = _ssr_invs(rng, 3)
    ours = affine_warp_batch(imgs, inv, (H, W), compute_dtype=jnp.float32,
                             interpret=True)
    ref = _ref_warp(imgs, inv)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-2)


def test_warp_extreme_params_still_exact():
    """Corners of the SSR domain: max rotation at min scale maximizes |i21|
    (0.288 — inside the BY=56 band limit 0.35), max shift exercises the
    mirror border."""
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randint(0, 256, (4, H, W, 3)), jnp.float32)
    cases = [(0.05, 0.05, 0.9, 15.0), (-0.05, 0.05, 0.9, -15.0),
             (0.2, -0.2, 1.1, 10.0), (0.0, 0.0, 1.0, 0.0)]
    inv = jnp.asarray(np.stack([
        np.asarray(_ssr_inverse(H, W, *c)) for c in cases]), jnp.float32)
    ours = affine_warp_batch(imgs, inv, (H, W), compute_dtype=jnp.float32,
                             interpret=True)
    ref = _ref_warp(imgs, inv)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-2)
    # identity affine reproduces the input exactly-ish
    np.testing.assert_allclose(np.asarray(ours[3]), np.asarray(imgs[3]),
                               atol=2e-2)


def test_warp_bf16_close_to_f32():
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randint(0, 256, (2, H, W, 3)), jnp.float32)
    inv = _ssr_invs(rng, 2)
    f32 = affine_warp_batch(imgs, inv, (H, W), compute_dtype=jnp.float32,
                            interpret=True)
    bf16 = affine_warp_batch(imgs, inv, (H, W), compute_dtype=jnp.bfloat16,
                             interpret=True)
    # bf16 tent-weight rounding: ≲0.4 % of the 0..255 scale
    assert float(jnp.abs(f32 - bf16).max()) < 2.5


def test_mirror_pad_matches_mirror_coord():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randint(0, 256, (1, 12, 12, 1)), jnp.float32)
    padded = mirror_pad(img, 5)[0, :, :, 0]
    for c in (-5, -1, 0, 3, 11, 12, 16):
        src = int(augment._mirror_coord(jnp.float32(c), 12))
        np.testing.assert_array_equal(np.asarray(padded[c + 5, 3 + 5]),
                                      np.asarray(img[0, src, 3, 0]))


def test_fast_policy_matches_faithful():
    """Same key ⇒ same augmentations: the fast policy differs only by
    resize/warp float rounding.  adj_hue's exact-equality branches can flip
    on isolated pixels under 1e-3 input perturbation, so the assertion is
    quantile-based with a loose max bound."""
    rng = np.random.RandomState(4)
    imgs = jnp.asarray(rng.randint(0, 256, (4, 450, 450, 3)), jnp.uint8)
    masks = jnp.asarray(rng.randint(0, 2, (4, 450, 450)) * 255, jnp.uint8)
    key = jax.random.PRNGKey(7)
    ref_img, _ = augment.POLICIES["fusion_train"](imgs, masks, key)
    fast = make_fusion_train_fast(warp_dtype=jnp.float32, interpret=True)
    fast_img, fast_mask = fast(imgs, masks, key)
    diff = np.abs(np.asarray(ref_img) - np.asarray(fast_img))
    assert np.quantile(diff, 0.999) < 0.05, np.quantile(diff, 0.999)
    assert diff.max() < 2.0, diff.max()
    # masks pass through untouched (fusion never consumes them)
    np.testing.assert_array_equal(np.asarray(fast_mask), np.asarray(masks))
