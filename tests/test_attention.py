"""Flash-attention kernel ≡ reference softmax attention (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_isic_tpu.ops.attention import _reference_attention, flash_attention


@pytest.mark.parametrize("n", [196, 49, 300])
def test_flash_matches_reference(rng, n):
    q = jnp.asarray(rng.randn(2, 3, n, 32), jnp.float32)
    k = jnp.asarray(rng.randn(2, 3, n, 32), jnp.float32)
    v = jnp.asarray(rng.randn(2, 3, n, 32), jnp.float32)
    ours = flash_attention(q, k, v, interpret=True)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_flash_blocks_smaller_than_seq(rng):
    q = jnp.asarray(rng.randn(1, 2, 256, 16), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 256, 16), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 256, 16), jnp.float32)
    ours = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(ours),
                               np.asarray(_reference_attention(q, k, v)),
                               rtol=2e-4, atol=2e-5)


def test_flash_gradients_match(rng):
    q = jnp.asarray(rng.randn(1, 1, 32, 8), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, 32, 8), jnp.float32)
    v = jnp.asarray(rng.randn(1, 1, 32, 8), jnp.float32)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, 16, 16, True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v) ** 2).sum()

    ga = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
