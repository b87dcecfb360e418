"""Blockwise (flash) attention Pallas kernel.

The reference's longest sequence is 196 ConvMAE patch tokens — no long-context
machinery exists upstream (SURVEY.md §2.3).  Per the build plan, ViT attention
is written blockwise so sequence scaling is a kernel-config change, not a
redesign: an online-softmax forward that never materializes the [N, N] score
matrix, with a recompute-based custom VJP so it trains.

Shapes: q, k, v [B, H, N, D]; non-causal (MAE attends densely).  Sequences
are padded to the q/k block sizes with masked-out keys.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(n_valid_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                  sm_scale: float):
    """Grid: (B*H, N/block_q).  Refs: q [block_q, D], k/v [N_pad, D]."""
    block_q, d = q_ref.shape
    n_pad = k_ref.shape[0]
    n_valid = n_valid_ref[0]

    q = q_ref[:] * sm_scale
    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    def body(ki, carry):
        m, l, acc = carry
        k0 = ki * block_k
        k_blk = k_ref[pl.ds(k0, block_k), :]
        v_blk = v_ref[pl.ds(k0, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        key_idx = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(key_idx < n_valid, s, NEG_INF)

        m_new = jnp.maximum(m, s.max(axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + p.sum(axis=1, keepdims=True)
        acc_new = alpha * acc + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_pad // block_k, body, (m, l, acc))
    o_ref[:] = acc / jnp.maximum(l, 1e-30)


def _flash_forward(q, k, v, block_q: int, block_k: int, interpret: bool):
    b, h, n, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)  # scale uses the TRUE head dim
    n_pad_q = ((n + block_q - 1) // block_q) * block_q
    n_pad_k = ((n + block_k - 1) // block_k) * block_k
    # Mosaic requires the lane (last) dim aligned to 128: zero-pad the head
    # dim — scores and outputs are unchanged (zero lanes contribute nothing)
    d_pad = ((d + 127) // 128) * 128

    def pad(x, to):
        return jnp.pad(x, ((0, 0), (0, 0), (0, to - n), (0, d_pad - d))).reshape(
            b * h, to, d_pad)

    qf, kf, vf = pad(q, n_pad_q), pad(k, n_pad_k), pad(v, n_pad_k)
    n_valid = jnp.full((1,), n, jnp.int32)

    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               sm_scale=sm_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, n_pad_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda g, i, *_: (g, i, 0)),
            pl.BlockSpec((1, n_pad_k, d_pad), lambda g, i, *_: (g, 0, 0)),
            pl.BlockSpec((1, n_pad_k, d_pad), lambda g, i, *_: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda g, i, *_: (g, i, 0)),
    )

    def squeezing_kernel(n_ref, q_ref, k_ref, v_ref, o_ref):
        kernel(n_ref, q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0])

    out = pl.pallas_call(
        squeezing_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad_q, d_pad), jnp.float32),
        interpret=interpret,
    )(n_valid, qf, kf, vf)
    return out.reshape(b, h, n_pad_q, d_pad)[:, :, :n, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, block_q: int = 128, block_k: int = 128,
                    interpret: bool = False):
    """Softmax attention, [B, H, N, D] → [B, H, N, D]."""
    return _flash_forward(q, k, v, block_q, block_k, interpret)


def _reference_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _fwd(q, k, v, block_q, block_k, interpret):
    return _flash_forward(q, k, v, block_q, block_k, interpret), (q, k, v)


def _bwd(block_q, block_k, interpret, res, g):
    # recompute-based backward (XLA): exact gradients, no stored [N, N]
    q, k, v = res
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
