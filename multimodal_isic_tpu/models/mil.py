"""Gated-attention MIL over patch bags.

Reproduces ``AttentionMIL`` (``utils_g_mil.py:15-36``) — Linear+ReLU+Dropout
feature extractor, Tanh-gate attention with softmax over instances, weighted-
sum pooling, linear head, **softmax probabilities** returned (the reference
trains on ``CE(log(probs+1e-9), y)``, i.e. probs are the module's contract).

TPU-first: bags are fixed-shape [N, F] with an optional validity mask so
training vmaps over padded bags instead of the reference's bs=1 python loops
(SURVEY.md §6 'ragged bags' hard part).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e30


class AttentionMIL(nn.Module):
    input_dim: int = 76
    hidden_dim: int = 128
    att_dim: int = 64
    dropout: float = 0.5
    num_classes: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: Optional[jnp.ndarray] = None,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [N, input_dim] one bag; valid: [N] bool padding mask.
        → (probs [num_classes], attention [N, 1])."""
        h = nn.Dense(self.hidden_dim, name="feat_fc")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        scores = nn.Dense(1, name="att_fc2")(
            jnp.tanh(nn.Dense(self.att_dim, name="att_fc1")(h)))  # [N, 1]
        if valid is not None:
            scores = jnp.where(valid[:, None], scores, NEG_INF)
        a = jax.nn.softmax(scores, axis=0)
        z = jnp.sum(a * h, axis=0)  # [hidden]
        logits = nn.Dense(self.num_classes, name="classifier")(z)
        probs = jax.nn.softmax(logits, axis=0)
        return probs, a


def mil_loss(probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """The reference's idiom: CrossEntropy over log(probs + 1e-9)
    (``utils_g_mil.py:160,208``) — equivalent to NLL of renormalized
    log-probs; reproduced exactly including the epsilon."""
    logp = jnp.log(probs + 1e-9)
    # torch CE(log_input as logits) = -log_softmax(logp)[target]
    return -(jax.nn.log_softmax(logp)[target])
