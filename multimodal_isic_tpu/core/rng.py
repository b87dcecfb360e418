"""Seeded RNG streams.

The reference seeds four independent generators ad hoc (numpy / torch /
torch.cuda / random — ``main.py:60-64``, ``utils_g_mil.py:47-54``).  Here a
single root seed fans out into named, collision-free JAX PRNG streams; every
stochastic component (augmentation, masking, dropout, samplers, HPO) pulls
from its own stream so adding a consumer never perturbs the others.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import jax
import jax.numpy as jnp


def _stable_hash(name: str) -> int:
    """Deterministic 31-bit hash of a stream name (stable across processes,
    unlike Python's builtin ``hash``)."""
    digest = hashlib.sha256(name.encode()).digest()
    return int.from_bytes(digest[:4], "little") & 0x7FFFFFFF


class RngStream:
    """A named, stateful stream of PRNG keys derived from a root seed.

    >>> rng = RngStream(42, "augment")
    >>> k1 = rng.next()      # distinct key each call
    >>> k_ep = rng.at(epoch) # or a pure, index-addressed key
    """

    def __init__(self, seed: int, name: str):
        self.name = name
        self._base = jax.random.fold_in(jax.random.PRNGKey(seed), _stable_hash(name))
        self._counter = 0

    def next(self) -> jax.Array:
        key = jax.random.fold_in(self._base, self._counter)
        self._counter += 1
        return key

    def at(self, index: int) -> jax.Array:
        """Pure access: the key for a given step/epoch index."""
        return jax.random.fold_in(self._base, index)

    def split(self, n: int) -> jax.Array:
        return jax.random.split(self.next(), n)


class RngPool:
    """Factory handing out independent :class:`RngStream` s from one seed."""

    def __init__(self, seed: int):
        self.seed = int(seed)
        self._streams = {}

    def stream(self, name: str) -> RngStream:
        if name not in self._streams:
            self._streams[name] = RngStream(self.seed, name)
        return self._streams[name]

    def __getitem__(self, name: str) -> RngStream:
        return self.stream(name)


def key_iterator(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite iterator of keys derived from ``key``."""
    i = 0
    while True:
        yield jax.random.fold_in(key, i)
        i += 1
