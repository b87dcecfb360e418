"""Train state: a single pytree carrying everything a training run needs.

The reference keeps best weights as in-memory ``state_dict`` deepcopies and
never persists optimizer/step state (SURVEY.md §5 — no mid-run resume).  Here
params + optimizer moments + step + RNG live in one checkpointable pytree so
runs resume exactly.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .optim import Optimizer, OptState

PyTree = Any


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: PyTree
    opt_state: OptState
    rng: jax.Array

    @classmethod
    def create(cls, params: PyTree, optimizer: Optimizer, rng: jax.Array) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
            rng=rng,
        )

    def apply_gradients(self, grads: PyTree, optimizer: Optimizer) -> "TrainState":
        new_params, new_opt_state = optimizer.apply(grads, self.opt_state, self.params)
        return TrainState(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            rng=self.rng,
        )

    def next_rng(self) -> tuple:
        """Split off a fresh key functionally: returns (key, new_state)."""
        key, new = jax.random.split(self.rng)
        return key, self._replace(rng=new)


def param_count(params: PyTree) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
