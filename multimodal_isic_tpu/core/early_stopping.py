"""Early stopping with the reference's exact counter semantics.

Reproduces ``net_utils.py:130-158``: the counter starts at ``patience``, any
improvement resets it *and* snapshots the model, otherwise it decrements; the
call returns truthy (stop) exactly when the counter reaches zero.  Note the
off-by-design consequence kept for parity: patience counts epochs *since the
last improvement*, and an improvement on the final countdown epoch rescues the
run.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax

PyTree = Any


class EarlyStopping:
    def __init__(self, patience: int = 5, log: Optional[Callable[[str, float], None]] = None):
        self.patience = patience
        self.counter = patience
        self.best_loss = float("inf")
        self.best_params: Optional[PyTree] = None
        self._log = log

    def __call__(self, current_loss: float, params: PyTree) -> bool:
        improved = current_loss < self.best_loss
        if improved:
            self.best_loss = float(current_loss)
            self.counter = self.patience
        else:
            self.counter -= 1

        if self._log is not None:
            self._log("val/patience_counter", self.counter)

        if improved:
            # device arrays are immutable: holding the pytree is the
            # functional equivalent of the reference's state_dict deepcopy.
            self.best_params = jax.tree_util.tree_map(lambda x: x, params)

        return not self.counter

    def get_best_params(self) -> Optional[PyTree]:
        return self.best_params
