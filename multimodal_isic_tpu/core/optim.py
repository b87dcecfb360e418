"""In-repo optimizers with PyTorch-identical update rules.

The reference trains with ``torch.optim.SGD/Adam/AdamW`` (``main.py:135``,
``train_ae.py:149-152``, ``utils_g_mil.py:139-146``).  torch's rules differ
from the common JAX library defaults (e.g. torch-Adam folds weight decay into
the gradient, torch-SGD applies momentum without dampening and steps with the
*current* buffer), so to hold per-step parity with the reference math these are
implemented from the torch update equations directly.

Per-parameter hyperparameters (the MAE's encoder-lr/decoder-lr split,
``train_ae.py:145-152``) are expressed by passing a callable
``lr=lambda path: ...`` — evaluated once per parameter leaf at init.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp

PyTree = Any
Schedule = Union[float, Callable[[str], float]]


def _per_leaf(value: Schedule, params: PyTree) -> PyTree:
    """Materialize a float-or-path-function hyperparameter per leaf."""
    if callable(value):
        leaves = jax.tree_util.tree_flatten_with_path(params)[0]
        vals = [value(_path_str(p)) for p, _ in leaves]
        treedef = jax.tree_util.tree_structure(params)
        return jax.tree_util.tree_unflatten(treedef, vals)
    return jax.tree_util.tree_map(lambda _: value, params)


def _path_str(path) -> str:
    parts = []
    for entry in path:
        if hasattr(entry, "key"):
            parts.append(str(entry.key))
        elif hasattr(entry, "idx"):
            parts.append(str(entry.idx))
        else:
            parts.append(str(entry))
    return "/".join(parts)


class OptState(NamedTuple):
    step: jnp.ndarray
    mu: PyTree  # first moment / momentum buffer
    nu: PyTree  # second moment (zeros tree for SGD)


@dataclass(frozen=True)
class Optimizer:
    """A (init, update) pair.  ``update`` returns parameter *deltas*."""

    init: Callable[[PyTree], OptState]
    update: Callable[[PyTree, OptState, PyTree], tuple]

    def apply(self, grads: PyTree, state: OptState, params: PyTree):
        updates, new_state = self.update(grads, state, params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return new_params, new_state


def _zeros_like_tree(params: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def sgd(lr: Schedule, momentum: float = 0.0, weight_decay: Schedule = 0.0) -> Optimizer:
    """torch.optim.SGD: ``g += wd*p; buf = mu*buf + g; p -= lr*buf``."""

    def init(params):
        return OptState(jnp.zeros((), jnp.int32), _zeros_like_tree(params),
                        _zeros_like_tree(params))

    def update(grads, state, params):
        lrs = _per_leaf(lr, params)
        wds = _per_leaf(weight_decay, params)
        step = state.step + 1

        def upd(g, p, buf, lr_, wd_):
            g = g + wd_ * p
            # torch seeds the buffer with g on step 1; with buf0 == 0 the
            # recurrence mu*buf + g reproduces that exactly.
            buf = momentum * buf + g if momentum else g
            return -lr_ * buf, buf

        flat = jax.tree_util.tree_map(upd, grads, params, state.mu, lrs, wds)
        updates = jax.tree_util.tree_map(lambda t: t[0], flat,
                                         is_leaf=lambda t: isinstance(t, tuple))
        new_mu = jax.tree_util.tree_map(lambda t: t[1], flat,
                                        is_leaf=lambda t: isinstance(t, tuple))
        return updates, OptState(step, new_mu, state.nu)

    return Optimizer(init, update)


def _adam_core(lr, b1, b2, eps, weight_decay, decoupled):
    def init(params):
        return OptState(jnp.zeros((), jnp.int32), _zeros_like_tree(params),
                        _zeros_like_tree(params))

    def update(grads, state, params):
        lrs = _per_leaf(lr, params)
        wds = _per_leaf(weight_decay, params)
        step = state.step + 1
        t = step.astype(jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t

        def upd(g, p, m, v, lr_, wd_):
            decay = jnp.zeros_like(p)
            if decoupled:
                decay = -lr_ * wd_ * p  # AdamW: decay directly on weights
            else:
                g = g + wd_ * p  # Adam: L2 folded into the gradient
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * jnp.square(g)
            m_hat = m / bc1
            v_hat = v / bc2
            return decay - lr_ * m_hat / (jnp.sqrt(v_hat) + eps), m, v

        flat = jax.tree_util.tree_map(upd, grads, params, state.mu, state.nu, lrs, wds)
        pick = lambda i: jax.tree_util.tree_map(
            lambda t: t[i], flat, is_leaf=lambda t: isinstance(t, tuple))
        return pick(0), OptState(step, pick(1), pick(2))

    return Optimizer(init, update)


def adam(lr: Schedule, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
         weight_decay: Schedule = 0.0) -> Optimizer:
    return _adam_core(lr, b1, b2, eps, weight_decay, decoupled=False)


def adamw(lr: Schedule, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
          weight_decay: Schedule = 1e-2) -> Optimizer:
    return _adam_core(lr, b1, b2, eps, weight_decay, decoupled=True)


def make_optimizer(name: str, lr: Schedule, weight_decay: Schedule = 0.0,
                   **kwargs) -> Optimizer:
    """Factory matching the reference's optimizer-selection switch
    (``utils_g_mil.py:139-146``: adam | adamw | sgd-with-momentum-0.9)."""
    name = name.lower()
    if name == "adam":
        return adam(lr, weight_decay=weight_decay, **kwargs)
    if name == "adamw":
        return adamw(lr, weight_decay=weight_decay, **kwargs)
    if name == "sgd":
        return sgd(lr, momentum=kwargs.pop("momentum", 0.9), weight_decay=weight_decay)
    raise ValueError(f"Unsupported optimizer: {name}")
