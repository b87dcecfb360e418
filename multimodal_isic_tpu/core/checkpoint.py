"""Sharding-aware checkpoint save/restore with resume.

The reference saves best weights once, never optimizer or step state
(``main.py:147-151``, ``train_ae.py:206-215``), so no run can resume mid-way.
Here the full :class:`TrainState` pytree (params + moments + step + RNG) is
persisted as an ``.npz`` plus a JSON manifest of the tree structure; restore
re-applies any :class:`jax.sharding.NamedSharding` layout via
``jax.device_put``, so a checkpoint written on one mesh can be loaded onto
another.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

PyTree = Any

_MANIFEST = "manifest.json"
_ARRAYS = "arrays.npz"


def _flatten(tree: PyTree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def _key_str(entry) -> str:
    """Stringify a tree_util path key.  GetAttrKey carries ``name`` (its str()
    is '.attr' — the leading dot that used to leak into saved paths), DictKey
    carries ``key``, SequenceKey carries ``idx``."""
    for attr in ("name", "key", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def _norm_path(path: str) -> str:
    """Normalize a stored leaf path: older checkpoints saved GetAttrKey parts
    with their leading dot ('.params/embed1/kernel')."""
    return "/".join(part.lstrip(".") for part in path.split("/"))


def _leaf_paths(tree: PyTree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return ["/".join(_key_str(entry) for entry in path) for path, _ in flat]


def save_checkpoint(directory: str, state: PyTree, step: Optional[int] = None,
                    metadata: Optional[dict] = None) -> str:
    """Write ``state`` under ``directory/step_<N>`` (or ``directory`` itself
    when ``step`` is None). Returns the checkpoint path."""
    path = directory if step is None else os.path.join(directory, f"step_{step:08d}")
    os.makedirs(path, exist_ok=True)

    leaves, treedef = _flatten(state)
    host_leaves = [np.asarray(jax.device_get(leaf)) for leaf in leaves]
    np.savez(os.path.join(path, _ARRAYS), *host_leaves)

    manifest = {
        "treedef": str(treedef),
        "num_leaves": len(host_leaves),
        "dtypes": [str(a.dtype) for a in host_leaves],
        "shapes": [list(a.shape) for a in host_leaves],
        "paths": _leaf_paths(state),
        "metadata": metadata or {},
    }
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))  # atomic: manifest last
    return path


def restore_checkpoint(path: str, target: PyTree, shardings: Optional[PyTree] = None) -> PyTree:
    """Restore into the structure of ``target``.  If ``shardings`` (a pytree of
    ``jax.sharding.Sharding`` matching ``target``) is given, leaves are placed
    accordingly; otherwise they stay as host numpy arrays inside the pytree."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    with np.load(os.path.join(path, _ARRAYS)) as data:
        arrays = [data[f"arr_{i}"] for i in range(manifest["num_leaves"])]

    leaves, treedef = _flatten(target)
    if len(leaves) != len(arrays):
        raise ValueError(
            f"checkpoint has {len(arrays)} leaves, target has {len(leaves)}")
    for a, l in zip(arrays, leaves):
        if tuple(a.shape) != tuple(np.shape(l)):
            raise ValueError(f"shape mismatch: checkpoint {a.shape} vs target {np.shape(l)}")

    if shardings is not None:
        shard_leaves = jax.tree_util.tree_leaves(shardings)
        arrays = [jax.device_put(a, s) for a, s in zip(arrays, shard_leaves)]
    return jax.tree_util.tree_unflatten(treedef, arrays)


def restore_partial(path: str, target: PyTree, strict: bool = False) -> PyTree:
    """Name-matched restore (the torch ``load_state_dict(strict=False)``
    capability the reference relies on, ``train_ae.py:141``,
    ``save_latent.py:49``): checkpoint leaves are matched to ``target`` leaves
    by their tree path; unmatched target leaves keep their current values,
    extra checkpoint leaves are ignored.  ``strict=True`` raises when any
    target leaf is missing from the checkpoint.  Returns (new_tree) and —
    when not strict — prints nothing; inspect the result with
    ``checkpoint_paths`` if needed."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    if "paths" not in manifest:
        raise ValueError("checkpoint has no leaf paths (older format); "
                         "use restore_checkpoint with a matching structure")
    with np.load(os.path.join(path, _ARRAYS)) as data:
        by_path = {}
        for i, p in enumerate(manifest["paths"]):
            name = _norm_path(p)
            by_path.setdefault(name, data[f"arr_{i}"])
            # a full-TrainState checkpoint restores into a bare params tree:
            # strip the 'params/' namespace as an alias (lower priority than
            # an exact match)
            if name.startswith("params/"):
                by_path.setdefault(name[len("params/"):], data[f"arr_{i}"])

    flat = jax.tree_util.tree_flatten_with_path(target)
    leaves_with_path, treedef = flat
    new_leaves = []
    missing = []
    for pathkeys, leaf in leaves_with_path:
        name = _norm_path("/".join(_key_str(e) for e in pathkeys))
        # aliases bridge the TrainState namespace in both directions:
        # TrainState ckpt → bare-params target (via the by_path alias) and
        # bare-params ckpt → TrainState target (strip the target prefix)
        candidates = [name, f"params/{name}"]
        if name.startswith("params/"):
            candidates.append(name[len("params/"):])
        hit = next((c for c in candidates
                    if c in by_path
                    and tuple(by_path[c].shape) == tuple(np.shape(leaf))), None)
        if hit is not None:
            new_leaves.append(by_path[hit])
        else:
            missing.append(name)
            new_leaves.append(leaf)
    if strict and missing:
        raise KeyError(f"missing/mismatched leaves in checkpoint: {missing[:8]}"
                       f"{'...' if len(missing) > 8 else ''}")
    if len(missing) == len(leaves_with_path) and leaves_with_path:
        # zero leaves matched: proceeding silently would hand back freshly
        # initialized weights as if restored (e.g. latent extraction on
        # random weights) — always an error, strict or not
        raise ValueError(
            f"restore_partial matched 0 of {len(leaves_with_path)} target "
            f"leaves from {path}; checkpoint paths look like "
            f"{manifest['paths'][:3]} — wrong checkpoint or namespace")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpoint_paths(path: str):
    with open(os.path.join(path, _MANIFEST)) as f:
        return json.load(f).get("paths", [])


def latest_checkpoint(directory: str) -> Optional[str]:
    """Most recent complete ``step_*`` checkpoint under ``directory``."""
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        d for d in os.listdir(directory)
        if d.startswith("step_") and os.path.exists(os.path.join(directory, d, _MANIFEST))
    )
    return os.path.join(directory, steps[-1]) if steps else None


def checkpoint_metadata(path: str) -> dict:
    with open(os.path.join(path, _MANIFEST)) as f:
        return json.load(f).get("metadata", {})
