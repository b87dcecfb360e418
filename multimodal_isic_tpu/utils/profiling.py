"""Profiling & timing utilities (SURVEY.md §5: the reference has no tracing
at all — wall-clock radiomics logging only).

- ``StepTimer``: per-step wall times with percentile summaries, readback-
  closed (on the tunneled TPU backend ``block_until_ready`` returns at
  dispatch, so honest timing must synchronize through a device→host copy).
- ``trace``: context manager around ``jax.profiler`` writing a TensorBoard-
  loadable trace directory.
- ``timeit_closed``: the chain-then-readback throughput pattern used by
  bench.py, reusable for kernel microbenchmarks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import numpy as np


def readback(x) -> float:
    """Force device completion via a scalar device→host copy."""
    import jax.numpy as jnp
    leaves = [v for v in _leaves(x)]
    total = sum(jnp.sum(l) for l in leaves if hasattr(l, "dtype"))
    return float(total)


def _leaves(x):
    import jax
    return jax.tree_util.tree_leaves(x)


class StepTimer:
    """Accumulates per-step durations; ``summary()`` → mean/p50/p90/p99."""

    def __init__(self, sync_every: int = 1):
        self.times: List[float] = []
        self._sync_every = sync_every
        self._t0: Optional[float] = None
        self._pending = 0

    @contextlib.contextmanager
    def step(self, output=None):
        t0 = time.perf_counter()
        yield
        self._pending += 1
        if output is not None and self._pending >= self._sync_every:
            readback(output)
            self._pending = 0
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        a = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "steps": len(self.times),
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p90_s": float(np.percentile(a, 90)),
            "p99_s": float(np.percentile(a, 99)),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context (TensorBoard/XProf readable)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit_closed(fn: Callable[[], object], iters: int = 10,
                  repeats: int = 3) -> float:
    """Best-of per-iteration seconds for ``fn`` with a single readback
    closing each chain of ``iters`` dispatches."""
    out = fn()
    readback(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn()
        # the device executes dispatches in order: reading back the last
        # output waits for the whole chain
        readback(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
