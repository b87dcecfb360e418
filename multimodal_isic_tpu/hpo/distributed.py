"""Multi-host HPO: trials sharded across processes, scheduler state global.

The reference parallelizes its search by handing Ray fractional GPUs and
letting Ray's driver own the global ASHA state and the results table
(``tune_mil.py:142-149,243-274``).  The TPU-native replacement keeps the
single-process engines (sequential ``run_search`` and the vmapped packed
engine) untouched and distributes ABOVE them: each process of the
``jax.distributed`` runtime executes a round-robin slice of the trials on
its own chips, while the pieces Ray's driver centralizes ride jax's own
coordination service instead of a second control plane:

- :class:`CoordinationRungBoard` — ASHA rung results.  Every recorded rung
  value is published to the coordination-service KV store and each stop
  decision reads the rung directory back, so a trial on host A is judged
  against the rungs of trials on host B exactly as under Ray's shared
  scheduler (asynchronous, arrival-order dependent — ASHA's own contract).
- :func:`publish_result` / :func:`collect_results` — the results table.
  Each process publishes its finished trials as JSON; after a barrier every
  process assembles the SAME full table, so best-config selection is
  deterministic and identical everywhere (the coordinator alone writes the
  CSV/YAML artifacts).
- :func:`global_failure_count` — ``key_value_increment`` keeps the
  reference's ``max_failures=5`` abort global: five failures ACROSS hosts
  abort the sweep on every host at its next trial boundary.

Single-process, everything degrades to in-memory no-ops — the engines never
branch on process count themselves.
"""

from __future__ import annotations

import itertools
import json
from typing import Dict, List, Optional

_SEARCH_SEQ = itertools.count()


def _kv_client():
    """The coordination-service client, or None single-process."""
    try:
        import jax
        from jax._src.distributed import global_state
        if global_state.client is not None and jax.process_count() > 1:
            return global_state.client
    except Exception:
        pass
    return None


def search_namespace() -> str:
    """A KV-store namespace for one search invocation.  Every process calls
    the engines in the same order (SPMD discipline), so a per-process counter
    yields the same namespace everywhere without any exchange."""
    return f"s{next(_SEARCH_SEQ)}"


def shard_indices(n: int) -> List[int]:
    """This process's round-robin slice of ``range(n)`` (all of it
    single-process).  Round-robin, not contiguous, so ASHA's early rungs see
    a mix of every process's trials from the start."""
    import jax

    nproc = jax.process_count()
    if nproc <= 1:
        return list(range(n))
    return list(range(jax.process_index(), n, nproc))


class CoordinationRungBoard:
    """ASHA rung storage over the coordination-service KV store.

    ``append(rung, value)`` publishes this trial's rung value and returns
    EVERY value recorded at that rung so far across all processes — the list
    the scheduler percentiles against.  Falls back to a process-local dict
    when no multi-process runtime is up (then it is exactly the scheduler's
    own in-memory ``_rungs``)."""

    def __init__(self, namespace: str):
        self.ns = namespace
        self._client = _kv_client()
        self._local: Dict[int, List[float]] = {}
        self._seq = itertools.count()

    def append(self, rung: int, value: float) -> List[float]:
        if self._client is None:
            vals = self._local.setdefault(rung, [])
            vals.append(value)
            return list(vals)
        import jax

        key = (f"hpo/{self.ns}/rung/{rung:06d}/"
               f"{jax.process_index():03d}_{next(self._seq):06d}")
        self._client.key_value_set(key, repr(float(value)))
        entries = self._client.key_value_dir_get(
            f"hpo/{self.ns}/rung/{rung:06d}/")
        return [float(v) for _, v in entries]


def publish_result(namespace: str, trial_index: int, payload: Dict) -> None:
    """Record one finished trial (final metrics + bookkeeping) for every
    process to collect.  No-op single-process."""
    client = _kv_client()
    if client is None:
        return
    client.key_value_set(f"hpo/{namespace}/result/{trial_index:06d}",
                         json.dumps(payload))


def collect_results(namespace: str, expected: int,
                    max_failures: Optional[int] = None,
                    timeout_s: Optional[float] = None) -> Dict[int, Dict]:
    """Read back every process's published trials → {trial_index: payload}
    ({} single-process).

    Polls the result directory until ``expected`` entries exist instead of a
    fixed barrier: slices finish at very different times when trial costs are
    heterogeneous (graph-MIL shape keys), and a fast process must simply keep
    waiting, not time out.  The deadline (``ISIC_HPO_COLLECT_TIMEOUT_S``, or
    ``timeout_s``; default 24 h) only bounds true wedges.  While waiting, a
    blown GLOBAL failure budget raises here too — the owning process aborted
    mid-slice and its remaining trials will never arrive."""
    client = _kv_client()
    if client is None:
        return {}
    import os
    import time

    deadline = time.time() + float(
        timeout_s if timeout_s is not None
        else os.environ.get("ISIC_HPO_COLLECT_TIMEOUT_S", 86400))
    prefix = f"hpo/{namespace}/result/"
    while True:
        try:
            entries = client.key_value_dir_get(prefix)
        except Exception:  # no result published anywhere yet
            entries = []
        if len(entries) >= expected:
            break
        if max_failures is not None:
            n_fail = global_failure_count(namespace)
            if n_fail is not None and n_fail >= max_failures:
                raise RuntimeError(
                    f"aborting search: {n_fail} trials failed across "
                    f"processes while waiting for results")
        if time.time() > deadline:
            raise RuntimeError(
                f"collect_results timed out: {len(entries)}/{expected} "
                f"trial results published")
        time.sleep(0.5)
    out = {}
    for key, val in entries:
        out[int(key.rsplit("/", 1)[1])] = json.loads(val)
    return out


def global_failure_count(namespace: str,
                         new_failure: bool = False) -> Optional[int]:
    """Cross-process failed-trial counter (atomic ``key_value_increment``).
    Returns the global count after optionally recording one more failure, or
    None single-process (caller keeps its local count)."""
    client = _kv_client()
    if client is None:
        return None
    key = f"hpo/{namespace}/failures"
    if new_failure:
        return int(client.key_value_increment(key, 1))
    try:
        return int(client.key_value_try_get(key))
    except Exception:  # key absent: no failures recorded yet
        return 0
