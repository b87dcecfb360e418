"""Multi-host (multi-process) distributed runtime — the ``jax.distributed`` +
ICI/DCN slot of SURVEY.md §2.3.

The reference has NO cross-process training path at all: its only
inter-process channel is Ray's object store for HPO trials
(``tune_mil.py:142,243``) and a ``multiprocessing.Pool`` for radiomics
(``RadiomicExtractor.py:58-71``).  This module supplies the TPU-native story
the build commits to: each host process calls :func:`initialize` once, after
which the ``jax.sharding.Mesh`` built by :func:`global_mesh` spans every chip
of every host; gradient all-reduces ride ICI inside a slice and DCN across
hosts, inserted by XLA from the same sharding annotations the single-process
path uses — model/train-step code does not change at all.

Input pipeline contract: each process loads only its own shard of the batch
(e.g. ``DeviceLoader`` over a per-host split of the manifest) and
:func:`host_local_batch_to_global` assembles the global sharded arrays with
``jax.make_array_from_process_local_data``.

On TPU pods ``jax.distributed.initialize()`` discovers the topology from the
environment; on CPU (tests, the virtual multi-host harness) collectives go
through Gloo over localhost.  A 2-process integration test proves a DP train
step across processes equals the single-process step
(``tests/test_distributed.py``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from .sharding import DATA_AXIS, MODEL_AXIS, data_sharding

# env plumbing (set by the launcher / scheduler):
ENV_COORD = "ISIC_COORDINATOR"      # e.g. "10.0.0.1:8476"
ENV_NPROC = "ISIC_NUM_PROCESSES"
ENV_PID = "ISIC_PROCESS_ID"


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join (or create) the distributed runtime.  Explicit args win, then the
    ``ISIC_*`` env vars, then jax's own auto-detection (TPU pods, SLURM).
    Returns True if a multi-process runtime was initialized, False when
    running single-process (no coordinator configured anywhere).

    Idempotent: calling again after initialization is a no-op (True).
    """
    # do NOT probe jax.process_count() here — that initializes the XLA
    # backend, after which jax.distributed.initialize refuses to run
    try:
        from jax._src.distributed import global_state
        if global_state.client is not None:
            return True
    except Exception:
        pass
    coordinator_address = coordinator_address or os.environ.get(ENV_COORD)
    if num_processes is None and os.environ.get(ENV_NPROC):
        num_processes = int(os.environ[ENV_NPROC])
    if process_id is None and os.environ.get(ENV_PID):
        process_id = int(os.environ[ENV_PID])
    if coordinator_address is None and num_processes is None:
        # TPU pod / cluster auto-detection still applies when the
        # environment provides it; otherwise stay single-process.
        try:
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:
            return False
    # CPU cross-process collectives need an explicit transport; harmless on
    # TPU (the config is only consulted by the CPU client).  Don't probe
    # jax.default_backend() here — it would initialize the backend first.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs (rank 0)."""
    return jax.process_index() == 0


def global_mesh(n_model: int = 1) -> "jax.sharding.Mesh":
    """(data, model) mesh over EVERY device of every process.  Device order
    follows ``jax.devices()`` (process-major), so the data axis puts each
    process's local devices on contiguous rows — per-host input shards map
    onto their own chips and batch traffic stays off DCN."""
    from .sharding import make_mesh

    return make_mesh(n_data=-1, n_model=n_model)


def host_local_batch_to_global(mesh, batch: Dict):
    """Assemble a pytree of PER-PROCESS batch shards into global arrays
    sharded over ``data``.  Each process passes only its local rows (global
    batch = num_processes × local rows, stacked in process order); no
    cross-host copies happen — every shard lands on its own host's devices.

    The multi-host analogue of ``shard_batch`` (which device_puts a fully
    host-resident batch on a single-process mesh)."""
    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, ndim=x.ndim), x)
    return jax.tree_util.tree_map(place, batch)


def process_local_rows(n_global: int) -> slice:
    """The [start, stop) row slice of a length-``n_global`` global batch this
    process should load (process-contiguous, matching
    :func:`host_local_batch_to_global`'s stacking order)."""
    nproc = jax.process_count()
    if n_global % nproc:
        raise ValueError(f"global batch {n_global} not divisible by "
                         f"{nproc} processes")
    per = n_global // nproc
    start = jax.process_index() * per
    return slice(start, start + per)


def process_epoch_order(order, global_batch_size: int,
                        pad_to_full: bool = False):
    """Split a GLOBAL epoch order into this process's per-batch slices.

    Global batch ``k`` covers ``order[k*G:(k+1)*G]``; each process loads the
    contiguous ``G/nproc``-row sub-slice matching its rank, so after
    :func:`host_local_batch_to_global` the assembled global batch equals the
    original order rows exactly — eval predictions concatenate in global
    order, same as single-process.

    Returns ``(local_order, per_process_batch_size, n_true)``.  Rows beyond
    the last full global batch are dropped, unless ``pad_to_full`` wraps the
    order to fill it (eval loaders: trim host-side results to ``n_true``).
    """
    order = np.asarray(order)
    nproc, pid = jax.process_count(), jax.process_index()
    if global_batch_size % nproc:
        raise ValueError(f"global batch {global_batch_size} not divisible "
                         f"by {nproc} processes")
    per = global_batch_size // nproc
    n_true = len(order)
    if pad_to_full and n_true % global_batch_size:
        pad = global_batch_size - n_true % global_batch_size
        reps = -(-pad // max(n_true, 1))
        order = np.concatenate([order] + [order] * reps)[
            : n_true + pad]
    nb = len(order) // global_batch_size
    if nb == 0:
        # a silent empty order would make the caller run ZERO steps per
        # epoch (NaN losses, never-improving early stopping) — fail loudly
        raise ValueError(
            f"epoch order has {n_true} rows < one global batch "
            f"({global_batch_size}); shrink the global batch or pass "
            f"pad_to_full=True")
    local = order[: nb * global_batch_size].reshape(
        nb, nproc, per)[:, pid].reshape(-1)
    return local, per, n_true


_REPLICATORS: Dict = {}


def _replicator(rep):
    """Jitted identity resharder, cached per target sharding — building a
    fresh ``jax.jit`` wrapper per call would retrace/relower the all-gather
    program for every eval batch."""
    fn = _REPLICATORS.get(rep)
    if fn is None:
        fn = jax.jit(lambda a: a, out_shardings=rep)
        _REPLICATORS[rep] = fn
    return fn


def gather_to_host(x) -> np.ndarray:
    """``np.asarray`` for possibly-multi-process values: fully-addressable
    arrays convert directly; cross-host sharded arrays are first replicated
    (an all-gather XLA inserts from the out-sharding) so every process gets
    the full value."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec as P

    return np.asarray(_replicator(NamedSharding(x.sharding.mesh, P()))(x))


def all_processes_equal(value: float, atol: float = 0.0) -> bool:
    """Cheap cross-process agreement check (coordination-service barrier via
    an all-gather of one scalar) — a debugging aid for divergence hunts."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = global_mesh()
    local = np.full((jax.local_device_count(), 1), value, np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)), local)
    gathered = np.asarray(_replicator(NamedSharding(mesh, P()))(garr))
    return bool(np.all(np.abs(gathered - gathered[0]) <= atol))


def setup():
    """One-call multi-process bootstrap for CLI entries: join the runtime
    (env/auto-detected), and when >1 process is present build the global
    mesh and the per-host batch placer.

    Returns ``(multiproc, mesh, place)`` — ``(False, None, None)`` in the
    ordinary single-process case, so callers can keep their single-device
    code path untouched.  Shared by ``cli/main.py`` and ``cli/train_ae.py``
    (and any future multi-host CLI) so the wiring lives in one place."""
    initialize()
    if jax.process_count() <= 1:
        return False, None, None
    mesh = global_mesh()
    return True, mesh, (lambda v: host_local_batch_to_global(mesh, v))
