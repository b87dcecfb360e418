"""Vmapped HPO trial populations — the TPU-native form of the reference's
fractional-GPU trial packing (``tune_mil.py:213-227``,
``utils_g_mil.py:79-91``).

The reference packs 4 torch processes onto one GPU via
``PER_PROC_GPU_MEM_FRACTION``; the TPU equivalent is to make a *population*
of same-shape trials ONE program: shape-affecting keys (hidden_dim, att_dim,
optimizer) are sampled once per cohort, the continuous keys (lr,
weight_decay, dropout) per trial, and the whole cohort trains in lockstep
under ``jax.vmap`` — one compile and one scan instead of P of each
(SURVEY.md §7's vmapped-trial-population design).

Dropout becomes a *traced* per-trial rate (``jax.random.bernoulli`` accepts a
traced p), so trials with different dropout share the program.  Every trial
keeps the sequential semantics of ``train/mil.py::_train_core``: same seed →
same init, same stratified 80/20 split, same per-epoch resampling order, the
CE(log(p+1e-9)) loss, per-trial patience and dual best-checkpoint tracking.
A population member with the same config reproduces the sequential
``train_mil`` result (tested).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import metrics as M
from ..core.splits import StratifiedShuffleSplit, weighted_sample_indices
from ..models.mil import AttentionMIL, mil_loss
from .space import GRAPH_MIL_SPACE, sample_config

SHAPE_KEYS = ("hidden_dim", "att_dim", "optimizer")
POP_KEYS = ("lr", "weight_decay", "dropout")

# Graph-MIL packing (the reference's flagship 1000-sample search,
# tune_mil.py:170-200, 4 trials/GPU at :33): the traced per-trial keys are
# the optimizer hyperparameters and the two dropout rates (GraphMIL accepts
# them as traced overrides); every architecture/topology key is a cohort
# shape key.  Sampling shape keys once per cohort guarantees FULL cohorts —
# bucketing independently-sampled 19-dim configs by shape signature would
# almost always yield singleton buckets (~1e8 distinct signatures).
GRAPH_POP_KEYS = ("lr", "weight_decay", "gnn_dropout", "pool_dropout")
GRAPH_SHAPE_KEYS = tuple(k for k in GRAPH_MIL_SPACE if k not in GRAPH_POP_KEYS)


class PackedSpec(NamedTuple):
    """What the generic packed-cohort engine needs from a model family.

    ``rate_keys``   — per-trial TRACED hyperparameters beyond lr/wd (dropout
                      rates); order matches the ``rates`` tuple in forward.
    ``init_params`` — (seed, x0, valid0) → single-trial param tree, exactly
                      the sequential trainable's init so a cohort member
                      reproduces the sequential trial.
    ``forward``     — (params, x, valid, extras, key, rates, train) →
                      (probs, aux).
    ``prep_bag``    — (x, valid, key) → per-bag extras shared by ALL trials
                      (the graph adjacency; None for classic MIL).  Computed
                      once per bag, NOT once per trial — a cohort-level win
                      the per-process reference packing cannot have.
    """
    rate_keys: tuple
    init_params: Callable
    forward: Callable
    prep_bag: Optional[Callable]


def _mil_forward(params, x, valid, key, dropout_rate, train: bool):
    """AttentionMIL forward with a TRACED dropout rate (same math as
    ``models.mil.AttentionMIL``, which holds the rate static)."""
    h = x @ params["feat_fc"]["kernel"] + params["feat_fc"]["bias"]
    h = jax.nn.relu(h)
    if train:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(key, keep, h.shape)
        # flax.linen.Dropout semantics: scale kept units by 1/keep
        h = jnp.where(mask, h / keep, 0.0)
    t = jnp.tanh(h @ params["att_fc1"]["kernel"] + params["att_fc1"]["bias"])
    scores = t @ params["att_fc2"]["kernel"] + params["att_fc2"]["bias"]
    scores = jnp.where(valid[:, None], scores, -1e30)
    a = jax.nn.softmax(scores, axis=0)
    z = jnp.sum(a * h, axis=0)
    logits = z @ params["classifier"]["kernel"] + params["classifier"]["bias"]
    return jax.nn.softmax(logits, axis=0), a


def _adam_update(g, p, m, v, t, lr, wd, b1=0.9, b2=0.999, eps=1e-8,
                 decoupled=False):
    """torch Adam/AdamW update (same rules as ``core.optim``), with lr/wd as
    traced scalars so they vmap across the population."""
    if decoupled:
        decay = -lr * wd * p
    else:
        g = g + wd * p
        decay = jnp.zeros_like(p)
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * jnp.square(g)
    m_hat = m / (1.0 - b1 ** t)
    v_hat = v / (1.0 - b2 ** t)
    return p + decay - lr * m_hat / (jnp.sqrt(v_hat) + eps), m, v


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def train_mil_population(
    shape_config: Dict,
    pop: Dict[str, np.ndarray],
    data: Dict,
    seed: int = 42,
    num_classes: int = 7,
    patience: int = 8,
    max_epochs: int = 50,
    report_fn=None,
    scheduler=None,
    trial_ids: Optional[Sequence[str]] = None,
) -> List[Dict]:
    """Train P AttentionMIL trials in lockstep.  ``pop`` holds per-trial
    'lr'/'weight_decay'/'dropout' arrays [P]; ``shape_config`` the shared
    hidden_dim/att_dim/optimizer.  See :func:`_train_population` for the
    engine semantics (in-cohort ASHA, patience, compaction)."""

    def make_spec(input_dim):
        model = AttentionMIL(input_dim=input_dim,
                             hidden_dim=int(shape_config["hidden_dim"]),
                             att_dim=int(shape_config["att_dim"]),
                             dropout=0.0, num_classes=num_classes)

        def init_params(seed_, x0, valid0):
            return model.init({"params": jax.random.PRNGKey(seed_),
                               "dropout": jax.random.PRNGKey(0)},
                              x0, valid=valid0)["params"]

        def forward(params, x, valid, extras, key, rates, train):
            return _mil_forward(params, x, valid, key, rates[0], train)

        return PackedSpec(("dropout",), init_params, forward, None)

    return _train_population(
        make_spec, shape_config, pop, data, seed=seed,
        num_classes=num_classes, patience=patience, max_epochs=max_epochs,
        report_fn=report_fn, scheduler=scheduler, trial_ids=trial_ids)


def train_graph_mil_population(
    shape_config: Dict,
    pop: Dict[str, np.ndarray],
    data: Dict,
    seed: int = 42,
    num_classes: int = 7,
    patience: int = 8,
    max_epochs: int = 50,
    report_fn=None,
    scheduler=None,
    trial_ids: Optional[Sequence[str]] = None,
) -> List[Dict]:
    """Train P GraphMIL trials in lockstep — the packed form of the
    reference's flagship graph search (``tune_mil.py:170-200``, 4 trials per
    GPU at ``:33``).  ``shape_config`` carries the 15 architecture/topology
    keys (sampled once per cohort); ``pop`` the per-trial traced
    lr/weight_decay/gnn_dropout/pool_dropout arrays [P].  The graph adjacency
    is built ONCE PER BAG and shared across the cohort (same
    graph_type/k per shape config) — work the reference's per-process packing
    duplicates 4×."""
    from ..train.mil import _adj_for_bag, graph_mil_from_config

    if shape_config.get("graph_type") == "random":
        # grid/knn graphs are a deterministic function of the bag, so
        # sharing one adjacency across the cohort is exact; a 'random'
        # topology must be drawn independently per trial (as the sequential
        # train_graph_mil does) — sharing it would silently correlate the
        # cohort.  The reference's search space is {grid, knn}
        # (tune_mil.py:180), so packed search never needs this.
        raise ValueError(
            "graph_type='random' cannot run packed: the cohort would share "
            "one topology draw. Use the sequential runner for random graphs.")

    def make_spec(input_dim):
        model = graph_mil_from_config(shape_config, input_dim, num_classes)

        def init_params(seed_, x0, valid0):
            # exactly train/mil.py::_train_core's graph init (eye adjacency)
            return model.init({"params": jax.random.PRNGKey(seed_),
                               "dropout": jax.random.PRNGKey(0)},
                              x0, jnp.eye(x0.shape[0]), valid=valid0)["params"]

        def prep_bag(x, valid, key):
            adj = _adj_for_bag(x, valid, shape_config, key)
            return adj * valid[:, None] * valid[None, :]

        def forward(params, x, valid, adj, key, rates, train):
            return model.apply({"params": params}, x, adj, valid=valid,
                               train=train, rngs={"dropout": key},
                               gnn_dropout_rate=rates[0],
                               pool_dropout_rate=rates[1])

        return PackedSpec(("gnn_dropout", "pool_dropout"), init_params,
                          forward, prep_bag)

    return _train_population(
        make_spec, shape_config, pop, data, seed=seed,
        num_classes=num_classes, patience=patience, max_epochs=max_epochs,
        report_fn=report_fn, scheduler=scheduler, trial_ids=trial_ids)


def _train_population(
    make_spec: Callable[[int], PackedSpec],
    shape_config: Dict,
    pop: Dict[str, np.ndarray],
    data: Dict,
    seed: int = 42,
    num_classes: int = 7,
    patience: int = 8,
    max_epochs: int = 50,
    report_fn=None,
    scheduler=None,
    trial_ids: Optional[Sequence[str]] = None,
) -> List[Dict]:
    """Generic packed-cohort trainer.  ``report_fn(trial_idx, metrics_dict)``
    is called per trial per epoch.  → list of P final-report dicts (the
    ``_train_core`` contract minus the private params entries, plus them).

    ``scheduler`` (an :class:`..hpo.asha.ASHAScheduler` or anything with its
    ``on_result(trial_id, epoch, metrics) -> 'continue'|'stop'`` protocol)
    evaluates rungs per trial per epoch INSIDE the packed run — the
    reference runs ASHA over its fractional-GPU-packed trials the same way
    (``tune_mil.py:144-149,213-227``).  Stopped trials (ASHA or patience)
    are masked out of best-checkpoint tracking immediately, and whenever
    at most half the cohort is still live the cohort is COMPACTED: live
    trials are re-packed into a power-of-2-sized vmap program (at most
    log2(P) recompiles, shape-cached), so early stopping buys wall-clock,
    not just budget accounting.  Each stopped trial's best checkpoints are
    snapshotted to host before compaction and the final test evaluation
    re-assembles the full population."""
    from ..train.mil import pad_bags

    P = len(np.asarray(pop["lr"]))
    P0 = P
    lrs = jnp.asarray(pop["lr"], jnp.float32)
    wds = jnp.asarray(pop["weight_decay"], jnp.float32)
    decoupled = shape_config.get("optimizer", "adam") == "adamw"
    if trial_ids is None:
        trial_ids = [f"t{t:03d}" for t in range(P)]

    rng = np.random.RandomState(seed)
    train_feats = [np.asarray(a, np.float32) for a in data["train_feats"]]
    train_labels = np.asarray([int(l) for l in data["train_labels"]])
    test_feats = [np.asarray(a, np.float32) for a in data.get("test_feats", [])]
    test_labels = np.asarray([int(l) for l in data.get("test_labels", [])])

    sss = StratifiedShuffleSplit(n_splits=1, test_size=0.2, random_state=seed)
    tr_idx, va_idx = next(sss.split(np.zeros((len(train_labels), 1)), train_labels))
    max_n = max(b.shape[0] for b in train_feats + (test_feats or []))
    feats_all, valid_all = pad_bags(train_feats, max_n)
    tr_feats, tr_valid = feats_all[tr_idx], valid_all[tr_idx]
    tr_labels = train_labels[tr_idx]
    va_feats = jnp.asarray(feats_all[va_idx])
    va_valid = jnp.asarray(valid_all[va_idx])
    va_labels = train_labels[va_idx]

    input_dim = train_feats[0].shape[1]
    spec = make_spec(input_dim)
    rates = [jnp.asarray(pop[k], jnp.float32) for k in spec.rate_keys]
    zero_rates = tuple(jnp.float32(0.0) for _ in spec.rate_keys)
    # one init shared by the cohort — run_search hands every sequential trial
    # the same seed, so this matches the sequential protocol exactly
    params1 = spec.init_params(seed, jnp.asarray(tr_feats[0]),
                               jnp.asarray(tr_valid[0]))
    broadcast = lambda a: jnp.broadcast_to(a[None], (P,) + a.shape)
    params = jax.tree_util.tree_map(broadcast, params1)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    m_state, v_state = zeros, zeros

    if spec.prep_bag is not None:
        # eval-time extras are deterministic (PRNGKey(0), as the sequential
        # eval path uses) and shared across trials AND epochs — precompute
        @jax.jit
        def prep_all(feats, valid):
            return jax.vmap(lambda x, v: spec.prep_bag(
                x, v, jax.random.PRNGKey(0)))(feats, valid)
        va_extras = prep_all(va_feats, va_valid)
    else:
        va_extras = None

    @jax.jit
    def train_epoch(params, m_state, v_state, step0, feats, valid, labels,
                    epoch_key, lrs, wds, rates, tidx):
        n = feats.shape[0]
        keys = jax.random.split(epoch_key, n)

        def bag_step(carry, inp):
            params, m_state, v_state, step = carry
            x, vmask, y, key = inp
            step = step + 1
            # per-bag extras (graph adjacency) computed ONCE, shared by the
            # whole cohort; the bag-level key matches the sequential path's
            extras = (spec.prep_bag(x, vmask, key)
                      if spec.prep_bag is not None else None)
            # keys derive from the trial's ORIGINAL index so a trial's
            # dropout stream survives cohort compaction
            trial_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(tidx)

            def one(p, mm, vv, lr, wd, rates_t, tkey):
                def loss_fn(pp):
                    probs, _ = spec.forward(pp, x, vmask, extras, tkey,
                                            rates_t, True)
                    return mil_loss(probs, y)
                loss, g = jax.value_and_grad(loss_fn)(p)
                new = jax.tree_util.tree_map(
                    lambda gg, pp, m_, v_: _adam_update(
                        gg, pp, m_, v_, step.astype(jnp.float32), lr, wd,
                        decoupled=decoupled),
                    g, p, mm, vv)
                pick = lambda i: jax.tree_util.tree_map(
                    lambda t: t[i], new, is_leaf=lambda t: isinstance(t, tuple))
                return pick(0), pick(1), pick(2), loss

            params, m_state, v_state, losses = jax.vmap(one)(
                params, m_state, v_state, lrs, wds, tuple(rates), trial_keys)
            return (params, m_state, v_state, step), losses

        (params, m_state, v_state, step), losses = jax.lax.scan(
            bag_step, (params, m_state, v_state, step0),
            (feats, valid, jnp.asarray(labels), keys))
        return params, m_state, v_state, step, losses.mean(axis=0)

    @jax.jit
    def select(improved, new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                improved.reshape((-1,) + (1,) * (a.ndim - 1)), a, b), new, old)

    @jax.jit
    def eval_metrics_dev(params, feats, valid, extras, y):
        """ONE device program: cohort forward + the full 10-metric bundle for
        every trial, → dict of [P] arrays.  The metrics library is pure jnp
        over fixed class axes so it vmaps across the population — one launch
        and one host readback per epoch instead of P of each."""
        def one_trial(p):
            if extras is None:
                probs = jax.vmap(lambda x, v: spec.forward(
                    p, x, v, None, jax.random.PRNGKey(0), zero_rates,
                    False)[0])(feats, valid)
            else:
                probs = jax.vmap(lambda x, v, e: spec.forward(
                    p, x, v, e, jax.random.PRNGKey(0), zero_rates,
                    False)[0])(feats, valid, extras)
            losses = jax.vmap(mil_loss)(probs, y)
            return M.evaluate_probs(y, probs, num_classes, loss=losses.mean())
        return jax.vmap(one_trial)(params)

    def eval_metrics(params, feats, valid, extras, labels):
        mt = jax.device_get(
            eval_metrics_dev(params, feats, valid, extras, jnp.asarray(labels)))
        p_now = int(next(iter(mt.values())).shape[0])
        return [{k: float(v[t]) for k, v in mt.items()} for t in range(p_now)]

    # per-ORIGINAL-trial bookkeeping (host side, survives compaction)
    best_bacc = np.full(P0, -np.inf)
    best_loss = np.full(P0, np.inf)
    best_bacc_metrics: List[Optional[Dict]] = [None] * P0
    best_loss_metrics: List[Optional[Dict]] = [None] * P0
    no_improve = np.zeros(P0, int)
    stopped = np.zeros(P0, bool)
    asha_stopped = np.zeros(P0, bool)
    epochs_run = np.zeros(P0, int)
    host_bacc_params: List[Optional[Dict]] = [None] * P0  # snapshots of
    host_loss_params: List[Optional[Dict]] = [None] * P0  # compacted-out trials

    # device-side cohort state; ``orig`` maps cohort position -> original id
    best_bacc_params = params
    best_loss_params = params
    orig = np.arange(P0)
    tidx = jnp.arange(P0, dtype=jnp.int32)
    step0 = jnp.zeros((), jnp.int32)
    tr_feats_d = jnp.asarray(tr_feats)
    tr_valid_d = jnp.asarray(tr_valid)

    def snapshot(t_pos):
        """Host-copy one cohort member's best checkpoints."""
        take = lambda tree: jax.tree_util.tree_map(
            lambda a: np.asarray(a[t_pos]), tree)
        return take(best_bacc_params), take(best_loss_params)

    def compact(keep_pos):
        """Re-pack live cohort members into a smaller vmap program (padded
        to a power of two with copies of the first live trial, masked out of
        all bookkeeping via phantom=True)."""
        nonlocal params, m_state, v_state, best_bacc_params, best_loss_params
        nonlocal lrs, wds, rates, orig, tidx, phantom
        p_new = _next_pow2(len(keep_pos))
        pad = [keep_pos[0]] * (p_new - len(keep_pos))
        sel = np.asarray(list(keep_pos) + pad, np.int32)
        take = lambda tree: jax.tree_util.tree_map(lambda a: a[sel], tree)
        params, m_state, v_state = take(params), take(m_state), take(v_state)
        best_bacc_params, best_loss_params = (take(best_bacc_params),
                                              take(best_loss_params))
        lrs, wds = lrs[sel], wds[sel]
        rates = [r[sel] for r in rates]
        tidx = tidx[sel]
        orig = orig[sel]
        phantom = np.zeros(p_new, bool)
        phantom[len(keep_pos):] = True

    phantom = np.zeros(P0, bool)
    for epoch in range(1, max_epochs + 1):
        order = weighted_sample_indices(tr_labels, None, rng)
        params, m_state, v_state, step0, _ = train_epoch(
            params, m_state, v_state, step0, tr_feats_d[order],
            tr_valid_d[order], tr_labels[order],
            jax.random.fold_in(jax.random.PRNGKey(seed), epoch),
            lrs, wds, rates, tidx)

        vm = eval_metrics(params, va_feats, va_valid, va_extras, va_labels)
        p_now = len(orig)
        bacc = np.array([m["bacc"] for m in vm])
        loss = np.array([m["loss"] for m in vm])
        live = ~stopped[orig] & ~phantom
        improved_b = (bacc > best_bacc[orig] + 1e-6) & live
        improved_l = (loss < best_loss[orig] - 1e-6) & live
        best_bacc_params = select(jnp.asarray(improved_b), params,
                                  best_bacc_params)
        best_loss_params = select(jnp.asarray(improved_l), params,
                                  best_loss_params)
        for pos in range(p_now):
            t = orig[pos]
            if stopped[t] or phantom[pos]:
                continue
            epochs_run[t] = epoch
            if improved_b[pos]:
                best_bacc[t] = bacc[pos]
                best_bacc_metrics[t] = vm[pos]
                no_improve[t] = 0
            else:
                no_improve[t] += 1
            if improved_l[pos]:
                best_loss[t] = loss[pos]
                best_loss_metrics[t] = vm[pos]
            if report_fn is not None:
                report_fn(t, {f"val_{k}": vm[pos][k] for k in
                              ("bacc", "acc", "auc", "loss", "macro_p",
                               "macro_r", "macro_f1", "weighted_p",
                               "weighted_r", "weighted_f1")})
            if no_improve[t] >= patience:
                stopped[t] = True
            if not stopped[t] and scheduler is not None:
                decision = scheduler.on_result(
                    trial_ids[t], epoch,
                    {"val_bacc": vm[pos]["bacc"], "val_loss": vm[pos]["loss"]})
                if decision == "stop":
                    stopped[t] = True
                    # reaching the scheduler's max_t also reports "stop" —
                    # that's a completed trial, not an early stop
                    asha_stopped[t] = epoch < getattr(
                        scheduler, "max_t", max_epochs)
        live_pos = [pos for pos in range(p_now)
                    if not stopped[orig[pos]] and not phantom[pos]]
        if not live_pos:
            break
        # snapshot + compact once at most half the cohort is live (power-of-2
        # sizes bound recompiles at log2(P))
        if _next_pow2(len(live_pos)) <= p_now // 2:
            for pos in range(p_now):
                t = orig[pos]
                if (stopped[t] and not phantom[pos]
                        and host_bacc_params[t] is None):
                    host_bacc_params[t], host_loss_params[t] = snapshot(pos)
            compact(live_pos)

    need_backfill = [t for t in range(P0) if best_bacc_metrics[t] is None]
    # loop-invariant: one vmapped cohort eval covers every backfilled trial
    vm_all = (eval_metrics(params, va_feats, va_valid, va_extras, va_labels)
              if need_backfill else None)
    for t in need_backfill:
        pos = int(np.where(orig == t)[0][0]) if t in orig else None
        best_bacc_metrics[t] = (vm_all[pos] if pos is not None
                                else {"bacc": float("nan"),
                                      "acc": float("nan"),
                                      "auc": float("nan"),
                                      "loss": float("nan"),
                                      "macro_f1": float("nan"),
                                      "weighted_f1": float("nan")})
    for t in range(P0):
        if best_loss_metrics[t] is None:
            best_loss_metrics[t] = best_bacc_metrics[t]

    test_bacc_metrics = test_loss_metrics = [None] * P0
    if len(test_feats) and len(test_labels):
        # re-assemble the FULL population's best checkpoints (device state
        # for surviving trials, host snapshots for compacted-out ones)
        for pos in range(len(orig)):
            t = orig[pos]
            if not phantom[pos] and host_bacc_params[t] is None:
                host_bacc_params[t], host_loss_params[t] = snapshot(pos)
        stack = lambda trees: jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees)
        full_bacc = stack([host_bacc_params[t] for t in range(P0)])
        full_loss = stack([host_loss_params[t] for t in range(P0)])
        te_feats, te_valid = pad_bags(test_feats, max_n)
        te_feats, te_valid = jnp.asarray(te_feats), jnp.asarray(te_valid)
        te_extras = (prep_all(te_feats, te_valid)
                     if spec.prep_bag is not None else None)
        test_bacc_metrics = eval_metrics(full_bacc, te_feats, te_valid,
                                         te_extras, test_labels)
        test_loss_metrics = eval_metrics(full_loss, te_feats, te_valid,
                                         te_extras, test_labels)

    reports = []
    for t in range(P0):
        vm = best_bacc_metrics[t]
        rep = {"val_bacc": float(max(best_bacc[t], vm["bacc"])),
               "val_acc": vm["acc"], "val_auc": vm["auc"], "val_loss": vm["loss"],
               "val_macro_f1": vm["macro_f1"],
               "val_weighted_f1": vm["weighted_f1"],
               "epochs_run": int(epochs_run[t]),
               "stopped_early": bool(asha_stopped[t])}
        if test_bacc_metrics[t] is not None:
            tb = test_bacc_metrics[t]
            rep.update({"test_bacc": tb["bacc"], "test_acc": tb["acc"],
                        "test_auc": tb["auc"], "test_loss": tb["loss"],
                        "test_macro_f1": tb["macro_f1"],
                        "test_weighted_f1": tb["weighted_f1"]})
            rep["_test_best_bacc"] = tb
            rep["_test_best_loss"] = test_loss_metrics[t]
        if report_fn is not None:
            report_fn(t, {k: v for k, v in rep.items()
                          if not k.startswith("_")})
        reports.append(rep)
    return reports


def estimate_trial_param_bytes(model_type: str, shape_config: Dict,
                               input_dim: int, num_classes: int) -> int:
    """f32 parameter bytes of ONE trial of this shape config (via
    ``jax.eval_shape`` — no device allocation)."""
    if model_type == "graph-mil":
        from ..train.mil import graph_mil_from_config
        model = graph_mil_from_config(shape_config, input_dim, num_classes)
        shapes = jax.eval_shape(
            lambda r: model.init({"params": r, "dropout": r},
                                 jnp.zeros((4, input_dim)), jnp.eye(4),
                                 valid=jnp.ones(4, bool)),
            jax.random.PRNGKey(0))
    else:
        model = AttentionMIL(input_dim=input_dim,
                             hidden_dim=int(shape_config["hidden_dim"]),
                             att_dim=int(shape_config["att_dim"]),
                             dropout=0.0, num_classes=num_classes)
        shapes = jax.eval_shape(
            lambda r: model.init({"params": r, "dropout": r},
                                 jnp.zeros((4, input_dim)),
                                 valid=jnp.ones(4, bool)),
            jax.random.PRNGKey(0))
    return int(sum(int(np.prod(l.shape)) * 4
                   for l in jax.tree_util.tree_leaves(shapes)))


def max_cohort_for_shape(model_type: str, shape_config: Dict, input_dim: int,
                         num_classes: int, cohort_size: int) -> int:
    """Largest sub-cohort whose resident device state fits the HBM budget.

    A packed trial holds FIVE f32 param copies on device (live params, Adam
    m/v, and the two best-checkpoint trackers the reference's dual-best
    protocol requires) plus ~1 transient copy of grads/updates; the
    reference's flagship space reaches ~536 MB of params per trial
    (gnn_hidden 512 × 8 concat heads × 8 layers), so a fixed cohort of 8
    OOMs a 16 GB chip — 20.4 GB measured (r5).  The budget defaults to
    10 GiB (leaving headroom for eval activations and the bag scan) and is
    overridable via ``GRAFT_HPO_HBM_GB``."""
    import os
    budget = float(os.environ.get("GRAFT_HPO_HBM_GB", "10")) * (1 << 30)
    per_trial = 6 * estimate_trial_param_bytes(model_type, shape_config,
                                               input_dim, num_classes)
    s = max(1, int(budget // max(per_trial, 1)))
    p = 1
    while p * 2 <= min(s, cohort_size):  # power of 2: compaction-friendly
        p *= 2
    return p


def run_population_search(
    space: Dict,
    data: Dict,
    num_samples: int = 16,
    cohort_size: int = 8,
    metric: str = "val_bacc",
    mode: str = "max",
    seed: int = 42,
    max_epochs: int = 50,
    patience: int = 8,
    num_classes: int = 7,
    verbose: bool = True,
    scheduler=None,
    model_type: str = "mil",
) -> Dict:
    """Cohorted search: shape keys are sampled once per cohort (so each
    cohort is a single vmapped program), continuous keys per trial.  Search
    breadth over the continuous keys matches the sequential runner; breadth
    over shape keys is num_samples/cohort_size — the price of packing, the
    same trade the reference makes by capping concurrent trials per GPU.

    ``model_type='graph-mil'`` packs the reference's flagship 19-dim graph
    search (``tune_mil.py:170-200``): the 15 architecture/topology keys are
    the cohort shape signature, lr/wd/gnn_dropout/pool_dropout trace per
    trial.

    ``scheduler`` (ASHAScheduler) is SHARED across cohorts: rung cutoffs
    compare every trial seen so far, exactly like Ray's asynchronous rungs
    across its packed fractional-GPU workers (``tune_mil.py:144-149``).

    Under a multi-process runtime, COHORTS shard round-robin across
    processes (each cohort already fills its process's chips) with the rung
    board and results table over the coordination service — see
    ``hpo.runner.run_search`` for the sharding contract.
    → {best_config, results (DataFrame incl. epochs_run / stopped_early),
    wall_s}."""
    import pandas as pd

    from . import distributed as hdist

    if model_type == "graph-mil":
        shape_keys, pop_keys = GRAPH_SHAPE_KEYS, GRAPH_POP_KEYS
        trainer = train_graph_mil_population
    else:
        shape_keys, pop_keys = SHAPE_KEYS, POP_KEYS
        trainer = train_mil_population

    ns = hdist.search_namespace()
    rng = np.random.RandomState(seed)
    t_start = time.time()
    n_cohorts = (num_samples + cohort_size - 1) // cohort_size
    mine = set(hdist.shard_indices(n_cohorts))
    if jax.process_count() > 1 and scheduler is not None \
            and scheduler.board is None:
        scheduler.board = hdist.CoordinationRungBoard(ns)
    cohort_rows: Dict[int, List[dict]] = {}
    for c in range(n_cohorts):
        P = min(cohort_size, num_samples - c * cohort_size)
        # every process samples every cohort from the same stream; only its
        # own round-robin slice trains (results exchanged afterwards)
        full = [sample_config(space, rng) for _ in range(P)]
        if c not in mine:
            continue
        shape_config = {k: full[0][k] for k in shape_keys if k in full[0]}
        pop = {k: np.array([cfg[k] for cfg in full]) for k in pop_keys}
        # memory-aware packing: big architectures (the graph space reaches
        # ~536 MB of params/trial) train in sub-cohorts that fit HBM — the
        # same adaptation the reference makes statically by capping 4
        # trials/GPU (tune_mil.py:33); per-trial semantics are unchanged
        # (same seed, same split, same trial ids)
        input_dim = int(np.asarray(data["train_feats"][0]).shape[1])
        sub = max_cohort_for_shape(
            "graph-mil" if model_type == "graph-mil" else "mil",
            shape_config, input_dim, num_classes, cohort_size)
        if verbose and sub < P:
            print(f"cohort {c}: splitting {P} trials into sub-cohorts of "
                  f"{sub} (per-trial params "
                  f"{estimate_trial_param_bytes(model_type, shape_config, input_dim, num_classes) / 1e6:.0f} MB)",
                  flush=True)
        reports = []
        for s0 in range(0, P, sub):
            sl = slice(s0, min(s0 + sub, P))
            reports.extend(trainer(
                shape_config, {k: v[sl] for k, v in pop.items()}, data,
                seed=seed, num_classes=num_classes,
                patience=patience, max_epochs=max_epochs,
                scheduler=scheduler,
                trial_ids=[f"cohort{c:03d}_t{t:02d}"
                           for t in range(sl.start, sl.stop)]))
        cohort_rows[c] = []
        for t, rep in enumerate(reports):
            cfg = {**shape_config, **{k: float(pop[k][t]) for k in pop_keys}}
            row = {"trial_id": f"cohort{c:03d}_t{t:02d}",
                   **{f"config/{k}": v for k, v in cfg.items()},
                   **{k: (float(v) if isinstance(v, (np.floating, np.integer))
                          else v)
                      for k, v in rep.items() if not k.startswith("_")}}
            cohort_rows[c].append(row)
        hdist.publish_result(ns, c, {"rows": cohort_rows[c]})
        if verbose:
            vals = [r[metric] for r in reports]
            print(f"cohort {c}: {P} trials, best {metric}="
                  f"{(max if mode == 'max' else min)(vals):.4f}", flush=True)

    # multi-process: wait for all cohorts' published rows, then merge so
    # every process holds the full table
    for c, payload in hdist.collect_results(ns, expected=n_cohorts).items():
        cohort_rows.setdefault(c, payload["rows"])
    rows = [row for c in sorted(cohort_rows) for row in cohort_rows[c]]

    frame = pd.DataFrame(rows)
    vals = frame[metric].astype(float)
    best_idx = int(vals.idxmax() if mode == "max" else vals.idxmin())
    best_row = rows[best_idx]
    best_config = {k.split("/", 1)[1]: v for k, v in best_row.items()
                   if k.startswith("config/")}
    return {"best_config": best_config, "results": frame,
            "wall_s": time.time() - t_start}
