"""Fusion classifier training/eval loops (the reference's ``net_utils.py`` +
``main.py`` workload, TPU-first).

Semantics preserved: CrossEntropy loss, SGD(lr=1e-3, wd=1e-4)
(``main.py:134-135``), epoch loss = mean of batch losses
(``net_utils.py:34``), early stopping on val loss with the counter-to-zero
rule, test() → (accuracy, classification_report digits=5)
(``net_utils.py:86-127``).  TPU-first: forward+backward+SGD+BN-stat update is
one jitted step; batches stream through the device input pipeline; metrics
accumulate on device.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import metrics as M
from ..core.early_stopping import EarlyStopping
from ..core.optim import Optimizer, sgd
from ..core.train_state import TrainState
from ..models.fusion import MultiModalFusionNet

BATCH_KEYS = ("image", "radiomics", "age", "sex", "loc", "artifacts")


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=1))


def init_fusion(model: MultiModalFusionNet, rng: jax.Array, batch: Dict):
    kwargs = {k: batch[k] for k in BATCH_KEYS if k in batch}

    # jitted: eager init dispatches thousands of tiny param-init ops (~50 s
    # for B3 on one CPU core); as one compiled program it runs in seconds and
    # repeat runs hit the persistent compilation cache.
    @jax.jit
    def _init(rng, kw):
        return model.init({"params": rng, "dropout": rng}, **kw, train=False)

    variables = _init(rng, kwargs)
    return variables["params"], variables.get("batch_stats", {})


def fusion_optimizer(lr: float = 1e-3, weight_decay: float = 1e-4) -> Optimizer:
    """The reference's optimizer: SGD without momentum (``main.py:135``)."""
    return sgd(lr, momentum=0.0, weight_decay=weight_decay)


def make_fusion_train_step(model: MultiModalFusionNet, optimizer: Optimizer):
    """jitted (state, batch_stats, batch, key) →
    (state, batch_stats, loss, n_correct)."""

    @jax.jit
    def step(state: TrainState, batch_stats, batch, key):
        def loss_fn(params):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(
                variables,
                **{k: batch[k] for k in BATCH_KEYS if k in batch},
                train=True, rngs={"dropout": key},
                mutable=["batch_stats"] if batch_stats else [],
            )
            logits, mutated = out if isinstance(out, tuple) else (out, {})
            loss = cross_entropy(logits, batch["target"])
            return loss, (logits, mutated.get("batch_stats", batch_stats))

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, optimizer)
        correct = jnp.sum(jnp.argmax(logits, axis=1) == batch["target"])
        return new_state, new_stats, loss, correct

    return step


def make_fusion_train_epoch(model: MultiModalFusionNet, optimizer: Optimizer,
                            transform: Optional[Callable] = None):
    """One FULL training epoch as a SINGLE jitted program over an
    HBM-resident dataset (``data.pipeline.DeviceDataset``): ``lax.scan``
    over steps of [gather batch → augment → fused train step].

    Motivation (r5 measurement, BENCH_DISK.json): dispatching epoch batches
    one by one costs ~0.8 s/step of host round-trips on the tunneled
    backend — 127 img/s HBM-resident vs 677 img/s for the bare train step.
    One scanned program removes every per-batch dispatch; the epoch becomes
    pure device work closed by a single loss readback.  This is the TPU
    form of the reference's hot loop (``main.py:141-146`` +
    ``net_utils.py:6-44``), whose per-batch host preprocessing and
    ``.to(device)`` shipping the scan eliminates entirely.

    Returned callable::

        epoch(state, batch_stats, images, masks, meta, order, key)
          images (N,H,W,C) uint8   HBM-resident staging crops
          masks  (N,H,W)           HBM-resident masks
          meta   dict of (N,...)   tabular columns incl. 'target'
          order  (n_steps, B) i32  host-shuffled gather indices (drop_last)
          → (state, batch_stats, mean_loss, n_correct)

    Key derivation: ``k_aug, k_drop = split(key)`` then one subkey per step
    from each — bit-reproducible by a manual per-step loop (tested).
    """
    step = make_fusion_train_step(model, optimizer)

    @jax.jit
    def epoch(state, batch_stats, images, masks, meta, order, key):
        n_steps = order.shape[0]
        k_aug, k_drop = jax.random.split(key)
        aug_keys = jax.random.split(k_aug, n_steps)
        drop_keys = jax.random.split(k_drop, n_steps)

        def body(carry, xs):
            st, stats = carry
            idx, ka, kd = xs
            batch = {k: jnp.take(v, idx, axis=0) for k, v in meta.items()}
            img = jnp.take(images, idx, axis=0)
            msk = jnp.take(masks, idx, axis=0) if masks is not None else None
            if transform is not None:
                img, msk = transform(img, msk, ka)
            batch["image"] = img
            st, stats, loss, correct = step(st, stats, batch, kd)
            return (st, stats), (loss, correct)

        (state, batch_stats), (losses, corrects) = jax.lax.scan(
            body, (state, batch_stats), (order, aug_keys, drop_keys))
        return state, batch_stats, losses.mean(), corrects.sum()

    return epoch


def make_fusion_eval_step(model: MultiModalFusionNet):
    """jitted (params, batch_stats, batch) → (loss, logits)."""

    @jax.jit
    def step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = model.apply(
            variables, **{k: batch[k] for k in BATCH_KEYS if k in batch},
            train=False)
        return cross_entropy(logits, batch["target"]), logits

    return step


def make_fusion_eval_epoch(model: MultiModalFusionNet, out_hw=(380, 380)):
    """One FULL validation epoch as a single jitted program over an
    HBM-resident split: ``lax.scan`` of [gather batch → MXU resize +
    normalize → eval forward → per-batch CE mean], one readback per epoch.

    Companion to :func:`make_fusion_train_epoch` for the ``device_cache``
    path — without it every epoch re-streams the val split over the
    host→device link (~25-40 MB/s on this tunnel), which costs more than
    the fused train epoch itself.  The returned statistic replicates
    ``validate_epoch``'s single-process branch exactly: the epoch loss is
    the UNWEIGHTED mean of per-batch CE means, with the final partial
    batch's mean taken over its valid rows only (``valid`` masks the padded
    slots), matching the reference's epoch statistic (``net_utils.py:34``).

    Returned callable::

        epoch(params, batch_stats, images, meta, order, valid)
          images (N,H,W,C) uint8    HBM-resident staging crops
          meta   dict of (N,...)    tabular columns incl. 'target'
          order  (n_steps, B) i32   gather indices, final batch padded
          valid  (n_steps, B) bool  False on padded slots
          → (epoch_loss, n_correct)
    """
    from ..data import augment as _aug

    @jax.jit
    def epoch(params, batch_stats, images, meta, order, valid):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        def body(carry, xs):
            idx, vm = xs
            batch = {k: jnp.take(v, idx, axis=0) for k, v in meta.items()}
            inputs = {k: batch[k] for k in BATCH_KEYS if k in batch}
            inputs["image"] = _aug.preprocess_eval_batch(
                jnp.take(images, idx, axis=0), out_hw)
            logits = model.apply(variables, **inputs, train=False)
            logp = jax.nn.log_softmax(logits)
            per = -jnp.take_along_axis(logp, batch["target"][:, None],
                                       axis=1)[:, 0]
            vmf = vm.astype(per.dtype)
            loss_b = (per * vmf).sum() / jnp.maximum(vmf.sum(), 1.0)
            corr = jnp.sum((jnp.argmax(logits, axis=1) == batch["target"])
                           & vm)
            return carry, (loss_b, corr)

        _, (losses, corrs) = jax.lax.scan(
            body, 0, (order, valid))
        return losses.mean(), corrs.sum()

    return epoch


def padded_epoch_order(n: int, batch_size: int):
    """(order, valid) int32/bool [n_steps, batch_size] covering ALL n rows:
    the final partial batch is padded with row 0 and masked False — the
    eval-side counterpart of ``DeviceDataset.epoch_order``'s drop_last."""
    n_steps = -(-n // batch_size)
    order = np.zeros(n_steps * batch_size, np.int32)
    order[:n] = np.arange(n, dtype=np.int32)
    valid = np.zeros(n_steps * batch_size, bool)
    valid[:n] = True
    return (order.reshape(n_steps, batch_size),
            valid.reshape(n_steps, batch_size))


def train_epoch(step_fn, state, batch_stats, loader, rng_stream, logger=None,
                epoch: int = 0):
    """One train epoch → (state, batch_stats, epoch_loss, epoch_acc)."""
    losses, correct, total = [], 0, 0
    for batch in loader:
        state, batch_stats, loss, ncorr = step_fn(
            state, batch_stats, batch, rng_stream.next())
        losses.append(loss)
        correct += int(ncorr)
        total += int(batch["target"].shape[0])
    epoch_loss = float(np.mean([float(l) for l in losses])) if losses else float("nan")
    epoch_acc = correct / max(total, 1)
    log_train_epoch(logger, state, epoch, epoch_loss, epoch_acc)
    return state, batch_stats, epoch_loss, epoch_acc


def log_train_epoch(logger, state, epoch: int, epoch_loss: float,
                    epoch_acc: float) -> None:
    """Per-epoch train logging (reference ``net_utils.py:34-43``): loss/acc
    plus the learnable fusion weights when present."""
    if logger is None:
        return
    logger.log("train/epoch_loss", epoch_loss, step=epoch)
    logger.log("train/epoch_acc", epoch_acc, step=epoch)
    if "weights" in state.params:  # fusion weights, net_utils.py:40-43
        for i, w in enumerate(np.asarray(state.params["weights"]).tolist()):
            logger.log(f"model/fusion_weight_modality_{i}", w, step=epoch)
    logger.print(f"Epoch {epoch} - Train Loss: {epoch_loss:.4f}, "
                 f"Accuracy: {epoch_acc:.4f}")


def validate_epoch(eval_fn, params, batch_stats, loader, logger=None,
                   epoch: int = 0, n_true: int = None,
                   group_size: int = None) -> float:
    """Epoch val loss = mean of per-batch CE means (``net_utils.py:34``).

    ``n_true``/``group_size`` handle multi-process loaders, whose epoch order
    is wrap-padded to full global batches
    (``parallel.distributed.process_epoch_order(pad_to_full=True)``): batch
    means over padded batches double-weight the duplicated rows, skewing
    early stopping away from the single-process run.  Instead the per-sample
    losses are gathered in global order, trimmed to ``n_true``, and regrouped
    into the SAME ``group_size`` batches (final one partial) the
    single-process loader would have produced — the returned loss matches
    the single-process statistic (up to float reduction order)."""
    if n_true is not None:
        from ..parallel.distributed import gather_to_host

        logit_chunks, target_chunks = [], []
        for batch in loader:
            _, logits = eval_fn(params, batch_stats, batch)
            logit_chunks.append(gather_to_host(logits))
            target_chunks.append(gather_to_host(batch["target"]))
        logits = np.concatenate(logit_chunks)[:n_true].astype(np.float64)
        targets = np.concatenate(target_chunks)[:n_true]
        shifted = logits - logits.max(axis=1, keepdims=True)
        logp = shifted - np.log(np.exp(shifted).sum(axis=1, keepdims=True))
        per_sample = -logp[np.arange(n_true), targets]
        g = group_size or n_true
        losses = [float(per_sample[k:k + g].mean())
                  for k in range(0, n_true, g)]
        correct = int(np.sum(np.argmax(logits, axis=1) == targets))
        total = n_true
    else:
        losses, correct, total = [], 0, 0
        for batch in loader:
            loss, logits = eval_fn(params, batch_stats, batch)
            losses.append(float(loss))
            correct += int(jnp.sum(jnp.argmax(logits, axis=1)
                                   == batch["target"]))
            total += int(batch["target"].shape[0])
    epoch_loss = float(np.mean(losses)) if losses else float("nan")
    if logger is not None:
        logger.log("val/epoch_loss", epoch_loss, step=epoch)
        logger.log("val/epoch_acc", correct / max(total, 1), step=epoch)
        logger.print(f"Epoch {epoch} - Val Loss: {epoch_loss:.4f}, "
                     f"Accuracy: {correct / max(total, 1):.4f}")
    return epoch_loss


def evaluate_test(eval_fn, params, batch_stats, loader, logger=None,
               num_classes: int = 7, n_true: int = None) -> Tuple[float, str]:
    """→ (accuracy, classification_report) matching ``net_utils.py:86-127``.

    ``n_true`` trims the concatenated predictions — multi-process loaders
    wrap-pad the epoch order to full global batches
    (``parallel.distributed.process_epoch_order(pad_to_full=True)``)."""
    from ..parallel.distributed import gather_to_host

    preds, targets = [], []
    for batch in loader:
        _, logits = eval_fn(params, batch_stats, batch)
        preds.append(gather_to_host(jnp.argmax(logits, axis=1)))
        targets.append(gather_to_host(batch["target"]))
    y_pred = np.concatenate(preds)[:n_true]
    y_true = np.concatenate(targets)[:n_true]
    acc = float(np.mean(y_pred == y_true))
    bacc = float(M.balanced_accuracy(y_true, y_pred, num_classes))
    report = M.classification_report(y_true, y_pred, digits=5)
    if logger is not None:
        logger.assign("test/accuracy", acc)
        logger.assign("test/balanced_accuracy", bacc)
        logger.assign("test/classification_report", report)
        logger.print(f"Test Accuracy: {acc:.4f}")
        logger.print("Classification Report:\n" + report)
    return acc, report
