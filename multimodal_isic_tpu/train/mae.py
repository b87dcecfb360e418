"""Conv-MAE pretraining: jitted train/eval steps + the epoch loop.

The reference's MAE workload (``train_ae.py``): weighted-resampled batches,
AdamW with split encoder/decoder learning rates (enc 1e-5 / dec 1e-3,
betas (0.9, 0.95), wd 0.05, ``train_ae.py:145-152``), train at
``masking_ratio`` with optional lesion-guided masking, validate at
``eval_masking_ratio``, track the best-val-loss weights and save them at the
end, every-10-epochs latent diagnostics.

TPU-first differences: the whole step (forward + backward + optimizer) is one
jitted function; the batch is sharded over the mesh's ``data`` axis and XLA
inserts the gradient all-reduce over ICI; mask ratios are compile-time
constants so the keep-set has a static shape; best-state tracking also writes
a resumable on-disk checkpoint (params+opt+step+RNG), which the reference
never does (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..core.optim import Optimizer, adamw
from ..core.train_state import TrainState
from ..models.convmae import ConvMAE


def mae_optimizer(encoder_lr: float = 1e-5, decoder_lr: float = 1e-3,
                  weight_decay: float = 0.05) -> Optimizer:
    """AdamW with the reference's encoder/decoder LR split: any parameter
    whose path mentions 'decoder'/'dec_' gets the decoder LR (the reference
    splits purely on 'decoder' in the torch param name,
    ``train_ae.py:145-146`` — so ``mask_token``, which does not contain
    'decoder', trains at the ENCODER LR there, and does here too)."""
    def lr(path: str) -> float:
        is_dec = ("decoder" in path) or ("dec_" in path)
        return decoder_lr if is_dec else encoder_lr
    return adamw(lr, b1=0.9, b2=0.95, weight_decay=weight_decay)


def init_mae(model: ConvMAE, rng: jax.Array, batch_size: int = 2):
    imgs = jnp.zeros((batch_size, model.img_size, model.img_size, 3))
    variables = model.init({"params": rng}, imgs, mask_ratio=0.0)
    return variables["params"]


def make_mae_train_step(model: ConvMAE, optimizer: Optimizer, mask_ratio: float,
                        use_lesion_mask: bool = False) -> Callable:
    """Returns jitted (state, images, lesion_mask, key) → (state, loss)."""

    @jax.jit
    def step(state: TrainState, images, lesion_mask, key):
        def loss_fn(params):
            loss, _, _ = model.apply(
                {"params": params}, images, mask_ratio=mask_ratio, rng=key,
                lesion_mask=lesion_mask if use_lesion_mask else None)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads, optimizer), loss

    return step


def make_mae_train_epoch(model: ConvMAE, optimizer: Optimizer,
                         mask_ratio: float, use_lesion_mask: bool = False,
                         transform: Optional[Callable] = None) -> Callable:
    """One FULL MAE training epoch as a single jitted program over an
    HBM-resident dataset: ``lax.scan`` over steps of [gather → augment →
    masked-autoencoder train step].  Same motivation and key-derivation
    contract as ``train.fusion.make_fusion_train_epoch`` (per-batch
    dispatches cost ~0.8 s each on the tunneled backend); this is the TPU
    form of the reference's MAE hot loop (``train_ae.py:163-216``).

    Returns ``epoch(state, images, masks, order, key) → (state, mean_loss)``
    with ``order`` (n_steps, B) int32 host-resampled gather indices.
    """
    step = make_mae_train_step(model, optimizer, mask_ratio, use_lesion_mask)

    @jax.jit
    def epoch(state: TrainState, images, masks, order, key):
        n_steps = order.shape[0]
        k_aug, k_step = jax.random.split(key)
        aug_keys = jax.random.split(k_aug, n_steps)
        step_keys = jax.random.split(k_step, n_steps)

        def body(st, xs):
            idx, ka, kd = xs
            img = jnp.take(images, idx, axis=0)
            msk = jnp.take(masks, idx, axis=0)
            if transform is not None:
                img, msk = transform(img, msk, ka)
            st, loss = step(st, img, msk, kd)
            return st, loss

        state, losses = jax.lax.scan(body, state,
                                     (order, aug_keys, step_keys))
        return state, losses.mean()

    return epoch


def make_mae_eval_epoch(model: ConvMAE, eval_mask_ratio: float,
                        transform: Optional[Callable] = None) -> Callable:
    """Validation twin of :func:`make_mae_train_epoch`: one scanned program
    of [gather → eval transform → masked eval loss] over the val split.
    ``transform`` is the deterministic eval policy (images, masks) →
    (images, masks).  Returns ``epoch(params, images, masks, order, key) →
    mean_loss`` (masking keys derived per step from ``key``)."""
    eval_step = make_mae_eval_step(model, eval_mask_ratio)

    @jax.jit
    def epoch(params, images, masks, order, key):
        keys = jax.random.split(key, order.shape[0])

        def body(carry, xs):
            idx, k = xs
            img = jnp.take(images, idx, axis=0)
            if transform is not None:
                img, _ = transform(img, jnp.take(masks, idx, axis=0))
            return carry, eval_step(params, img, k)

        _, losses = jax.lax.scan(body, None, (order, keys))
        return losses.mean()

    return epoch


def make_mae_eval_step(model: ConvMAE, eval_mask_ratio: float) -> Callable:
    """Returns jitted (params, images, key) → loss."""

    @jax.jit
    def step(params, images, key):
        loss, _, _ = model.apply({"params": params}, images,
                                 mask_ratio=eval_mask_ratio, rng=key)
        return loss

    return step


def make_mae_eval_persample_step(model: ConvMAE,
                                 eval_mask_ratio: float) -> Callable:
    """Returns jitted (params, images, key) → per-sample losses [B].

    Per-sample reduction of the same reconstruction loss as
    ``ConvMAE.loss``: a static mask ratio masks the SAME patch count in
    every sample, so the scalar batch loss equals the mean of this vector.
    Multi-process validation needs the vector form — wrap-padded duplicate
    rows (``process_epoch_order(pad_to_full=True)``) must be trimmed before
    averaging or they double-weight into best-val selection."""
    from ..ops.patches import patchify

    @jax.jit
    def step(params, images, key):
        _, pred, mask = model.apply({"params": params}, images,
                                    mask_ratio=eval_mask_ratio, rng=key)
        target = patchify(images, 16)
        if model.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        per_patch = jnp.mean((pred - target) ** 2, axis=-1)  # [B, N]
        return (per_patch * mask).sum(axis=1) / jnp.maximum(
            mask.sum(axis=1), 1.0)

    return step


def make_encoder_step(model: ConvMAE) -> Callable:
    """Returns jitted (params, images) → (latent [B,196,768], ids_restore) —
    the mask_ratio=0 full forward used for latent extraction
    (``save_latent.py:60``, ``train_ae.py:187``)."""

    @jax.jit
    def step(params, images):
        latent, _, ids_restore = model.apply(
            {"params": params}, images, mask_ratio=0.0,
            method=ConvMAE.forward_encoder)
        return latent, ids_restore

    return step


def train_mae(
    model: ConvMAE,
    params,
    train_batches: Callable[[int], "iter"],
    val_batches: Callable[[], "iter"],
    num_epochs: int,
    mask_ratio: float,
    eval_mask_ratio: float,
    rng: jax.Array,
    use_lesion_mask: bool = False,
    encoder_lr: float = 1e-5,
    decoder_lr: float = 1e-3,
    logger=None,
    checkpoint_dir: Optional[str] = None,
    epoch_hook: Optional[Callable] = None,
    val_n_true: Optional[int] = None,
    fused_train: Optional[Callable] = None,
    fused_val: Optional[Callable] = None,
) -> Dict:
    """Epoch loop.  ``train_batches(epoch)`` / ``val_batches()`` yield dicts
    with device-resident 'image' (and 'mask' when lesion-guided).  Returns
    {params, best_params, best_val_loss, history}.

    ``val_n_true`` (multi-process): the val loader wrap-pads its order to
    full global batches, so per-sample losses are gathered in global order
    and trimmed to the first ``val_n_true`` rows before averaging — padding
    duplicates never skew best-val selection.

    ``fused_train(state, epoch, key) → (state, loss)`` /
    ``fused_val(params, key) → loss`` (HBM-resident fast path): when given,
    each epoch is the caller's single scanned program
    (:func:`make_mae_train_epoch` / :func:`make_mae_eval_epoch` bound to
    resident arrays) instead of the per-batch loader loop; the loader
    factories are then unused for that side."""
    optimizer = mae_optimizer(encoder_lr, decoder_lr)
    state = TrainState.create(params, optimizer, rng)
    train_step = make_mae_train_step(model, optimizer, mask_ratio, use_lesion_mask)
    if val_n_true is None:
        eval_step = make_mae_eval_step(model, eval_mask_ratio)
    else:
        eval_ps_step = make_mae_eval_persample_step(model, eval_mask_ratio)

    best_val = float("inf")
    best_params = state.params
    history = []
    for epoch in range(num_epochs):
        if fused_train is not None:
            key, state = state.next_rng()
            state, train_loss = fused_train(state, epoch, key)
            train_loss = float(train_loss)
        else:
            running, seen = 0.0, 0
            for batch in train_batches(epoch):
                key, state = state.next_rng()
                n = batch["image"].shape[0]
                state, loss = train_step(state, batch["image"],
                                         batch.get("mask"), key)
                running += float(loss) * n
                seen += n
            train_loss = running / max(seen, 1)

        if fused_val is not None:
            key, state = state.next_rng()
            val_loss = float(fused_val(state.params, key))
        elif val_n_true is None:
            running, seen = 0.0, 0
            for batch in val_batches():
                key, state = state.next_rng()
                n = batch["image"].shape[0]
                loss = eval_step(state.params, batch["image"], key)
                running += float(loss) * n
                seen += n
            val_loss = running / max(seen, 1)
        else:
            from ..parallel.distributed import gather_to_host

            per_sample = []
            for batch in val_batches():
                key, state = state.next_rng()
                per_sample.append(gather_to_host(
                    eval_ps_step(state.params, batch["image"], key)))
            per_sample = np.concatenate(per_sample)[:val_n_true]
            val_loss = float(per_sample.mean()) if len(per_sample) else float("nan")

        history.append({"epoch": epoch, "train_loss": train_loss, "val_loss": val_loss})
        if logger is not None:
            logger.log("train/loss", train_loss, step=epoch)
            logger.log("val/loss", val_loss, step=epoch)
            logger.print(f"Epoch [{epoch + 1}/{num_epochs}], "
                         f"Train Loss: {train_loss:.4f}, Val Loss: {val_loss:.4f}")
        if val_loss < best_val:
            best_val = val_loss
            best_params = state.params
            if checkpoint_dir is not None:
                ckpt.save_checkpoint(checkpoint_dir, state, step=int(state.step),
                                     metadata={"epoch": epoch, "val_loss": val_loss})
        if epoch_hook is not None:
            epoch_hook(epoch, state.params)

    return {"params": state.params, "best_params": best_params,
            "best_val_loss": best_val, "history": history}
