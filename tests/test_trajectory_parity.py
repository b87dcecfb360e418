"""N-step TRAINING-TRAJECTORY parity vs torch twins.

Forward parity (tests/test_fusion.py, test_efficientnet_parity.py,
test_convmae.py) and optimizer step-for-step parity (test_optim.py) are each
proven separately; these tests COMPOSE them: the JAX models and the ported
torch twins take the same N optimizer steps on identical batches and must
agree per-step on the loss and at the end on the outputs — the strongest
attainable stand-in for AUC parity in a data-less environment (BASELINE.md's
per-sample-tolerance requirement applied to whole training runs).

Reference workloads matched:
- fusion: SGD(lr=1e-3, wd=1e-4) + CrossEntropy (``main.py:134-146``), the
  train/validate protocol of ``net_utils.py:6-44``;
- image backbone: torch BatchNorm train-mode semantics — biased batch var for
  normalization, UNBIASED var into the running stats, momentum 0.01
  (``model.py:58`` trains the backbone inside the fusion net);
- conv-MAE: AdamW with the encoder-lr=1e-5/decoder-lr=1e-3 split,
  betas (0.9, 0.95), wd 0.05 (``train_ae.py:145-152,163-175``).

Stochastic regularizers (dropout, drop-connect) draw from framework-specific
RNGs, so they cannot match bit-for-bit across frameworks; each test pins them
off (rate 0 / deterministic forward) — the optimizer, loss, BN-statistics and
masking trajectories are the semantics under test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodal_isic_tpu.core.train_state import TrainState
from multimodal_isic_tpu.models.efficientnet import (
    EfficientNet, port_torch_state_dict)
from multimodal_isic_tpu.models.fusion import MultiModalFusionNet
from multimodal_isic_tpu.train.fusion import (
    cross_entropy, fusion_optimizer, init_fusion)

from test_fusion import MODS, TorchFusion, _batch, _port_flax_to_torch

NC = 7


def test_fusion_sgd_5step_trajectory_vs_torch(rng):
    """5 SGD steps of the backbone-free fusion net vs the torch twin on
    identical batches: per-step losses and the final held-out logits match to
    float tolerance.  Dropout is held deterministic (eval-mode forward) in
    BOTH frameworks; SGD(lr=1e-3, wd=1e-4) and the CE loss are exactly the
    reference's (``main.py:134-146``)."""
    model = MultiModalFusionNet(modality=MODS, fusion_level="intermediate",
                                fusion_strategy="concat", radiomics_dim=20)
    init_b = _batch(rng)
    params, _ = init_fusion(model, jax.random.PRNGKey(0), init_b)

    tmodel = TorchFusion(MODS, "intermediate", "concat")
    _port_flax_to_torch(params, tmodel, "intermediate", "concat")
    tmodel.eval()  # deterministic forward; grads still flow

    opt = fusion_optimizer()  # SGD lr=1e-3 wd=1e-4, main.py:135
    state = TrainState.create(params, opt, jax.random.PRNGKey(1))
    topt = torch.optim.SGD(tmodel.parameters(), lr=1e-3, weight_decay=1e-4)
    tcrit = torch.nn.CrossEntropyLoss()

    @jax.jit
    def step(state, batch):
        def loss_fn(p):
            logits = model.apply(
                {"params": p},
                **{k: batch[k] for k in
                   ("radiomics", "age", "sex", "loc", "artifacts")},
                train=False)
            return cross_entropy(logits, batch["target"])
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads, opt), loss

    batches = [_batch(rng, n=6) for _ in range(5)]
    for i, b in enumerate(batches):
        state, loss_j = step(state, b)
        logits_t = tmodel(torch.tensor(b["radiomics"]),
                          torch.tensor(b["age"]),
                          torch.tensor(b["sex"].astype(np.int64)),
                          torch.tensor(b["loc"].astype(np.int64)),
                          torch.tensor(b["artifacts"].astype(np.int64)))
        loss_t = tcrit(logits_t, torch.tensor(b["target"].astype(np.int64)))
        topt.zero_grad()
        loss_t.backward()
        topt.step()
        assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-5), \
            f"step {i} loss diverged"

    held = _batch(rng, n=8)
    ours = model.apply({"params": state.params},
                       **{k: held[k] for k in
                          ("radiomics", "age", "sex", "loc", "artifacts")},
                       train=False)
    with torch.no_grad():
        theirs = tmodel(torch.tensor(held["radiomics"]),
                        torch.tensor(held["age"]),
                        torch.tensor(held["sex"].astype(np.int64)),
                        torch.tensor(held["loc"].astype(np.int64)),
                        torch.tensor(held["artifacts"].astype(np.int64)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_torch_batchnorm_unbiased_running_var(rng):
    """TorchBatchNorm's semantic difference from flax: the running variance
    update uses the UNBIASED batch variance (torch's rule).  At n=32 reduced
    elements the Bessel correction is ~3.2%, far above tolerance — this test
    pins the rule exactly where the trajectory test's noise floor could not."""
    from multimodal_isic_tpu.models.efficientnet import TorchBatchNorm

    x = rng.randn(2, 4, 4, 8).astype(np.float32)  # n = 2*4*4 = 32
    tbn = torch.nn.BatchNorm2d(8, eps=1e-3, momentum=0.01)
    tbn.train()
    jbn = TorchBatchNorm(use_running_average=False, momentum=0.99,
                         epsilon=1e-3)
    variables = jbn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    stats = variables["batch_stats"]
    for _ in range(3):
        out_j, mut = jbn.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x), mutable=["batch_stats"])
        stats = mut["batch_stats"]
        out_t = tbn(torch.tensor(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(out_j).transpose(0, 3, 1, 2), out_t.detach().numpy(),
            rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.detach().numpy(),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.detach().numpy(),
                               rtol=1e-6, atol=1e-7)
    # and it IS a different rule from the biased update flax applies
    biased = 0.99 ** 3 * 1.0 + (0.99 ** 2 + 0.99 + 1) * 0.01 * np.asarray(
        jnp.var(jnp.asarray(x), axis=(0, 1, 2)))
    assert np.abs(biased - np.asarray(stats["var"])).max() > 1e-4


def test_efficientnet_bn_train_trajectory_vs_torch(rng):
    """3 SGD steps of EfficientNet-B0 + classifier head in TRAIN mode vs the
    torch twin: per-step losses, the BatchNorm running statistics (torch
    momentum-0.01 / unbiased-variance update rule), and the final eval-mode
    forward all match.  Stochastic depth and feature dropout are pinned to
    rate 0 in both frameworks so BN is the only train-mode statefulness.

    Runs in FLOAT64 on both sides: at an untrained kaiming init, BN's rsqrt
    amplifies rounding noise chaotically through B0's 16 blocks (measured:
    ~5e-2 loss drift by step 3 in fp32, ~1e-5 by step 3 even in f64 — pure
    ulp-level conv-algorithm differences, amplified ~100× per step).  Two f64
    steps stay at the 1e-6 level, which is where the SEMANTIC claims
    (optimizer rules, BN batch-stat normalization, unbiased running-var
    updates) live; the update rule itself is additionally pinned exactly by
    test_torch_batchnorm_unbiased_running_var."""
    from multimodal_isic_tpu.utils.torch_ref import build_torch_efficientnet

    torch.manual_seed(0)
    name = "efficientnet-b0"
    tmodel = build_torch_efficientnet(name, num_classes=NC).double()
    for blk in tmodel._blocks:
        blk.drop_rate = 0.0
    tmodel._dropout.p = 0.0
    tmodel.train()

    with jax.enable_x64(True):
        params, stats = port_torch_state_dict(tmodel.state_dict(), name)
        jmodel = EfficientNet(name, num_classes=NC, drop_connect_rate=0.0,
                              feature_dropout=False, dtype=jnp.float64)

        from multimodal_isic_tpu.core.optim import sgd
        opt = sgd(1e-3, momentum=0.0, weight_decay=1e-4)
        state = TrainState.create(params, opt, jax.random.PRNGKey(0))
        topt = torch.optim.SGD(tmodel.parameters(), lr=1e-3, weight_decay=1e-4)
        tcrit = torch.nn.CrossEntropyLoss()

        @jax.jit
        def step(state, stats, x, y):
            def loss_fn(p):
                logits, mut = jmodel.apply(
                    {"params": p, "batch_stats": stats}, x, train=True,
                    mutable=["batch_stats"])
                return cross_entropy(logits, y), mut["batch_stats"]
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads, opt), new_stats, loss

        for i in range(2):
            x = rng.rand(4, 32, 32, 3)
            y = rng.randint(0, NC, 4)
            state, stats, loss_j = step(state, stats, jnp.asarray(x),
                                        jnp.asarray(y))
            logits_t = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
            loss_t = tcrit(logits_t, torch.tensor(y.astype(np.int64)))
            topt.zero_grad()
            loss_t.backward()
            topt.step()
            assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-6), \
                f"step {i} loss diverged"

        # running statistics followed the torch update rule step for step
        tsd = tmodel.state_dict()
        np.testing.assert_allclose(
            np.asarray(stats["stem_bn"]["mean"]),
            tsd["_bn0.running_mean"].numpy(), rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(stats["stem_bn"]["var"]),
            tsd["_bn0.running_var"].numpy(), rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(stats["head_bn"]["var"]),
            tsd["_bn1.running_var"].numpy(), rtol=1e-6, atol=1e-9)

        tmodel.eval()
        xh = rng.rand(2, 32, 32, 3)
        with torch.no_grad():
            theirs = tmodel(torch.tensor(xh.transpose(0, 3, 1, 2))).numpy()
        ours = np.asarray(jmodel.apply(
            {"params": state.params, "batch_stats": stats}, jnp.asarray(xh),
            train=False))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_convmae_adamw_trajectory_vs_torch(rng):
    """2 AdamW steps of the conv-MAE vs the torch twin with the SAME masking
    bookkeeping per step: per-step reconstruction losses and the final
    encoder latents match.  AdamW hyperparameters and the encoder/decoder LR
    split are the reference's (``train_ae.py:145-152``)."""
    from multimodal_isic_tpu.models.convmae import (
        ConvMAE, load_pretrained, random_masking)
    from multimodal_isic_tpu.train.mae import (
        init_mae, mae_optimizer, make_mae_train_step)
    from multimodal_isic_tpu.utils.torch_ref import build_torch_convmae

    cfg = dict(img_size=64, embed_dims=(16, 24, 32), depths=(1, 1, 2),
               num_heads=4, decoder_dim=16, decoder_depth=1, decoder_heads=4)
    tmodel = build_torch_convmae(**cfg).train()
    jmodel = ConvMAE(**cfg)
    params0 = init_mae(jmodel, jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = load_pretrained(params0, sd, jmodel)

    optimizer = mae_optimizer()  # enc 1e-5 / dec 1e-3, β=(0.9,0.95), wd 0.05
    state = TrainState.create(params, optimizer, jax.random.PRNGKey(1))
    mstep = make_mae_train_step(jmodel, optimizer, mask_ratio=0.75)

    enc = [p for n, p in tmodel.named_parameters() if "decoder" not in n]
    dec = [p for n, p in tmodel.named_parameters() if "decoder" in n]
    topt = torch.optim.AdamW([{"params": enc, "lr": 1e-5},
                              {"params": dec, "lr": 1e-3}],
                             betas=(0.9, 0.95), weight_decay=0.05)

    b, n = 2, jmodel.num_patches
    for i in range(2):
        imgs = rng.rand(b, 64, 64, 3).astype(np.float32)
        key = jax.random.PRNGKey(100 + i)
        state, loss_j = mstep(state, jnp.asarray(imgs), None, key)
        # reproduce the step's masking bookkeeping for the torch twin
        ids_keep, mask, ids_restore = random_masking(key, b, n, 0.75)
        loss_t, _, _ = tmodel(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            torch.from_numpy(np.asarray(ids_keep)).long(),
            torch.from_numpy(np.asarray(mask)).float(),
            torch.from_numpy(np.asarray(ids_restore)).long())
        topt.zero_grad()
        loss_t.backward()
        topt.step()
        assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-4), \
            f"step {i} loss diverged"

    # final encoder latents (the save_latent.py:60 route) still agree
    imgs = rng.rand(b, 64, 64, 3).astype(np.float32)
    latent_j, _, _ = jmodel.apply(
        {"params": state.params}, jnp.asarray(imgs), mask_ratio=0.0,
        method=ConvMAE.forward_encoder)
    tmodel.eval()
    with torch.no_grad():
        latent_t = tmodel.encode(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            torch.arange(n).expand(b, n), torch.zeros(b, n))
    np.testing.assert_allclose(np.asarray(latent_j), latent_t.numpy(),
                               rtol=1e-3, atol=1e-4)
