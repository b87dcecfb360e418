"""Fusion net: per-sample output parity vs a torch implementation of the
reference semantics (model.py), EfficientNet structural checks, train loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from multimodal_isic_tpu.core.train_state import TrainState, param_count
from multimodal_isic_tpu.models.efficientnet import (
    EfficientNet, block_args, feature_dim, port_torch_state_dict,
)
from multimodal_isic_tpu.models.fusion import MultiModalFusionNet
from multimodal_isic_tpu.train.fusion import (
    cross_entropy, fusion_optimizer, init_fusion, make_fusion_eval_step,
    make_fusion_train_step, evaluate_test, train_epoch, validate_epoch,
)

NC = 7
MODS = ["radiomics", "clinical", "artifacts"]  # backbone-free parity subset


# ---------------------------------------------------------- torch reference
# A torch implementation of the reference's fusion semantics (model.py:42-227)
# used purely as a golden oracle for weight-ported output comparison.

class TorchProj(tnn.Module):
    def __init__(self, din, hidden, dout):
        super().__init__()
        self.fc1 = tnn.Linear(din, hidden)
        self.ln1 = tnn.LayerNorm(hidden)
        self.fc2 = tnn.Linear(hidden, dout)
        self.ln2 = tnn.LayerNorm(dout)

    def forward(self, x):  # eval mode: dropout inactive
        x = F.relu(self.ln1(self.fc1(x)))
        return F.relu(self.ln2(self.fc2(x)))


class TorchFusion(tnn.Module):
    def __init__(self, modality, level, strategy, radiomics_dim=20):
        super().__init__()
        self.modality, self.level, self.strategy = modality, level, strategy
        self.radiomics_mlp = TorchProj(radiomics_dim, 256, 128)
        self.clinical_mlp = TorchProj(13, 64, 128)
        self.artifact_mlp = TorchProj(12, 64, 128)
        self.sex_emb = tnn.Embedding(3, 4)
        self.loc_emb = tnn.Embedding(15, 8)
        self.artifact_embeddings = tnn.ModuleList([tnn.Embedding(2, 2) for _ in range(6)])
        m = len(modality)
        if level == "intermediate":
            din = 128 * m if strategy in ("concat", "weighted") else 128
            self.fusion_fc1 = tnn.Linear(din, 256)
            self.fusion_fc2 = tnn.Linear(256, NC)
            if strategy == "attention":
                self.attn1 = tnn.Linear(128, 128)
                self.attn2 = tnn.Linear(128, 1)
        else:
            self.heads = tnn.ModuleDict({mod: tnn.Linear(128, NC) for mod in modality})
            if strategy == "attention":
                self.attn1 = tnn.Linear(m * NC, 128)
                self.attn2 = tnn.Linear(128, m)
        if strategy == "weighted":
            self.weights = tnn.Parameter(torch.ones(m) / m)

    def forward(self, radiomics, age, sex, loc, artifacts):
        feats, logits = [], []
        late = self.level == "late"
        if "radiomics" in self.modality:
            f = self.radiomics_mlp(radiomics)
            (logits if late else feats).append(self.heads["radiomics"](f) if late else f)
        if "clinical" in self.modality:
            clin = torch.cat([age.unsqueeze(1), self.sex_emb(sex), self.loc_emb(loc)], 1)
            f = self.clinical_mlp(clin)
            (logits if late else feats).append(self.heads["clinical"](f) if late else f)
        if "artifacts" in self.modality:
            arts = torch.cat([self.artifact_embeddings[i](artifacts[:, i])
                              for i in range(6)], 1)
            f = self.artifact_mlp(arts)
            (logits if late else feats).append(self.heads["artifacts"](f) if late else f)

        if not late:
            if self.strategy == "concat":
                fused = torch.cat(feats, 1)
            elif self.strategy == "weighted":
                w = F.softmax(self.weights, 0)
                fused = torch.cat([wi * f for wi, f in zip(w, feats)], 1)
            else:
                stacked = torch.stack(feats, 1)
                scores = self.attn2(torch.tanh(self.attn1(stacked))).squeeze(-1)
                fused = (stacked * F.softmax(scores, 1).unsqueeze(-1)).sum(1)
            return self.fusion_fc2(F.relu(self.fusion_fc1(fused)))
        if self.strategy == "concat":
            return torch.stack(logits, 1).sum(1)
        if self.strategy == "weighted":
            w = F.softmax(self.weights, 0)
            return torch.stack([wi * z for wi, z in zip(w, logits)], 0).sum(0)
        concat = torch.cat(logits, 1)
        weights = F.softmax(self.attn2(F.relu(self.attn1(concat))), 1).unsqueeze(2)
        return (torch.stack(logits, 1) * weights).sum(1)


def _port_flax_to_torch(params, tmodel, level, strategy):
    """Copy flax fusion params into the torch oracle."""
    def lin(tmod, p):
        tmod.weight.data = torch.tensor(np.asarray(p["kernel"]).T)
        tmod.bias.data = torch.tensor(np.asarray(p["bias"]))

    def ln(tmod, p):
        tmod.weight.data = torch.tensor(np.asarray(p["scale"]))
        tmod.bias.data = torch.tensor(np.asarray(p["bias"]))

    def proj(tmod, p):
        lin(tmod.fc1, p["fc1"]); ln(tmod.ln1, p["ln1"])
        lin(tmod.fc2, p["fc2"]); ln(tmod.ln2, p["ln2"])

    proj(tmodel.radiomics_mlp, params["radiomics_mlp"])
    proj(tmodel.clinical_mlp, params["clinical_mlp"])
    proj(tmodel.artifact_mlp, params["artifact_mlp"])
    tmodel.sex_emb.weight.data = torch.tensor(np.asarray(params["sex_emb"]["embedding"]))
    tmodel.loc_emb.weight.data = torch.tensor(np.asarray(params["loc_emb"]["embedding"]))
    for i in range(6):
        tmodel.artifact_embeddings[i].weight.data = torch.tensor(
            np.asarray(params[f"artifact_emb_{i}"]["embedding"]))
    if level == "intermediate":
        lin(tmodel.fusion_fc1, params["fusion_fc1"])
        lin(tmodel.fusion_fc2, params["fusion_fc2"])
        if strategy == "attention":
            lin(tmodel.attn1, params["attention"]["attn1"])
            lin(tmodel.attn2, params["attention"]["attn2"])
    else:
        for mod in tmodel.modality:
            lin(tmodel.heads[mod], params[f"head_{mod}"])
        if strategy == "attention":
            lin(tmodel.attn1, params["attention"]["attn1"])
            lin(tmodel.attn2, params["attention"]["attn2"])
    if strategy == "weighted":
        tmodel.weights.data = torch.tensor(np.asarray(params["weights"]))


def _batch(rng, n=5, radiomics_dim=20):
    return {
        "radiomics": rng.randn(n, radiomics_dim).astype(np.float32),
        "age": rng.randn(n).astype(np.float32),
        "sex": rng.randint(0, 3, n).astype(np.int32),
        "loc": rng.randint(0, 15, n).astype(np.int32),
        "artifacts": rng.randint(0, 2, (n, 6)).astype(np.int32),
        "target": rng.randint(0, NC, n).astype(np.int32),
    }


@pytest.mark.parametrize("level", ["intermediate", "late"])
@pytest.mark.parametrize("strategy", ["concat", "weighted", "attention"])
def test_fusion_parity_vs_torch(rng, level, strategy):
    """All 6 fusion combinations: per-sample logits match the torch oracle to
    float tolerance (the BASELINE.md parity requirement)."""
    model = MultiModalFusionNet(modality=MODS, fusion_level=level,
                                fusion_strategy=strategy, radiomics_dim=20)
    batch = _batch(rng)
    params, _ = init_fusion(model, jax.random.PRNGKey(0), batch)

    tmodel = TorchFusion(MODS, level, strategy)
    _port_flax_to_torch(params, tmodel, level, strategy)
    tmodel.eval()

    ours = model.apply({"params": params},
                       **{k: batch[k] for k in
                          ("radiomics", "age", "sex", "loc", "artifacts")},
                       train=False)
    with torch.no_grad():
        theirs = tmodel(torch.tensor(batch["radiomics"]),
                        torch.tensor(batch["age"]),
                        torch.tensor(batch["sex"].astype(np.int64)),
                        torch.tensor(batch["loc"].astype(np.int64)),
                        torch.tensor(batch["artifacts"].astype(np.int64)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------- efficientnet

def test_efficientnet_param_counts_match_published():
    """Exact parameter-count equality with efficientnet_pytorch's B0/B3."""
    for name, expect in [("efficientnet-b0", 5_288_548),
                         ("efficientnet-b3", 12_233_232)]:
        m = EfficientNet(name, num_classes=1000)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        assert param_count(v["params"]) == expect, name
    assert feature_dim("efficientnet-b3") == 1536  # model.py:64 contract


def test_efficientnet_forward_and_bn_stats():
    m = EfficientNet("efficientnet-b0")
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, train=False)
    feats = m.apply(v, x, train=False)
    assert feats.shape == (2, 1280)
    out, mutated = m.apply(v, x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(2)})
    # train mode updates running stats
    before = v["batch_stats"]["stem_bn"]["mean"]
    after = mutated["batch_stats"]["stem_bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_port_torch_state_dict_structure():
    """A synthetic efficientnet_pytorch-style state dict ports into exactly
    the flax init structure (all leaves matched, correct shapes)."""
    name = "efficientnet-b0"
    m = EfficientNet(name, num_classes=1000)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)

    sd = {}
    def add_conv(tkey, fparams, bias=False):
        k = np.asarray(fparams["kernel"])
        sd[tkey + ".weight"] = np.moveaxis(k, (0, 1, 2, 3), (2, 3, 1, 0))
        if bias:
            sd[tkey + ".bias"] = np.asarray(fparams["bias"])
    def add_bn(tkey, fparams, fstats):
        sd[tkey + ".weight"] = np.asarray(fparams["scale"])
        sd[tkey + ".bias"] = np.asarray(fparams["bias"])
        sd[tkey + ".running_mean"] = np.asarray(fstats["mean"])
        sd[tkey + ".running_var"] = np.asarray(fstats["var"])

    p, s = v["params"], v["batch_stats"]
    add_conv("_conv_stem", p["stem_conv"])
    add_bn("_bn0", p["stem_bn"], s["stem_bn"])
    for i in range(len(block_args(name))):
        bp, bs = p[f"block_{i}"], s[f"block_{i}"]
        t = f"_blocks.{i}"
        if "expand_conv" in bp:
            add_conv(f"{t}._expand_conv", bp["expand_conv"])
            add_bn(f"{t}._bn0", bp["bn0"], bs["bn0"])
        add_conv(f"{t}._depthwise_conv", bp["depthwise_conv"])
        add_bn(f"{t}._bn1", bp["bn1"], bs["bn1"])
        add_conv(f"{t}._se_reduce", bp["se_reduce"], bias=True)
        add_conv(f"{t}._se_expand", bp["se_expand"], bias=True)
        add_conv(f"{t}._project_conv", bp["project_conv"])
        add_bn(f"{t}._bn2", bp["bn2"], bs["bn2"])
    add_conv("_conv_head", p["head_conv"])
    add_bn("_bn1", p["head_bn"], s["head_bn"])
    sd["_fc.weight"] = np.asarray(p["fc"]["kernel"]).T
    sd["_fc.bias"] = np.asarray(p["fc"]["bias"])

    ported_params, ported_stats = port_torch_state_dict(sd, name)
    flat_a = jax.tree_util.tree_leaves_with_path(v["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(ported_params))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path]),
                                   err_msg=str(path))
    out_a = m.apply(v, jnp.ones((1, 32, 32, 3)), train=False)
    out_b = m.apply({"params": ported_params, "batch_stats": ported_stats},
                    jnp.ones((1, 32, 32, 3)), train=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


# --------------------------------------------------------------- train loop

def test_fusion_train_loop_learns(rng):
    """Backbone-free fusion net memorizes a small labeled set; loops follow
    the reference's epoch/validate/test protocol."""
    model = MultiModalFusionNet(modality=MODS, fusion_level="intermediate",
                                fusion_strategy="concat", radiomics_dim=20)
    batch = _batch(rng, n=32)
    # make radiomics informative
    batch["radiomics"] = (np.eye(NC, 20, dtype=np.float32)[batch["target"]] * 3
                          + batch["radiomics"] * 0.1)
    params, batch_stats = init_fusion(model, jax.random.PRNGKey(0), batch)
    opt = fusion_optimizer(lr=0.1)
    state = TrainState.create(params, opt, jax.random.PRNGKey(1))
    train_step = make_fusion_train_step(model, opt)
    eval_step = make_fusion_eval_step(model)

    from multimodal_isic_tpu.core.rng import RngPool
    stream = RngPool(0)["dropout"]
    loader = [batch]
    first_loss = None
    for epoch in range(30):
        state, batch_stats, loss, acc = train_epoch(
            train_step, state, batch_stats, loader, stream, epoch=epoch)
        if first_loss is None:
            first_loss = loss
    val_loss = validate_epoch(eval_step, state.params, batch_stats, loader)
    acc, report = evaluate_test(eval_step, state.params, batch_stats, loader)
    assert val_loss < first_loss
    assert acc > 0.8
    assert "weighted avg" in report


def test_fusion_with_image_features_path(rng):
    """image modality via pre-extracted features (backbone-free eval path)."""
    model = MultiModalFusionNet(modality=["image"], fusion_level="late",
                                fusion_strategy="concat")
    feats = jnp.asarray(rng.randn(3, 1536), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           image_features=feats, train=False)
    out = model.apply(variables, image_features=feats, train=False)
    assert out.shape == (3, NC)


def test_fused_epoch_matches_per_step_loop(rng):
    """make_fusion_train_epoch (one scanned program per epoch, the r5
    HBM-resident hot path) reproduces the manual per-step loop bit-for-bit:
    same gathers, same augment/dropout key streams, same final params."""
    from multimodal_isic_tpu.train.fusion import make_fusion_train_epoch

    n, bs = 12, 4
    model = MultiModalFusionNet(modality=MODS, fusion_level="intermediate",
                                fusion_strategy="concat", radiomics_dim=20)
    meta = {k: jnp.asarray(v) for k, v in _batch(rng, n=n).items()}
    images = jnp.asarray(rng.randint(0, 255, (n, 8, 8, 3)), jnp.uint8)
    masks = jnp.asarray(rng.randint(0, 2, (n, 8, 8)), jnp.uint8)
    init_b = {k: np.asarray(v[:2]) for k, v in meta.items()}
    params, batch_stats = init_fusion(model, jax.random.PRNGKey(0), init_b)
    opt = fusion_optimizer(lr=0.05)

    # a stochastic transform so the augment key stream is exercised (the
    # model ignores 'image' for these modalities, but gather+keys must match)
    def transform(img, msk, key):
        noise = jax.random.normal(key, img.shape, jnp.float32)
        return img.astype(jnp.float32) + noise, msk

    order = np.arange(n)[: (n // bs) * bs].reshape(-1, bs).astype(np.int32)
    key = jax.random.PRNGKey(7)

    epoch_fn = make_fusion_train_epoch(model, opt, transform=transform)
    st = TrainState.create(params, opt, jax.random.PRNGKey(1))
    st_f, stats_f, loss_f, corr_f = epoch_fn(
        st, batch_stats, images, masks, meta, jnp.asarray(order), key)

    # manual loop with the documented key derivation
    step = make_fusion_train_step(model, opt)
    k_aug, k_drop = jax.random.split(key)
    aug_keys = jax.random.split(k_aug, order.shape[0])
    drop_keys = jax.random.split(k_drop, order.shape[0])
    st_m, stats_m = TrainState.create(params, opt, jax.random.PRNGKey(1)), batch_stats
    losses, corrects = [], 0
    for i, idx in enumerate(order):
        batch = {k: jnp.take(v, jnp.asarray(idx), axis=0)
                 for k, v in meta.items()}
        img = jnp.take(images, jnp.asarray(idx), axis=0)
        msk = jnp.take(masks, jnp.asarray(idx), axis=0)
        img, msk = transform(img, msk, aug_keys[i])
        batch["image"] = img
        st_m, stats_m, loss, ncorr = step(st_m, stats_m, batch, drop_keys[i])
        losses.append(float(loss))
        corrects += int(ncorr)

    assert np.allclose(float(loss_f), np.mean(losses), rtol=1e-6)
    assert int(corr_f) == corrects
    for a, b in zip(jax.tree_util.tree_leaves(st_f.params),
                    jax.tree_util.tree_leaves(st_m.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)


def test_fused_eval_epoch_matches_validate_epoch(rng):
    """make_fusion_eval_epoch (one scanned program per val epoch) reproduces
    validate_epoch's single-process statistic — the unweighted mean of
    per-batch CE means with a genuine partial final batch — and its correct
    count."""
    from multimodal_isic_tpu.data.augment import preprocess_eval_batch
    from multimodal_isic_tpu.train.fusion import (make_fusion_eval_epoch,
                                                  make_fusion_eval_step,
                                                  padded_epoch_order,
                                                  validate_epoch)

    n, bs = 11, 4  # 3 batches, final one partial (3 rows)
    model = MultiModalFusionNet(modality=MODS, fusion_level="intermediate",
                                fusion_strategy="concat", radiomics_dim=20)
    meta = {k: jnp.asarray(v) for k, v in _batch(rng, n=n).items()}
    images = jnp.asarray(rng.randint(0, 255, (n, 16, 16, 3)), jnp.uint8)
    init_b = {k: np.asarray(v[:2]) for k, v in meta.items()}
    params, batch_stats = init_fusion(model, jax.random.PRNGKey(0), init_b)

    epoch_fn = make_fusion_eval_epoch(model, out_hw=(8, 8))
    order, valid = padded_epoch_order(n, bs)
    assert valid[-1].sum() == 3 and (order[-1][3:] == 0).all()
    loss_f, corr_f = epoch_fn(params, batch_stats, images, meta,
                              jnp.asarray(order), jnp.asarray(valid))

    step = make_fusion_eval_step(model)
    batches, correct = [], 0
    for s in range(0, n, bs):
        idx = np.arange(s, min(s + bs, n))
        b = {k: jnp.asarray(np.asarray(v)[idx]) for k, v in meta.items()}
        b["image"] = preprocess_eval_batch(images[jnp.asarray(idx)], (8, 8))
        batches.append(b)
    val_loss = validate_epoch(step, params, batch_stats, batches)
    for b in batches:
        _, logits = step(params, batch_stats, b)
        correct += int(jnp.sum(jnp.argmax(logits, 1) == b["target"]))

    assert np.allclose(float(loss_f), val_loss, rtol=1e-5), (
        float(loss_f), val_loss)
    assert int(corr_f) == correct


def test_device_dataset_epoch_order():
    """epoch_order reshapes a shuffle into (n_steps, B) and drops the tail."""
    from multimodal_isic_tpu.data.pipeline import DeviceDataset

    order = np.random.RandomState(0).permutation(11)
    out = DeviceDataset.epoch_order.__get__(
        type("D", (), {"__len__": lambda s: 11})()
    )(4, order=order)
    assert out.shape == (2, 4) and out.dtype == np.int32
    assert (out.ravel() == order[:8]).all()
