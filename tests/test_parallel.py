"""Data-parallel CORRECTNESS: an n-device step must equal the 1-device step.

Round-1 multichip coverage only proved liveness (a sharded step runs and the
loss is finite).  These tests pin the actual DP claim — with params
replicated and the batch sharded over the ``data`` axis, jit+XLA collectives
produce the same new params/grads/outputs as the identical step on a single
device — for all three trained workloads (fusion incl. BatchNorm stats, MAE,
MIL), plus checkpoint save/restore across mesh shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_isic_tpu.core import checkpoint as ckpt
from multimodal_isic_tpu.core.optim import adamw
from multimodal_isic_tpu.core.train_state import TrainState
from multimodal_isic_tpu.models.convmae import ConvMAE
from multimodal_isic_tpu.models.fusion import MultiModalFusionNet
from multimodal_isic_tpu.models.mil import AttentionMIL, mil_loss
from multimodal_isic_tpu.parallel import (
    data_sharding, make_mesh, replicated, shard_batch)
from multimodal_isic_tpu.train.fusion import (
    fusion_optimizer, init_fusion, make_fusion_train_step)
from multimodal_isic_tpu.train.mae import init_mae, make_mae_train_step

TINY_MAE = dict(img_size=64, embed_dims=(16, 24, 32), depths=(1, 1, 2),
                num_heads=4, decoder_dim=16, decoder_depth=1, decoder_heads=4)


def _tree_allclose(a, b, rtol=1e-4, atol=1e-6):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def _fusion_batch(n, hw=64):
    rng = np.random.RandomState(0)
    return {
        "image": rng.rand(n, hw, hw, 3).astype(np.float32),
        "radiomics": rng.randn(n, 780).astype(np.float32),
        "age": rng.randn(n).astype(np.float32),
        "sex": rng.randint(0, 3, n).astype(np.int32),
        "loc": rng.randint(0, 15, n).astype(np.int32),
        "artifacts": rng.randint(0, 2, (n, 6)).astype(np.int32),
        "target": rng.randint(0, 7, n).astype(np.int32),
    }


def _place(mesh, params_like, batch):
    placed = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), params_like)
    return placed, shard_batch(mesh, batch)


def test_fusion_dp_step_equals_single_device(eight_devices):
    """One fusion train step (fwd + bwd + SGD + BatchNorm stat update) on the
    8-device mesh vs the identical step on 1 device: params, BN stats and
    loss must agree.  Matches SURVEY §2.3's 'first-class DP' claim."""
    model = MultiModalFusionNet(backbone="efficientnet-b0")
    batch = _fusion_batch(16)
    params, batch_stats = init_fusion(model, jax.random.PRNGKey(0), batch)
    opt = fusion_optimizer()
    step = make_fusion_train_step(model, opt)
    key = jax.random.PRNGKey(2)

    results = {}
    for name, n_dev in (("dp8", 8), ("single", 1)):
        mesh = make_mesh(n_data=n_dev, n_model=1,
                         devices=jax.devices()[:n_dev])
        p = jax.device_put(params, replicated(mesh))
        bs = jax.device_put(batch_stats, replicated(mesh))
        b = shard_batch(mesh, batch)
        state = TrainState.create(p, opt, jax.random.PRNGKey(1))
        new_state, new_stats, loss, correct = step(state, bs, b, key)
        results[name] = (jax.device_get(new_state.params),
                         jax.device_get(new_stats),
                         float(loss), int(correct))

    _tree_allclose(results["dp8"][0], results["single"][0])
    _tree_allclose(results["dp8"][1], results["single"][1])
    assert results["dp8"][2] == pytest.approx(results["single"][2], rel=1e-5)
    assert results["dp8"][3] == results["single"][3]


def test_mae_dp_step_equals_single_device(eight_devices):
    # SGD, not AdamW: Adam's first-step update is lr·sign(g), which amplifies
    # benign reduction-order noise on near-zero grads into full-lr flips; an
    # SGD step is linear in the gradient, so it tests the all-reduce itself
    from multimodal_isic_tpu.core.optim import sgd
    model = ConvMAE(**TINY_MAE)
    params = init_mae(model, jax.random.PRNGKey(0), batch_size=2)
    opt = sgd(1e-2)
    step = make_mae_train_step(model, opt, mask_ratio=0.75)
    images = np.random.RandomState(0).rand(16, 64, 64, 3).astype(np.float32)
    key = jax.random.PRNGKey(3)

    results = {}
    for name, n_dev in (("dp8", 8), ("single", 1)):
        mesh = make_mesh(n_data=n_dev, n_model=1,
                         devices=jax.devices()[:n_dev])
        p = jax.device_put(params, replicated(mesh))
        imgs = shard_batch(mesh, images)
        state = TrainState.create(p, opt, jax.random.PRNGKey(1))
        new_state, loss = step(state, imgs, None, key)
        results[name] = (jax.device_get(new_state.params), float(loss))

    _tree_allclose(results["dp8"][0], results["single"][0])
    assert results["dp8"][1] == pytest.approx(results["single"][1], rel=1e-5)


def test_mil_dp_batched_bags_equal_single_device(eight_devices):
    """MIL inference/gradients vmapped over a bag batch sharded across the
    mesh equal the single-device result (the DP form of the bags workload;
    training itself is bs=1-sequential by reference semantics)."""
    rng = np.random.RandomState(0)
    model = AttentionMIL(input_dim=12, hidden_dim=16, att_dim=8, num_classes=3)
    feats = rng.randn(16, 10, 12).astype(np.float32)
    valid = np.ones((16, 10), bool)
    labels = rng.randint(0, 3, 16)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        jnp.asarray(feats[0]),
                        valid=jnp.asarray(valid[0]))["params"]

    @jax.jit
    def batch_loss_and_grads(p, f, v, y):
        def one(x, vv, yy):
            probs, _ = model.apply({"params": p}, x, valid=vv, train=False)
            return mil_loss(probs, yy)
        loss = jnp.mean(jax.vmap(one)(f, v, y))
        return loss, jax.grad(
            lambda pp: jnp.mean(jax.vmap(
                lambda x, vv, yy: mil_loss(
                    model.apply({"params": pp}, x, valid=vv, train=False)[0],
                    yy))(f, v, y)))(p)

    results = {}
    for name, n_dev in (("dp8", 8), ("single", 1)):
        mesh = make_mesh(n_data=n_dev, n_model=1,
                         devices=jax.devices()[:n_dev])
        p = jax.device_put(params, replicated(mesh))
        f, v, y = (shard_batch(mesh, feats), shard_batch(mesh, valid),
                   shard_batch(mesh, labels))
        loss, grads = batch_loss_and_grads(p, f, v, y)
        results[name] = (float(loss), jax.device_get(grads))

    assert results["dp8"][0] == pytest.approx(results["single"][0], rel=1e-5)
    _tree_allclose(results["dp8"][1], results["single"][1])


def test_checkpoint_roundtrip_across_mesh_shapes(eight_devices, tmp_path):
    """A checkpoint saved from an 8-device replicated state restores onto a
    1-device mesh and vice versa (and onto a 4-device mesh), with values
    intact and the requested shardings applied."""
    opt = adamw(1e-3)
    params = {"w": jnp.arange(24, dtype=jnp.float32).reshape(8, 3),
              "b": jnp.ones(3)}

    mesh8 = make_mesh(n_data=8, n_model=1)
    state8 = TrainState.create(
        jax.device_put(params, replicated(mesh8)), opt, jax.random.PRNGKey(0))
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state8 = jax.jit(lambda s, g: s.apply_gradients(g, opt))(state8, grads)
    path8 = ckpt.save_checkpoint(str(tmp_path / "from8"), state8, step=1)

    # restore onto 1 device
    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    template = TrainState.create(
        jax.tree_util.tree_map(jnp.zeros_like, params), opt, jax.random.PRNGKey(0))
    shardings1 = jax.tree_util.tree_map(lambda _: replicated(mesh1), template)
    restored1 = ckpt.restore_checkpoint(path8, template, shardings=shardings1)
    _tree_allclose(restored1.params, jax.device_get(state8.params), rtol=0, atol=0)
    assert restored1.params["w"].sharding.is_equivalent_to(replicated(mesh1), 2)

    # take one more step on 1 device, save, restore back onto a 4-device mesh
    restored1 = jax.jit(lambda s, g: s.apply_gradients(g, opt))(restored1, grads)
    path1 = ckpt.save_checkpoint(str(tmp_path / "from1"), restored1, step=2)
    mesh4 = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    shardings4 = jax.tree_util.tree_map(lambda _: replicated(mesh4), template)
    restored4 = ckpt.restore_checkpoint(path1, template, shardings=shardings4)
    _tree_allclose(restored4.params, jax.device_get(restored1.params),
                   rtol=0, atol=0)
    assert int(restored4.step) == 2

    # the restored state continues training on the new mesh: step equals the
    # same step taken pre-roundtrip (exact — same arithmetic, same layout)
    cont_a = jax.jit(lambda s, g: s.apply_gradients(g, opt))(restored4, grads)
    cont_b = jax.jit(lambda s, g: s.apply_gradients(g, opt))(restored1, grads)
    _tree_allclose(cont_a.params, jax.device_get(cont_b.params))


def test_mae_tensor_parallel_step_equals_replicated(eight_devices):
    """TP is real, not reserved: ConvMAE params Megatron-placed over a
    (data=2, model=4) mesh (`parallel.tp`) run the SAME jitted train step as
    the replicated layout on the SAME mesh — XLA inserts the row/column
    collectives from the shardings alone — and one SGD step matches bit-near
    (3e-8 on CPU).  The same-mesh comparison isolates the TP transformation:
    changing the per-device batch (mesh shape) alone already moves fp32
    results by ~5e-4 through conv reduction reordering, TP adds nothing."""
    from multimodal_isic_tpu.core.optim import sgd
    from multimodal_isic_tpu.parallel.tp import place_tp

    model = ConvMAE(**TINY_MAE)
    params = init_mae(model, jax.random.PRNGKey(0), batch_size=2)
    opt = sgd(1e-2)
    step = make_mae_train_step(model, opt, mask_ratio=0.75)
    images = np.random.RandomState(0).rand(8, 64, 64, 3).astype(np.float32)
    key = jax.random.PRNGKey(3)
    mesh = make_mesh(n_data=2, n_model=4)

    prep = jax.device_put(params, replicated(mesh))
    srep, lrep = step(TrainState.create(prep, opt, jax.random.PRNGKey(1)),
                      shard_batch(mesh, images), None, key)

    ptp = place_tp(params, mesh)
    # the QKV kernel really is column-split 4 ways over the model axis
    qkv = ptp["vit_0"]["Attention_0"]["Dense_0"]["kernel"]
    assert {s.data.shape for s in qkv.addressable_shards} == {(32, 96 // 4)}
    stp, ltp = step(TrainState.create(ptp, opt, jax.random.PRNGKey(1)),
                    shard_batch(mesh, images), None, key)

    assert float(ltp) == pytest.approx(float(lrep), rel=1e-6)
    _tree_allclose(jax.device_get(stp.params), jax.device_get(srep.params),
                   rtol=1e-5, atol=1e-6)
    # the updated params keep the TP layout (no silent gather-back)
    new_qkv = stp.params["vit_0"]["Attention_0"]["Dense_0"]["kernel"]
    assert {s.data.shape for s in new_qkv.addressable_shards} == {(32, 24)}
