"""EfficientNet golden parity: torch oracle state_dict → ported JAX params →
per-sample output equality to float tolerance (BASELINE.md requirement for
the image branch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodal_isic_tpu.models.efficientnet import EfficientNet, port_torch_state_dict
from multimodal_isic_tpu.utils.torch_ref import build_torch_efficientnet


@pytest.mark.parametrize("name,res", [
    ("efficientnet-b0", 64),
    # B3 at reduced resolution: proves the compound-scaled block graph
    # (depth rounding, SE-on-input-filters, drop-connect schedule) that the
    # fusion flagship actually runs (model.py:58-59) — resolution only
    # changes spatial dims, not the scaling path
    ("efficientnet-b3", 96),
])
def test_backbone_parity_vs_torch(rng, name, res):
    tmodel = build_torch_efficientnet(name, num_classes=10)
    tmodel.eval()
    # randomize BN stats so the test exercises running-stat normalization
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    params, stats = port_torch_state_dict(tmodel.state_dict(), name)
    jmodel = EfficientNet(name, num_classes=10)

    x = rng.rand(2, res, res, 3).astype(np.float32)
    with torch.no_grad():
        theirs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(jmodel.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-4)


def test_backbone_parity_odd_input_size(rng):
    """Asymmetric TF-SAME padding path (odd spatial dims, stride 2)."""
    name = "efficientnet-b0"
    tmodel = build_torch_efficientnet(name, num_classes=None)
    tmodel.eval()
    params, stats = port_torch_state_dict(tmodel.state_dict(), name)
    jmodel = EfficientNet(name)
    x = rng.rand(1, 75, 75, 3).astype(np.float32)
    with torch.no_grad():
        theirs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(jmodel.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("mode", ["conv", "block"])
def test_remat_matches_unrematted(rng, mode):
    """remat='conv'/'block' change ONLY what backward stores: same param
    tree, same train-mode outputs, grads, and BN stat updates as
    remat='none' (checkpoint_name tags / nn.remat are semantics-free)."""
    x = jnp.asarray(rng.rand(2, 48, 48, 3).astype(np.float32))

    results = {}
    for m in ("none", mode):
        model = EfficientNet("efficientnet-b0", remat=m)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x, train=False)

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(out ** 2), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(v["params"])
        results[m] = (float(loss), grads, stats)

    l0, g0, s0 = results["none"]
    l1, g1, s1 = results[mode]
    assert jax.tree_util.tree_structure(g1) == jax.tree_util.tree_structure(g0)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    # Grad tolerance: the rematerialized backward recomputes the forward
    # chains, and XLA fuses the recomputed graph differently from the
    # saved-activation graph, so fp32 rounding drifts through B0's 16
    # blocks. Loss matching at 1e-6 proves the dropout masks and semantics
    # are identical; grads must agree to ~1e-4 of each leaf's own scale
    # (element-wise rtol is meaningless for near-zero grad entries).
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)):
        a, b = np.asarray(a), np.asarray(b)
        # 1e-3 absolute floor: leaves whose grad is numerically zero
        # (e.g. ~1e-4 against a loss whose grads reach ~1e2) carry only
        # rounding noise in both operands.
        assert np.abs(a - b).max() <= 2e-4 * np.abs(b).max() + 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_bn_folding_matches_unfolded(rng):
    """fold_batchnorm: EfficientNet(bn_folded=True) on folded params ==
    the standard model on (params, batch_stats) at eval, and the folded
    param tree matches bn_folded init exactly (shape and structure)."""
    from multimodal_isic_tpu.models.efficientnet import fold_batchnorm

    x = jnp.asarray(rng.rand(2, 48, 48, 3).astype(np.float32))
    m = EfficientNet("efficientnet-b0")
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    stats = jax.tree_util.tree_map(  # non-trivial running stats
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) + 0.5),
        v["batch_stats"])
    ref = m.apply({"params": v["params"], "batch_stats": stats},
                  x, train=False)

    folded = fold_batchnorm(v["params"], stats, "efficientnet-b0")
    mf = EfficientNet("efficientnet-b0", bn_folded=True)
    vf = mf.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert "batch_stats" not in vf  # no BN layers remain
    assert (jax.tree_util.tree_structure(vf["params"])
            == jax.tree_util.tree_structure(folded))
    for a, b in zip(jax.tree_util.tree_leaves(vf["params"]),
                    jax.tree_util.tree_leaves(folded)):
        assert a.shape == b.shape
    out = mf.apply({"params": folded}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError):  # inference-only variant
        mf.apply({"params": folded}, x, train=True,
                 rngs={"dropout": jax.random.PRNGKey(0)})


def test_fold_fusion_params(rng):
    """Full fusion net: folded backbone evaluates identically, applied
    WITHOUT a batch_stats collection."""
    from multimodal_isic_tpu.models.fusion import (MultiModalFusionNet,
                                                   fold_fusion_params)

    n = 2
    batch = {
        "image": jnp.asarray(rng.rand(n, 48, 48, 3).astype(np.float32)),
        "radiomics": jnp.asarray(rng.randn(n, 780).astype(np.float32)),
        "age": jnp.asarray(rng.randn(n).astype(np.float32)),
        "sex": jnp.asarray(rng.randint(0, 3, n)),
        "loc": jnp.asarray(rng.randint(0, 15, n)),
        "artifacts": jnp.asarray(rng.randint(0, 2, (n, 6))),
    }
    model = MultiModalFusionNet(backbone="efficientnet-b0")
    v = model.init({"params": jax.random.PRNGKey(0)}, **batch, train=False)
    ref = model.apply({"params": v["params"],
                       "batch_stats": v["batch_stats"]}, **batch, train=False)

    folded = fold_fusion_params(v["params"], v["batch_stats"],
                                backbone="efficientnet-b0")
    mf = MultiModalFusionNet(backbone="efficientnet-b0",
                             backbone_bn_folded=True)
    out = mf.apply({"params": folded}, **batch, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # the cli.main fold_bn_eval integration seam: the shared eval step must
    # accept the folded model with an EMPTY batch_stats collection
    from multimodal_isic_tpu.train.fusion import make_fusion_eval_step
    eval_step = make_fusion_eval_step(mf)
    loss, logits = eval_step(folded, {}, dict(
        batch, target=jnp.asarray(rng.randint(0, 7, n))))
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
