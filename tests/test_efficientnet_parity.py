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
