"""Optimizers must track torch.optim step-for-step (reference trains with
torch SGD/Adam/AdamW — main.py:135, train_ae.py:149-152, utils_g_mil.py:139-146)."""

import numpy as np
import pytest
import torch

from multimodal_isic_tpu.core import optim as O


def _torch_run(opt_name, params_np, grads_seq, lr, wd, **kw):
    tparams = [torch.nn.Parameter(torch.tensor(p)) for p in params_np]
    if opt_name == "sgd":
        opt = torch.optim.SGD(tparams, lr=lr, momentum=kw.get("momentum", 0.9),
                              weight_decay=wd)
    elif opt_name == "adam":
        opt = torch.optim.Adam(tparams, lr=lr, weight_decay=wd)
    elif opt_name == "adamw":
        opt = torch.optim.AdamW(tparams, lr=lr, weight_decay=wd)
    for grads in grads_seq:
        for p, g in zip(tparams, grads):
            p.grad = torch.tensor(g)
        opt.step()
    return [p.detach().numpy() for p in tparams]


def _ours_run(opt_name, params_np, grads_seq, lr, wd, **kw):
    opt = O.make_optimizer(opt_name, lr, weight_decay=wd, **kw)
    params = {f"p{i}": np.array(p) for i, p in enumerate(params_np)}
    state = opt.init(params)
    for grads in grads_seq:
        g = {f"p{i}": np.array(gi) for i, gi in enumerate(grads)}
        params, state = opt.apply(g, state, params)
    return [np.asarray(params[f"p{i}"]) for i in range(len(params_np))]


@pytest.mark.parametrize("opt_name,kw", [
    ("sgd", {"momentum": 0.9}),
    ("adam", {}),
    ("adamw", {}),
])
def test_matches_torch(rng, opt_name, kw):
    params = [rng.randn(4, 3).astype(np.float32), rng.randn(5).astype(np.float32)]
    grads_seq = [[rng.randn(4, 3).astype(np.float32), rng.randn(5).astype(np.float32)]
                 for _ in range(5)]
    lr, wd = 1e-2, 1e-3
    expected = _torch_run(opt_name, params, grads_seq, lr, wd, **kw)
    got = _ours_run(opt_name, params, grads_seq, lr, wd, **kw)
    for e, g in zip(expected, got):
        np.testing.assert_allclose(g, e, rtol=2e-5, atol=2e-6)


def test_per_path_learning_rates(rng):
    """Encoder-lr / decoder-lr split (train_ae.py:145-152) via path-keyed lr."""
    params = {"encoder": np.ones(3, np.float32), "decoder": np.ones(3, np.float32)}
    grads = {"encoder": np.ones(3, np.float32), "decoder": np.ones(3, np.float32)}
    lr = lambda path: 1e-5 if "decoder" not in path else 1e-3
    opt = O.adamw(lr, weight_decay=0.0, b2=0.95)
    state = opt.init(params)
    new_params, _ = opt.apply(grads, state, params)
    d_enc = float(np.abs(new_params["encoder"] - 1.0).max())
    d_dec = float(np.abs(new_params["decoder"] - 1.0).max())
    # float32 spacing near 1.0 (~1.2e-7) quantizes the 1e-5 update
    assert d_dec == pytest.approx(100 * d_enc, rel=2e-2)
