"""Viz artifacts and profiling utilities."""

import os

import numpy as np

from multimodal_isic_tpu.utils import profiling
from multimodal_isic_tpu.utils.viz import latent_scatter, reconstruction_grid


def test_latent_scatter_writes_png(rng, tmp_path):
    feats = rng.randn(60, 12).astype(np.float32)
    targets = rng.randint(0, 4, 60)
    out = latent_scatter(feats, targets, str(tmp_path / "scatter.png"),
                         balance_classes=True)
    assert os.path.getsize(out) > 1000


def test_reconstruction_grid_writes_png(rng, tmp_path):
    image = rng.randn(64, 64, 3).astype(np.float32)
    pred = rng.randn(16, 16 * 16 * 3).astype(np.float32)
    mask = (rng.rand(16) > 0.3).astype(np.float32)
    out = reconstruction_grid(image, pred, mask, str(tmp_path / "grid.png"))
    assert os.path.getsize(out) > 1000


def test_step_timer_and_timeit(rng):
    import jax.numpy as jnp
    timer = profiling.StepTimer()
    x = jnp.asarray(rng.randn(32, 32), jnp.float32)
    for _ in range(3):
        with timer.step(output=x):
            x = x @ x.T / 32.0
    s = timer.summary()
    assert s["steps"] == 3 and s["mean_s"] > 0

    t = profiling.timeit_closed(lambda: x @ x.T, iters=3, repeats=2)
    assert t > 0
