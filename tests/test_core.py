"""Core runtime: config, RNG streams, early stopping, train state, checkpoint,
mesh/sharding."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_isic_tpu.core import (
    Config, EarlyStopping, RngPool, TrainState, config_from_dict, load_config,
)
from multimodal_isic_tpu.core import checkpoint as ckpt
from multimodal_isic_tpu.core import optim as O
from multimodal_isic_tpu.parallel import data_sharding, make_mesh, replicated, shard_batch


def test_config_union_of_reference_keys(tmp_path):
    yml = tmp_path / "config.yml"
    yml.write_text(
        """
neptune: False
seed: 42
device: 'tpu'
pca: true
num_classes: 7
dir:
  csv: "/tmp/train.csv"
  df: "/tmp/df.pkl"
  radiomics_red: "/tmp/rad_red.pkl"
  radiomics_test_red: "/tmp/rad_test_red.pkl"
training_plan:
  modality: ['image', 'clinical']
  fusion: 'weighted'
  fusion_level: 'late'
  parameters:
    patience: 10
    epochs: 3
    fold: 1
    batch_size: 8
    lr: 0.001
    norm_pix_loss: true
    masking_ratio: 0.75
    eval_masking_ratio: 0.5
    include_lesion_mask: true
best_params:
  hidden_dim: 368
best_params_graph-mil:
  gnn_type: gat
"""
    )
    cfg = load_config(str(yml))
    # attribute access
    assert cfg.training_plan.parameters.masking_ratio == 0.75
    assert cfg.pca is True
    # reference-style dict access
    assert cfg["seed"] == 42
    assert cfg["dir"]["df"] == "/tmp/df.pkl"
    assert cfg["training_plan"]["parameters"]["eval_masking_ratio"] == 0.5
    assert cfg["best_params_graph-mil"]["gnn_type"] == "gat"
    assert cfg.get("missing", "d") == "d"


def test_config_rejects_typos():
    with pytest.raises(KeyError):
        config_from_dict({"sead": 42})


def test_rng_streams_are_independent_and_stable():
    pool = RngPool(42)
    a1 = pool["augment"].at(0)
    a2 = RngPool(42)["augment"].at(0)
    b = pool["masking"].at(0)
    assert jnp.array_equal(a1, a2)
    assert not jnp.array_equal(a1, b)


def test_early_stopping_counter_semantics():
    """Counter-to-zero semantics of net_utils.py:130-158."""
    es = EarlyStopping(patience=2)
    p = {"w": jnp.ones(2)}
    assert es(1.0, p) is False          # improve: counter reset to 2
    assert es(2.0, p) is False          # worse: counter 1
    assert es(0.5, {"w": jnp.zeros(2)}) is False  # improve on last count: rescued
    assert es(0.9, p) is False          # worse: counter 1
    assert es(0.9, p) is True           # worse: counter 0 -> stop
    assert float(es.get_best_params()["w"][0]) == 0.0  # snapshot from best epoch


def test_train_state_and_checkpoint_roundtrip(tmp_path):
    opt = O.adamw(1e-3)
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "b": jnp.zeros(3)}
    state = TrainState.create(params, opt, jax.random.PRNGKey(0))
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state = state.apply_gradients(grads, opt)
    state = state.apply_gradients(grads, opt)
    assert int(state.step) == 2

    path = ckpt.save_checkpoint(str(tmp_path), state, step=2, metadata={"val_loss": 0.5})
    assert ckpt.latest_checkpoint(str(tmp_path)) == path
    assert ckpt.checkpoint_metadata(path)["val_loss"] == 0.5

    template = TrainState.create(
        jax.tree_util.tree_map(jnp.zeros_like, params), opt, jax.random.PRNGKey(0))
    restored = ckpt.restore_checkpoint(path, template)
    assert int(restored.step) == 2
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(state.params["w"]))
    np.testing.assert_allclose(np.asarray(restored.opt_state.mu["b"]),
                               np.asarray(state.opt_state.mu["b"]))


def test_mesh_and_data_sharding(eight_devices):
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2),
             "y": np.arange(16)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.is_equivalent_to(data_sharding(mesh, 2), 2)

    @jax.jit
    def mean_x(b):
        return b["x"].mean()

    assert float(mean_x(sharded)) == pytest.approx(np.mean(batch["x"]))


def test_replicated_params_jit_runs_on_mesh(eight_devices):
    mesh = make_mesh()
    w = jax.device_put(np.eye(4, dtype=np.float32), replicated(mesh))
    x = shard_batch(mesh, np.ones((8, 4), np.float32))
    y = jax.jit(lambda w, x: x @ w)(w, x)
    np.testing.assert_allclose(np.asarray(y), np.ones((8, 4)))


def test_restore_partial_strict_false_semantics(tmp_path):
    """Name-matched partial restore (the reference's strict=False loads)."""
    full = {"encoder": {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)},
            "decoder": {"w": jnp.full((3,), 7.0)}}
    path = ckpt.save_checkpoint(str(tmp_path / "full"), full)

    # encoder-only target: decoder leaves in the checkpoint are ignored,
    # matching encoder leaves load, extra target leaves keep their values
    target = {"encoder": {"w": jnp.zeros((2, 2)), "b": jnp.full((2,), 5.0)},
              "new_head": {"w": jnp.full((4,), 9.0)}}
    out = ckpt.restore_partial(path, target)
    np.testing.assert_allclose(np.asarray(out["encoder"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["encoder"]["b"]), 0.0)
    np.testing.assert_allclose(np.asarray(out["new_head"]["w"]), 9.0)  # kept

    # shape mismatch -> target value kept (not loaded)
    target2 = {"encoder": {"w": jnp.zeros((5, 5)), "b": jnp.zeros(2)}}
    out2 = ckpt.restore_partial(path, target2)
    assert np.asarray(out2["encoder"]["w"]).sum() == 0.0

    with pytest.raises(KeyError):
        ckpt.restore_partial(path, target, strict=True)  # new_head missing
    assert "encoder/w" in ckpt.checkpoint_paths(path)


def test_restore_partial_across_trainstate_namespace(tmp_path):
    """A full-TrainState checkpoint must restore into a bare params tree (and
    vice versa): the '(.)params/' namespace is stripped when matching, and a
    zero-match restore raises instead of silently returning random weights
    (the save_latent.py:49 failure mode)."""
    opt = O.adamw(1e-3)
    params = {"embed1": {"kernel": jnp.full((2, 3), 4.0), "bias": jnp.ones(3)}}
    state = TrainState.create(params, opt, jax.random.PRNGKey(0))
    state_path = ckpt.save_checkpoint(str(tmp_path / "state"), state, step=1)

    # TrainState checkpoint -> bare params target
    target = jax.tree_util.tree_map(jnp.zeros_like, params)
    out = ckpt.restore_partial(state_path, target)
    np.testing.assert_allclose(np.asarray(out["embed1"]["kernel"]), 4.0)
    np.testing.assert_allclose(np.asarray(out["embed1"]["bias"]), 1.0)

    # bare params checkpoint -> TrainState target (params restored, opt kept)
    params_path = ckpt.save_checkpoint(str(tmp_path / "params"), params)
    fresh = TrainState.create(
        jax.tree_util.tree_map(jnp.zeros_like, params), opt, jax.random.PRNGKey(1))
    out2 = ckpt.restore_partial(params_path, fresh)
    np.testing.assert_allclose(np.asarray(out2.params["embed1"]["kernel"]), 4.0)

    # zero leaves matched -> hard error, even with strict=False
    with pytest.raises(ValueError, match="matched 0"):
        ckpt.restore_partial(state_path, {"totally": {"different": jnp.zeros(5)}})
