"""Multi-host (multi-process) DP correctness: a train step sharded across
TWO OS processes (4 virtual CPU devices each, Gloo collectives over
localhost) must equal the same step run single-process — proving the
``jax.distributed`` + per-process input sharding path of SURVEY.md §2.3.

The reference has no cross-process training at all (Ray's object store is
its only inter-process channel, ``tune_mil.py:142,243``); this is the
build's first-class replacement for that slot.
"""

import os
import socket
import subprocess
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
outdir = sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["ISIC_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["ISIC_NUM_PROCESSES"] = str(nproc)
os.environ["ISIC_PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
from multimodal_isic_tpu.parallel import distributed as D
assert D.initialize(), "distributed init failed"
assert jax.process_count() == nproc
import jax.numpy as jnp
import numpy as np
from multimodal_isic_tpu.models.mil import AttentionMIL, mil_loss
from multimodal_isic_tpu.core.optim import sgd
from multimodal_isic_tpu.core.train_state import TrainState
from multimodal_isic_tpu.parallel import replicated

mesh = D.global_mesh()
assert mesh.devices.shape[0] == 8  # 2 processes x 4 local devices

rng = np.random.RandomState(0)
mil = AttentionMIL(input_dim=12, hidden_dim=16, att_dim=8, num_classes=3)
N_GLOBAL = 16
feats = rng.randn(N_GLOBAL, 10, 12).astype(np.float32)
valid = np.ones((N_GLOBAL, 10), bool)
labels = rng.randint(0, 3, N_GLOBAL)
params = mil.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)},
                  jnp.asarray(feats[0]), valid=jnp.asarray(valid[0]))["params"]

# each process loads ONLY its own rows — the per-host input-sharding contract
rows = D.process_local_rows(N_GLOBAL)
batch = D.host_local_batch_to_global(
    mesh, {"x": feats[rows], "v": valid[rows], "y": labels[rows]})
p = jax.device_put(params, replicated(mesh))
state = TrainState.create(p, sgd(1e-2), jax.random.PRNGKey(1))

@jax.jit
def step(state, b):
    def mean_loss(pp):
        return jnp.mean(jax.vmap(
            lambda x, vv, yy: mil_loss(
                mil.apply({"params": pp}, x, valid=vv, train=False)[0],
                yy))(b["x"], b["v"], b["y"]))
    loss, grads = jax.value_and_grad(mean_loss)(state.params)
    return state.apply_gradients(grads, sgd(1e-2)), loss

state, loss = step(state, batch)
loss = float(loss)
assert D.all_processes_equal(loss), "processes disagree on the loss"
if D.is_coordinator():
    flat = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        jax.device_get(state.params))]
    np.savez(os.path.join(outdir, "result.npz"), loss=loss,
             **{f"p{i}": a for i, a in enumerate(flat)})
print(f"proc {pid}: loss={loss:.6f} OK", flush=True)
"""


def _communicate_all(procs, timeout=600):
    """Drain every worker's stdout CONCURRENTLY and reap them all, killing
    the whole group on timeout/failure.  Sequential ``p.communicate`` calls
    leave the later workers' pipes undrained (a worker blocks on a full pipe
    and the collective deadlocks) and, worse, leave ORPHANS running after a
    TimeoutExpired — on a shared-accelerator host an orphan that touched the
    chip wedges it for every later process."""
    from concurrent.futures import ThreadPoolExecutor

    try:
        with ThreadPoolExecutor(max_workers=len(procs)) as ex:
            futs = [ex.submit(p.communicate, timeout=timeout) for p in procs]
            return [f.result(timeout=timeout + 30)[0] for f in futs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()


@pytest.mark.slow
def test_two_process_dp_step_equals_single_process(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    env = {**os.environ,
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", str(port),
         str(tmp_path)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(2)]
    outs = _communicate_all(procs)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    dist = np.load(tmp_path / "result.npz")

    # single-process baseline on this (8-device) test process
    from multimodal_isic_tpu.core.optim import sgd
    from multimodal_isic_tpu.core.train_state import TrainState
    from multimodal_isic_tpu.models.mil import AttentionMIL, mil_loss
    from multimodal_isic_tpu.parallel import make_mesh, replicated, shard_batch

    rng = np.random.RandomState(0)
    mil = AttentionMIL(input_dim=12, hidden_dim=16, att_dim=8, num_classes=3)
    feats = rng.randn(16, 10, 12).astype(np.float32)
    valid = np.ones((16, 10), bool)
    labels = rng.randint(0, 3, 16)
    params = mil.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      jnp.asarray(feats[0]),
                      valid=jnp.asarray(valid[0]))["params"]
    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    p = jax.device_put(params, replicated(mesh1))
    state = TrainState.create(p, sgd(1e-2), jax.random.PRNGKey(1))
    batch = shard_batch(mesh1, {"x": feats, "v": valid, "y": labels})

    @jax.jit
    def step(state, b):
        def mean_loss(pp):
            return jnp.mean(jax.vmap(
                lambda x, vv, yy: mil_loss(
                    mil.apply({"params": pp}, x, valid=vv, train=False)[0],
                    yy))(b["x"], b["v"], b["y"]))
        loss, grads = jax.value_and_grad(mean_loss)(state.params)
        return state.apply_gradients(grads, sgd(1e-2)), loss

    state, loss = step(state, batch)
    np.testing.assert_allclose(float(loss), float(dist["loss"]), rtol=1e-5)
    flat = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        jax.device_get(state.params))]
    for i, a in enumerate(flat):
        np.testing.assert_allclose(
            a, dist[f"p{i}"], rtol=1e-5, atol=1e-7,
            err_msg=f"param leaf {i} differs between 2-process and "
                    f"single-process DP step")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_fusion_cli_two_process(tmp_path):
    """The PRIMARY entry point (cli.main) across 2 OS processes: each host
    loads only its slice of every global batch, trains the same global
    program, and only the coordinator writes run artifacts — the full
    multi-host wiring of SURVEY §2.3, not just the low-level step."""
    import yaml

    from multimodal_isic_tpu.data import make_synthetic_isic

    dirs = make_synthetic_isic(str(tmp_path / "data"), n_train=40, n_test=8,
                               image_hw=(64, 80), seed=5)
    config = {
        "seed": 42, "device": "cpu", "dir": dirs,
        "model_path": str(tmp_path / "models"),
        "log_dir": str(tmp_path / "runs"),
        "training_plan": {
            "modality": ["radiomics", "clinical", "artifacts"],
            "fusion": "concat", "fusion_level": "intermediate",
            "parameters": {"patience": 3, "epochs": 2, "fold": 1},
        },
    }
    cfg = tmp_path / "config.yml"
    cfg.write_text(yaml.safe_dump(config))

    # build the manifests once (single-process ETL)
    env0 = {**os.environ,
            "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    pre = subprocess.run(
        [sys.executable, "-m", "multimodal_isic_tpu.cli.prepare_df",
         "--config_path", str(cfg)], env=env0, capture_output=True,
        text=True, timeout=300)
    assert pre.returncode == 0, pre.stdout + pre.stderr

    port = _free_port()
    procs = []
    for pid in range(2):
        env = {**env0,
               "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
               "ISIC_COORDINATOR": f"127.0.0.1:{port}",
               "ISIC_NUM_PROCESSES": "2",
               "ISIC_PROCESS_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "multimodal_isic_tpu.cli.main",
             "--config_path", str(cfg)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = _communicate_all(procs)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    # exactly ONE run record and ONE saved model (coordinator-only writes)
    runs = os.listdir(tmp_path / "runs")
    assert len(runs) == 1, runs
    assert len(os.listdir(tmp_path / "models")) == 1
    # coordinator printed the digits=5 classification report
    assert "Classification Report" in outs[0]
    assert "Classification Report" not in outs[1]


@pytest.mark.slow
def test_train_ae_cli_two_process(tmp_path):
    """cli.train_ae across 2 processes: the image input pipeline (decode →
    per-host shard → global augment transform) feeds the sharded MAE train
    step; resumable checkpoints, best model, and viz artifacts are written
    once (coordinator)."""
    import yaml

    from multimodal_isic_tpu.data import make_synthetic_isic

    dirs = make_synthetic_isic(str(tmp_path / "data"), n_train=40, n_test=8,
                               image_hw=(64, 80), seed=5)
    config = {
        "seed": 42, "device": "cpu", "dir": dirs,
        "model_path": str(tmp_path / "models"),
        "log_dir": str(tmp_path / "runs"),
        "training_plan": {
            "modality": ["image"], "fusion": "concat",
            "fusion_level": "intermediate",
            "parameters": {"epochs": 1, "batch_size": 16,
                           "model_size": "tiny", "masking_ratio": 0.75,
                           "eval_masking_ratio": 0.5, "fold": 1},
        },
    }
    cfg = tmp_path / "config.yml"
    cfg.write_text(yaml.safe_dump(config))

    env0 = {**os.environ,
            "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    pre = subprocess.run(
        [sys.executable, "-m", "multimodal_isic_tpu.cli.prepare_df",
         "--config_path", str(cfg)], env=env0, capture_output=True,
        text=True, timeout=300)
    assert pre.returncode == 0, pre.stdout + pre.stderr

    port = _free_port()
    procs = []
    for pid in range(2):
        env = {**env0,
               "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
               "ISIC_COORDINATOR": f"127.0.0.1:{port}",
               "ISIC_NUM_PROCESSES": "2",
               "ISIC_PROCESS_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "multimodal_isic_tpu.cli.train_ae",
             "--config_path", str(cfg)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = _communicate_all(procs)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    model_dirs = os.listdir(tmp_path / "models")
    assert any(len(d) == 32 for d in model_dirs)  # best model (once)
    assert "mae_ckpt" in model_dirs
    assert len(os.listdir(tmp_path / "runs")) == 1  # one run record
    assert "Saved Best Model" in outs[0]
    assert "Saved Best Model" not in outs[1]


def test_process_epoch_order_reassembles_global_batches(monkeypatch):
    """Concatenating every process's slice of batch k (in rank order) must
    reproduce order[k*G:(k+1)*G] exactly — the contract host_local_batch_
    to_global's process-contiguous stacking relies on."""
    from multimodal_isic_tpu.parallel import distributed as D

    order = np.random.RandomState(0).permutation(37)
    G, NP = 8, 2
    slices = []
    monkeypatch.setattr(jax, "process_count", lambda: NP)
    for pid in range(NP):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        local, per, n_true = D.process_epoch_order(order, G)
        assert per == G // NP and n_true == 37
        slices.append(local.reshape(-1, per))
    nb = 37 // G
    rebuilt = np.concatenate(
        [np.concatenate([s[k] for s in slices]) for k in range(nb)])
    np.testing.assert_array_equal(rebuilt, order[: nb * G])

    # pad_to_full wraps the tail into one extra full global batch
    for pid in range(NP):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        local, per, n_true = D.process_epoch_order(order, G, pad_to_full=True)
        assert n_true == 37
        assert len(local) == (-(-37 // G)) * per
    # rank-0 rows of the padded last batch: the 5-row tail wraps to the
    # order's head (37 = 4 full batches + 5; pad = 3)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    local, per, _ = D.process_epoch_order(order, G, pad_to_full=True)
    last_global_rows = np.concatenate([order[32:], order[:3]])
    np.testing.assert_array_equal(local[-per:], last_global_rows[:per])


def test_process_epoch_order_rejects_empty_epoch(monkeypatch):
    """An epoch smaller than one global batch must fail loudly — a silent
    empty order would make the caller train ZERO steps per epoch (NaN epoch
    loss, never-improving early stopping) with no error anywhere."""
    from multimodal_isic_tpu.parallel import distributed as D

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(ValueError, match="one global batch"):
        D.process_epoch_order(np.arange(5), 8)
    # pad_to_full instead wraps the short epoch into one full global batch
    local, per, n_true = D.process_epoch_order(np.arange(5), 8,
                                               pad_to_full=True)
    assert n_true == 5 and per == 4 and len(local) == 4


def test_validate_epoch_trims_wrap_padded_duplicates():
    """Multi-process val loaders wrap-pad the epoch order to full global
    batches; validate_epoch(n_true, group_size) must reproduce the
    single-process statistic exactly, while the untrimmed mean (the bug)
    double-weights the duplicated rows."""
    from multimodal_isic_tpu.train.fusion import cross_entropy, validate_epoch

    rs = np.random.RandomState(0)
    N, C, G = 11, 7, 4
    logits_all = rs.randn(N, C).astype(np.float32) * 3
    targets_all = rs.randint(0, C, N)

    def eval_fn(params, stats, batch):
        lg = jnp.asarray(batch["logits"])
        return cross_entropy(lg, jnp.asarray(batch["target"])), lg

    def batches(order, bs):
        return [{"logits": logits_all[order[k:k + bs]],
                 "target": targets_all[order[k:k + bs]]}
                for k in range(0, len(order), bs)]

    plain = validate_epoch(eval_fn, None, None, batches(np.arange(N), G))
    wrapped = np.concatenate([np.arange(N), np.arange(1)])  # pad 11 -> 12
    trimmed = validate_epoch(eval_fn, None, None, batches(wrapped, G),
                             n_true=N, group_size=G)
    assert trimmed == pytest.approx(plain, rel=1e-6)
    skewed = validate_epoch(eval_fn, None, None, batches(wrapped, G))
    assert skewed != pytest.approx(plain, rel=1e-6)


HPO_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
outdir = sys.argv[4]; engine = sys.argv[5]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["ISIC_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["ISIC_NUM_PROCESSES"] = str(nproc)
os.environ["ISIC_PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
from multimodal_isic_tpu.parallel import distributed as D
assert D.initialize(), "distributed init failed"
import numpy as np
from multimodal_isic_tpu.hpo import ASHAScheduler, MIL_SPACE, run_search
from multimodal_isic_tpu.hpo.population import run_population_search
from multimodal_isic_tpu.train.mil import train_mil

rng = np.random.RandomState(0)  # SAME data on every process
labels = rng.randint(0, 3, 30)
bags = []
for i in range(30):
    b = rng.randn(8, 6).astype(np.float32)
    b[:, labels[i]] += 2.0
    bags.append(b)
data = {"train_feats": bags, "train_labels": labels}

sched = ASHAScheduler(metric="val_bacc", mode="max", grace_period=2,
                      reduction_factor=2, max_t=6)
if engine == "sequential":
    out = run_search(train_mil, MIL_SPACE, data, num_samples=6,
                     max_epochs=6, patience=6, num_classes=3, seed=0,
                     scheduler=sched, output_dir=os.path.join(outdir, "art"))
    results = out["results"]
    ran = [t.trial_id for t in out["trials"] if t.reports]
    print("RAN:", ",".join(ran), flush=True)
    assert set(results.columns) >= {"trial_id", "val_bacc"}
else:
    out = run_population_search(
        {k: MIL_SPACE[k] for k in MIL_SPACE}, data, num_samples=8,
        cohort_size=2, seed=0, max_epochs=4, patience=4, num_classes=3,
        scheduler=sched, verbose=False)
    results = out["results"]
results.to_csv(os.path.join(outdir, f"proc{pid}.csv"), index=False)
vals = results["val_bacc"].astype(float)
assert len(results) == (6 if engine == "sequential" else 8), len(results)
assert vals.notna().all(), "foreign trials missing from the merged table"
print("BEST:", out["best_config"], flush=True)
print("WORKER-DONE", flush=True)
"""


@pytest.mark.slow
@pytest.mark.parametrize("engine", ["sequential", "packed"])
def test_hpo_trials_shard_across_two_processes(tmp_path, engine):
    """The Ray multi-GPU slot (reference tune_mil.py:142-149): trials/cohorts
    round-robin across 2 OS processes with ASHA rungs, the failure budget,
    and the results table shared over jax's coordination service.  Both
    processes must assemble the IDENTICAL full results table (deterministic
    best pick) while executing disjoint slices; only the coordinator writes
    artifacts."""
    port = _free_port()
    script = tmp_path / "hpo_worker.py"
    script.write_text(HPO_WORKER)

    env = {**os.environ,
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", str(port),
         str(tmp_path), engine], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(2)]
    outs = _communicate_all(procs)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        assert "WORKER-DONE" in out

    import pandas as pd
    t0 = pd.read_csv(tmp_path / "proc0.csv")
    t1 = pd.read_csv(tmp_path / "proc1.csv")
    pd.testing.assert_frame_equal(t0, t1)  # identical merged tables

    # identical best config on both processes
    best = [next(l for l in out.splitlines() if l.startswith("BEST:"))
            for out in outs]
    assert best[0] == best[1]

    if engine == "sequential":
        # disjoint execution covering all 6 trials (round-robin sharding)
        ran = [set(next(l for l in out.splitlines()
                        if l.startswith("RAN:"))[4:].strip().split(","))
               for out in outs]
        assert ran[0].isdisjoint(ran[1])
        assert ran[0] | ran[1] == {f"trial_{i:05d}" for i in range(6)}
        # coordinator-only artifacts
        arts = os.listdir(tmp_path / "art")
        assert sum(a.startswith("hpo_results_") for a in arts) == 1
