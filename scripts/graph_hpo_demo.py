"""Packed graph-MIL ASHA search ON THE REAL CHIP at production geometry.

The reference's flagship workload is a 1000-sample Ray/ASHA search over the
19-dim graph-MIL space with 4 torch trials packed per GPU
(``/root/reference/tune_mil.py:170-200,243-257``, ``:33``).  This demo runs
the TPU-native packed form at the same per-trial geometry — 196-patch ×
768-d patient bags, cohorts of 8 vmapped trials, ASHA grace 10 / reduction
factor 2 — and records:

  - cold wall-clock (first run; includes per-cohort-architecture compiles)
    and warm wall-clock (persistent compile cache), s/trial;
  - ASHA early-stop count;
  - a bit-match spot-check: cohort 0's first member re-trained through the
    sequential ``train_graph_mil`` with the same config/seed reproduces the
    packed trial's val metrics (dropouts forced to 0 for the check cohort so
    RNG-stream differences cannot enter).

    python scripts/graph_hpo_demo.py [--num-samples 32] [--max-epochs 50]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_bags(n_patients=60, patches=196, dim=768, n_classes=7, seed=0):
    """Synthetic patient bags at the reference's latent geometry: class
    signal lives in a per-class mean direction + patch noise."""
    rs = np.random.RandomState(seed)
    dirs = rs.randn(n_classes, dim).astype(np.float32)
    labels = rs.randint(0, n_classes, n_patients)
    feats = [
        (0.5 * dirs[labels[i]] + rs.randn(patches, dim)).astype(np.float32)
        for i in range(n_patients)
    ]
    n_tr = int(0.8 * n_patients)
    return {
        "train_feats": feats[:n_tr], "train_labels": labels[:n_tr].tolist(),
        "test_feats": feats[n_tr:], "test_labels": labels[n_tr:].tolist(),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-samples", type=int, default=32)
    ap.add_argument("--cohort-size", type=int, default=8)
    ap.add_argument("--max-epochs", type=int, default=50)
    ap.add_argument("--patience", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_GRAPH_HPO.json"))
    ap.add_argument("--stages", default="cold,warm,spot",
                    help="comma subset of cold,warm,spot — each stage merges "
                         "its fields into --out, so a crashed or re-run stage "
                         "never repeats the ~30 min searches")
    args = ap.parse_args(argv)
    stages = set(args.stages.split(","))
    result = {}
    if os.path.exists(args.out):
        result = json.load(open(args.out))

    import jax
    if os.environ.get("DEMO_PLATFORM"):  # e.g. cpu for smoke runs — the
        # sitecustomize pre-imports jax, so plain JAX_PLATFORMS can't stick
        jax.config.update("jax_platforms", os.environ["DEMO_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multimodal_isic_tpu.hpo import ASHAScheduler, GRAPH_MIL_SPACE
    from multimodal_isic_tpu.hpo.population import run_population_search
    from multimodal_isic_tpu.train.mil import train_graph_mil

    print(f"devices: {jax.devices()}", flush=True)
    data = make_bags()

    def search():
        sched = ASHAScheduler(metric="val_bacc", mode="max", grace_period=10,
                              reduction_factor=2, max_t=args.max_epochs)
        t0 = time.time()
        out = run_population_search(
            GRAPH_MIL_SPACE, data, num_samples=args.num_samples,
            cohort_size=args.cohort_size, seed=42,
            max_epochs=args.max_epochs, patience=args.patience,
            scheduler=sched, model_type="graph-mil", verbose=True)
        return out, time.time() - t0

    def save():
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)

    if "cold" in stages:
        out, cold_s = search()
        frame = out["results"]
        stopped = int(frame["stopped_early"].sum())
        print(f"COLD: {cold_s:.1f}s for {len(frame)} trials "
              f"({cold_s / len(frame):.1f} s/trial), {stopped} ASHA-stopped, "
              f"best val_bacc={frame['val_bacc'].max():.4f}", flush=True)
        result.update({
            "num_samples": int(len(frame)), "cohort_size": args.cohort_size,
            "bag_geometry": "60 patients x 196 patches x 768 dims",
            "grace_period": 10, "reduction_factor": 2,
            "max_epochs": args.max_epochs,
            "cold_wall_s": round(cold_s, 1),
            "cold_s_per_trial": round(cold_s / len(frame), 2),
            "asha_stopped": stopped,
            "best_val_bacc": float(frame["val_bacc"].max()),
        })
        save()

    if "warm" in stages:
        out2, warm_s = search()
        frame2 = out2["results"]
        print(f"WARM: {warm_s:.1f}s ({warm_s / len(frame2):.1f} s/trial)",
              flush=True)
        result.update({"warm_wall_s": round(warm_s, 1),
                       "warm_s_per_trial": round(warm_s / len(frame2), 2)})
        if "cold" in stages:
            # same seed, same cache: the search must reproduce bit-identically
            same = (frame["val_bacc"].values == frame2["val_bacc"].values).all()
            print(f"trial tables identical: {bool(same)}", flush=True)
            result["warm_rerun_identical"] = bool(same)
        save()

    if "spot" in stages:
        # ---- spot check vs the sequential trainer -------------------------
        # reproduce cohort 0's member 0 exactly as run_population_search
        # sampled it, but with dropouts zeroed so the packed/sequential RNG
        # streams match
        from multimodal_isic_tpu.hpo.population import (
            GRAPH_POP_KEYS, GRAPH_SHAPE_KEYS, train_graph_mil_population)
        from multimodal_isic_tpu.hpo.space import sample_config

        rng = np.random.RandomState(7)
        cfgs = [sample_config(GRAPH_MIL_SPACE, rng) for _ in range(2)]
        shape_cfg = {k: cfgs[0][k] for k in GRAPH_SHAPE_KEYS}
        pop = {k: np.array([c[k] for c in cfgs]) for k in GRAPH_POP_KEYS}
        pop["gnn_dropout"][:] = 0.0
        pop["pool_dropout"][:] = 0.0
        t0 = time.time()
        packed = train_graph_mil_population(
            shape_cfg, pop, data, seed=0, num_classes=7, patience=8,
            max_epochs=10)
        packed_s = time.time() - t0
        seq_cfg = {**shape_cfg, "lr": float(pop["lr"][0]),
                   "weight_decay": float(pop["weight_decay"][0]),
                   "gnn_dropout": 0.0, "pool_dropout": 0.0}
        t0 = time.time()
        seq = train_graph_mil(seq_cfg, data, seed=0, num_classes=7,
                              patience=8, max_epochs=10)
        seq_s = time.time() - t0
        d_bacc = abs(packed[0]["val_bacc"] - seq["val_bacc"])
        d_loss = abs(packed[0]["val_loss"] - seq["val_loss"])
        print(f"spot-check packed-vs-sequential: |d bacc|={d_bacc:.2e} "
              f"|d loss|={d_loss:.2e} (packed 2-cohort {packed_s:.0f}s, "
              f"sequential single {seq_s:.0f}s)", flush=True)
        # CPU runs bit-match (tests/test_hpo.py); on TPU the vmapped-cohort
        # and standalone programs compile to different fusions, so the CE
        # loss agrees to float noise (measured 3.6e-4 on ~1.9), bacc exactly
        assert d_bacc < 1e-5 and d_loss < 1e-3 * max(abs(seq["val_loss"]), 1)
        result.update({"spot_check_dbacc": float(d_bacc),
                       "spot_check_dloss": float(d_loss)})
        save()

    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
