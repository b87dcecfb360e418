"""Packed-cohort vs sequential search QUALITY at equal trial budget.

Packing samples shape keys once per cohort, so a 64-trial packed search
explores 64/cohort_size architectures where the sequential runner explores
64 — the documented trade (``hpo/population.py``).  This study measures what
that costs in best-found-config quality: same space, same data, same seed
budget, classic-MIL; repeated over seeds.

    JAX_PLATFORMS=cpu python scripts/pack_quality_study.py

(The effect, not the wall-clock, is the object here — wall-clock wins for
packing are measured separately in tests/test_hpo.py.)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# the container's sitecustomize imports jax before user code, so the env var
# alone can't pick the platform — and merely PROBING the default backend
# would initialize (and exclusively grab) the TPU.  Pin cpu before any
# backend touch (same pattern as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

from multimodal_isic_tpu.hpo import MIL_SPACE, run_search  # noqa: E402
from multimodal_isic_tpu.hpo.population import run_population_search  # noqa: E402
from multimodal_isic_tpu.train.mil import train_mil  # noqa: E402


def make_bags(seed, n=96, patches=12, dim=16, n_classes=4, signal=0.14):
    """Deliberately HARD bags (weak signal in a small fraction of patches):
    at a saturating difficulty every config reaches bacc 1.0 and the study
    measures nothing."""
    rs = np.random.RandomState(seed)
    dirs = rs.randn(n_classes, dim).astype(np.float32)
    labels = rs.randint(0, n_classes, n)
    feats = []
    for i in range(n):
        f = rs.randn(patches, dim).astype(np.float32)
        hot = rs.rand(patches) < 0.35  # signal only in ~a third of patches
        f[hot] += signal * dirs[labels[i]]
        feats.append(f)
    return {"train_feats": feats, "train_labels": labels.tolist(),
            "test_feats": [], "test_labels": []}


BUDGET = 64
rows = []
for seed in (0, 1, 2):
    data = make_bags(seed)
    t0 = time.time()
    seq = run_search(train_mil, MIL_SPACE, data, num_samples=BUDGET,
                     seed=seed, max_epochs=12, patience=4, num_classes=3,
                     verbose=False)
    seq_s = time.time() - t0
    t0 = time.time()
    packed = run_population_search(MIL_SPACE, data, num_samples=BUDGET,
                                   cohort_size=8, seed=seed, max_epochs=12,
                                   patience=4, num_classes=3, verbose=False)
    packed_s = time.time() - t0
    sb = float(seq["results"]["val_bacc"].max())
    pb = float(packed["results"]["val_bacc"].max())
    rows.append({"seed": seed, "seq_best": round(sb, 4),
                 "packed_best": round(pb, 4),
                 "seq_s": round(seq_s, 1), "packed_s": round(packed_s, 1)})
    print(rows[-1], flush=True)

d = np.array([r["seq_best"] - r["packed_best"] for r in rows])
print("RESULT " + json.dumps({
    "budget": BUDGET, "cohort_size": 8, "seeds": len(rows), "rows": rows,
    "mean_quality_gap_seq_minus_packed": round(float(d.mean()), 4),
    "mean_speedup": round(float(np.mean(
        [r["seq_s"] / r["packed_s"] for r in rows])), 2),
}), flush=True)
