"""Benchmark: ISIC images/sec/chip for device preprocessing + fused
multimodal forward (the BASELINE.json headline metric).

Measures, on the real chip:
  - value: throughput of [uint8 450×450 crops → on-device resize(380) +
    ImageNet normalize → full 4-modality fusion forward (EfficientNet-B3,
    bf16 backbone)] as one jitted program, steady state, at the best batch
    size from the round-2 sweep (512).
  - baseline: the reference-equivalent CPU path measured live — host
    preprocessing (cv2 resize + normalize, as albumentations does) + torch
    EfficientNet-B3-based fusion forward on CPU (efficientnet_pytorch is not
    installable here; utils/torch_ref.py is architecture-identical).
  - stderr extras: bf16 TRAINING throughput (fwd+bwd+SGD+BN) for the fusion
    flagship and estimated MFU from XLA's cost analysis — the round-2 "bf16
    train measured" requirement.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing method (axon backend): block_until_ready returns at DISPATCH, so a
chain of iterations is closed by ONE device→host readback; params/state live
on the device (a CPU-committed pytree silently re-uploads ~50 MB per call).
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _host_batch(batch_size, rng, with_target=False):
    out = {
        "image": rng.randint(0, 255, (batch_size, 450, 450, 3), np.uint8),
        "radiomics": rng.randn(batch_size, 780).astype(np.float32),
        "age": rng.randn(batch_size).astype(np.float32),
        "sex": rng.randint(0, 3, batch_size).astype(np.int32),
        "loc": rng.randint(0, 15, batch_size).astype(np.int32),
        "artifacts": rng.randint(0, 2, (batch_size, 6)).astype(np.int32),
    }
    if with_target:
        out["target"] = rng.randint(0, 7, batch_size).astype(np.int32)
    return out


def _flops(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


PEAK_BF16 = 197e12  # TPU v5e


def measure_tpu(batch_size=512, iters=10, train_batch=128, train_iters=10):
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from multimodal_isic_tpu.core.train_state import TrainState
    from multimodal_isic_tpu.data import augment
    from multimodal_isic_tpu.models.fusion import MultiModalFusionNet
    from multimodal_isic_tpu.train.fusion import (
        BATCH_KEYS, fusion_optimizer, init_fusion, make_fusion_train_step)

    dev = jax.devices()[0]
    put = lambda t: jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), t)

    # bf16 backbone compute (fp32 params, fp32 branch MLPs/heads)
    model = MultiModalFusionNet(dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    init_batch = _host_batch(2, rng)
    init_batch["image"] = np.zeros((2, 380, 380, 3), np.float32)
    # init on the host backend (compiling flax init through the TPU
    # remote-compile path costs minutes), then commit the params to the chip
    with jax.default_device(jax.devices("cpu")[0]):
        params, batch_stats = init_fusion(model, jax.random.PRNGKey(0), init_batch)
    params, batch_stats = put(params), put(batch_stats)

    def make_forward(mdl, with_stats):
        """uint8 crops → device MXU resize(380)+normalize (bf16, matching
        the backbone compute dtype; see augment.resize_bilinear_mxu — the
        gather-path resize cost 11.6 ms of the 158 ms serving step) → eval
        forward; one definition serves the standard and BN-folded graphs."""
        @jax.jit
        def fwd(params, batch_stats, batch):
            img = augment.preprocess_eval_batch(batch["image"], (380, 380),
                                                dtype=jnp.bfloat16)
            variables = {"params": params}
            if with_stats:
                variables["batch_stats"] = batch_stats
            inputs = {k: batch[k] for k in BATCH_KEYS if k in batch}
            inputs["image"] = img
            return mdl.apply(variables, **inputs, train=False)
        return fwd

    preproc_and_forward = make_forward(model, with_stats=True)

    dev_batch = put(_host_batch(batch_size, rng))
    fwd_flops = _flops(preproc_and_forward, params, batch_stats, dev_batch)
    out = preproc_and_forward(params, batch_stats, dev_batch)
    _ = float(out.sum())  # force real completion
    log("tpu: forward compiled")

    def time_chain(fn, *args, reps=4):
        """≥3 timed chains (rep 0 may absorb a one-time relayout recompile);
        → (min, median, all) per-iteration seconds so the artifact carries
        spread, not a single point — shared-host noise vs build regression."""
        times = []
        for _ in range(reps):
            t0 = time.time()
            acc = None
            for _ in range(iters):
                out = fn(*args)
                acc = out if acc is None else acc + out
            _ = float(acc.sum())  # single readback closes the chain
            times.append((time.time() - t0) / iters)
        return min(times), float(np.median(times)), times

    def spread(name, bs, tmin, tmed, times):
        log(f"tpu: {name} spread over {len(times)} chains: "
            f"min {bs / tmin:.1f} img/s, median {bs / tmed:.1f} img/s, all "
            f"[{', '.join(f'{bs / t:.1f}' for t in times)}]")

    best, med, ts = time_chain(preproc_and_forward, params, batch_stats,
                               dev_batch)
    ips = batch_size / best
    log(f"tpu: fusion fwd bf16 bs={batch_size}: {ips:.1f} img/s/chip "
        f"({best * 1000:.1f} ms) MFU~{fwd_flops / best / PEAK_BF16 * 100:.1f}%")
    spread("fwd", batch_size, best, med, ts)

    # ---- BN-FOLDED serving forward: same outputs, no BatchNorm ops ----
    from multimodal_isic_tpu.models.fusion import fold_fusion_params
    folded_model = MultiModalFusionNet(dtype=jnp.bfloat16,
                                       backbone_bn_folded=True)
    folded_params = put(fold_fusion_params(jax.device_get(params),
                                           jax.device_get(batch_stats)))

    folded_forward = make_forward(folded_model, with_stats=False)

    try:
        out_f = folded_forward(folded_params, {}, dev_batch)
        np.testing.assert_allclose(  # folding must not change predictions
            np.asarray(out_f), np.asarray(out), rtol=0.1, atol=0.15)
        log("tpu: folded forward compiled")
        best_f, med_f, ts_f = time_chain(folded_forward, folded_params, {},
                                         dev_batch)
        ips_f = batch_size / best_f
        log(f"tpu: fusion fwd bf16 FOLDED bs={batch_size}: {ips_f:.1f} "
            f"img/s/chip ({best_f * 1000:.1f} ms)")
        spread("folded", batch_size, best_f, med_f, ts_f)
        if ips_f > ips:
            log("tpu: headline = BN-folded serving graph")
            ips = ips_f
    except Exception as e:  # headline falls back to the standard graph
        log(f"tpu: folded forward skipped ({type(e).__name__}: {e})")

    # ---- bf16 TRAINING step (fwd+bwd+SGD+BatchNorm), the r2 requirement ----
    opt = fusion_optimizer()
    step = make_fusion_train_step(model, opt)
    tb = _host_batch(train_batch, rng, with_target=True)
    tb["image"] = (tb["image"][:, :380, :380].astype(np.float32) / 255.0)
    tb = put(tb)
    state = TrainState.create(params, opt, jax.random.PRNGKey(1))
    state, batch_stats2, loss, _ = step(state, batch_stats, tb,
                                        jax.random.PRNGKey(2))
    _ = float(loss)
    log("tpu: train step compiled")
    train_flops = _flops(step, state, batch_stats, tb, jax.random.PRNGKey(2))
    tr_times = []
    for _ in range(4):  # rep 0 may absorb a one-time relayout recompile
        t0 = time.time()
        s, bs2 = state, batch_stats2
        for _ in range(train_iters):
            s, bs2, loss, _ = step(s, bs2, tb, jax.random.PRNGKey(3))
        _ = float(loss)
        tr_times.append((time.time() - t0) / train_iters)
    best_tr, med_tr = min(tr_times), float(np.median(tr_times))
    log(f"tpu: fusion TRAIN bf16 bs={train_batch}: {train_batch / best_tr:.1f} "
        f"img/s/chip ({best_tr * 1000:.1f} ms/step) "
        f"MFU~{train_flops / best_tr / PEAK_BF16 * 100:.1f}%")
    spread("train", train_batch, best_tr, med_tr, tr_times)
    return ips


def measure_reference_cpu(batch_size=4, iters=3):
    """Reference-equivalent CPU throughput: cv2 preproc + torch B3 fusion fwd."""
    import cv2
    import torch
    import torch.nn as nn
    from multimodal_isic_tpu.utils.torch_ref import build_torch_efficientnet

    torch.set_num_threads(max(1, torch.get_num_threads()))
    backbone = build_torch_efficientnet("efficientnet-b3", num_classes=None)
    proj = nn.Sequential(nn.Linear(1536, 256), nn.LayerNorm(256), nn.ReLU(),
                         nn.Linear(256, 128), nn.LayerNorm(128), nn.ReLU())
    rad = nn.Sequential(nn.Linear(780, 256), nn.LayerNorm(256), nn.ReLU(),
                        nn.Linear(256, 128), nn.LayerNorm(128), nn.ReLU())
    fuse = nn.Sequential(nn.Linear(256, 256), nn.ReLU(), nn.Linear(256, 7))
    backbone.eval()

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (batch_size, 450, 450, 3), np.uint8)
    radiomics = torch.randn(batch_size, 780)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def run_once():
        proc = []
        for im in imgs:  # albumentations-style per-sample host preproc
            r = cv2.resize(im, (380, 380), interpolation=cv2.INTER_LINEAR)
            proc.append(((r / 255.0).astype(np.float32) - mean) / std)
        x = torch.tensor(np.stack(proc).transpose(0, 3, 1, 2))
        with torch.no_grad():
            feats = proj(backbone(x))
            logits = fuse(torch.cat([feats, rad(radiomics)], dim=1))
        return logits

    run_once()  # warm up
    times = []
    for _ in range(iters):
        t0 = time.time()
        run_once()
        times.append(time.time() - t0)
    dt = min(times)  # min-of-N: shared-host contention can't deflate the baseline
    ips = batch_size / dt
    log(f"reference cpu: {ips:.2f} img/s ({dt * 1000:.0f} ms / {batch_size} imgs; "
        f"all [{', '.join(f'{batch_size / t:.2f}' for t in times)}])")
    return ips


def main():
    import os
    disk_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_DISK.json")
    if os.path.exists(disk_json):
        # recorded by scripts/train_from_disk_bench.py (real TPU, JPEGs at
        # ISIC geometry): the [disk -> DeviceLoader -> fused train step]
        # number the headline metric does not cover
        d = json.load(open(disk_json))
        log("disk-train (recorded): "
            f"{d.get('e2e_nocache_img_per_s')} img/s streaming, "
            f"{d.get('e2e_cache_img_per_s')} img/s decoded-cache, "
            f"{d.get('e2e_device_resident_img_per_s')} img/s HBM-resident, "
            f"{d.get('e2e_fused_img_per_s')} img/s fused-epoch "
            f"(host decode alone {d.get('host_decode_img_per_s')}, device "
            f"step alone {d.get('device_step_img_per_s')} img/s; "
            f"n={d.get('n_images')} bs={d.get('batch')})")
    tpu_ips = measure_tpu()
    ref_ips = measure_reference_cpu()
    print(json.dumps({
        "metric": "ISIC images/sec/chip (device preproc + fused multimodal forward)",
        "value": round(tpu_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(tpu_ips / ref_ips, 2),
    }))


if __name__ == "__main__":
    main()
