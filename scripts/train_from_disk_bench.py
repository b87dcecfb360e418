"""End-to-end training throughput FROM DISK: JPEG decode → DeviceLoader →
fused bf16 fusion train step, sustained over epochs on the real chip.

The reference's hot loop is host-preprocessing-bound (its per-sample cv2 +
albumentations work inside ``DermDataset.__getitem__``, reference
``dataset.py:58-96``, feeding ``main.py:141-146``); this script measures
whether THIS build's input pipeline actually feeds the chip at the fused
train step's device rate on the 1-core host, rather than inferring it.

Protocol:
  1. synthesize an on-disk JPEG dataset at real geometry (450×600, same
     encoder settings as ISIC reprocessing) once, reused across runs;
  2. measure the host input pipeline alone (decode+crop+collate, no device);
  3. measure the device train step alone on a resident batch (bench.py's
     number, re-measured here for a same-run comparison);
  4. run ≥3 epochs of [disk → DeviceLoader(prefetch) → augment-on-device →
     fused train step], per-epoch wall closed by a loss readback;
  5. repeat 4 with the decoded-uint8 staging cache (data.pipeline
     ``cache_decoded=True``) — epoch 1 pays decode once, epochs 2+ are
     decode-free, the mitigation for a host that can't decode at chip rate;
  6. upload the dataset ONCE into HBM (``data.pipeline.DeviceDataset``) and
     run epochs as pure device work (gather → augment → step) — the
     mitigation for the tunneled backend's ~25-40 MB/s host→device link,
     which otherwise caps training at the batch-shipping rate.

Writes BENCH_DISK.json at the repo root (bench.py echoes it to stderr) and
prints a human summary.  Run:  python scripts/train_from_disk_bench.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(msg, flush=True)


def build_dataset(root, n_images, seed=0):
    """Synthetic ISIC-geometry JPEGs + manifest (cached across runs)."""
    import pandas as pd
    from multimodal_isic_tpu.data import build_manifests, make_synthetic_isic

    stamp = os.path.join(root, f".done_{n_images}")
    if not os.path.exists(stamp):
        t0 = time.time()
        make_synthetic_isic(root, n_train=n_images, n_test=8,
                            image_hw=(450, 600), seed=seed)
        open(stamp, "w").write("ok")
        log(f"dataset: wrote {n_images} JPEGs in {time.time() - t0:.0f}s")
    dirs = {
        "csv": os.path.join(root, "train", "metadata.csv"),
        "img": os.path.join(root, "train", "images"),
        "seg": os.path.join(root, "train", "segmentations"),
        "csv_test": os.path.join(root, "test", "metadata.csv"),
        "img_test": os.path.join(root, "test", "images"),
        "seg_test": os.path.join(root, "test", "segmentations"),
    }
    df_train, _, _ = build_manifests(
        pd.read_csv(dirs["csv"]), pd.read_csv(dirs["csv_test"]),
        dirs["img"], dirs["seg"], dirs["img_test"], dirs["seg_test"])
    sizes = [os.path.getsize(p) for p in df_train["image_path"][:64]]
    log(f"dataset: {len(df_train)} train images, mean JPEG {np.mean(sizes) / 1024:.0f} KB")
    return df_train


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--data-dir", default="/tmp/disk_bench_data")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_DISK.json"))
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from multimodal_isic_tpu.core.rng import RngPool
    from multimodal_isic_tpu.core.train_state import TrainState
    from multimodal_isic_tpu.data import DermRecords, DeviceLoader, augment
    from multimodal_isic_tpu.models.fusion import MultiModalFusionNet
    from multimodal_isic_tpu.train.fusion import (
        fusion_optimizer, init_fusion, make_fusion_train_step)

    df_train = build_dataset(args.data_dir, args.n_images)
    dev = jax.devices()[0]
    log(f"device: {dev}")
    result = {"n_images": args.n_images, "batch": args.batch,
              "epochs": args.epochs, "device": str(dev)}

    # ---- stage A: host input pipeline alone (no device work) ----
    records = DermRecords(df_train, staging_hw=(450, 450))
    log(f"native decode: {records.use_native}")
    loader_host = DeviceLoader(records, args.batch, drop_last=True)
    n_epoch = (args.n_images // args.batch) * args.batch
    t0 = time.time()
    seen = 0
    for b in loader_host._host_batches():
        seen += b["image"].shape[0]
    host_rate = seen / (time.time() - t0)
    result["host_decode_img_per_s"] = round(host_rate, 1)
    log(f"A. host pipeline alone (decode+crop+collate): {host_rate:.1f} img/s")

    # ---- stage B: device train step alone on a resident batch ----
    model = MultiModalFusionNet(dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    init_batch = {
        "image": np.zeros((2, 380, 380, 3), np.float32),
        "radiomics": rng.randn(2, 102).astype(np.float32),
        "age": rng.randn(2).astype(np.float32),
        "sex": rng.randint(0, 3, 2).astype(np.int32),
        "loc": rng.randint(0, 15, 2).astype(np.int32),
        "artifacts": rng.randint(0, 2, (2, 6)).astype(np.int32),
        "target": rng.randint(0, 7, 2).astype(np.int32),
    }
    with jax.default_device(jax.devices("cpu")[0]):
        params, batch_stats = init_fusion(model, jax.random.PRNGKey(0),
                                          init_batch)
    put = lambda t: jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), t)
    params, batch_stats = put(params), put(batch_stats)
    opt = fusion_optimizer()
    step = make_fusion_train_step(model, opt)
    resident = put({
        "image": rng.rand(args.batch, 380, 380, 3).astype(np.float32),
        "radiomics": rng.randn(args.batch, 102).astype(np.float32),
        "age": rng.randn(args.batch).astype(np.float32),
        "sex": rng.randint(0, 3, args.batch).astype(np.int32),
        "loc": rng.randint(0, 15, args.batch).astype(np.int32),
        "artifacts": rng.randint(0, 2, (args.batch, 6)).astype(np.int32),
        "target": rng.randint(0, 7, args.batch).astype(np.int32),
    })
    state = TrainState.create(params, opt, jax.random.PRNGKey(1))
    t0 = time.time()
    s, bs, loss, _ = step(state, batch_stats, resident, jax.random.PRNGKey(2))
    _ = float(loss)
    log(f"B. train step compiled in {time.time() - t0:.0f}s")
    iters = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        s, bs = state, batch_stats
        for _ in range(iters):
            s, bs, loss, _ = step(s, bs, resident, jax.random.PRNGKey(3))
        _ = float(loss)
        best = min(best, (time.time() - t0) / iters)
    dev_rate = args.batch / best
    result["device_step_img_per_s"] = round(dev_rate, 1)
    log(f"B. device train step alone: {dev_rate:.1f} img/s "
        f"({best * 1000:.1f} ms/step)")

    # ---- stages C/D: end-to-end epochs, without and with the cache ----
    pool = RngPool(0)
    transform = augment.POLICIES["fusion_train"]

    def run_epochs(tag, cache):
        recs = DermRecords(df_train, staging_hw=(450, 450),
                           cache_decoded=cache)
        order_rng = np.random.RandomState(0)
        epoch_s = []
        st, stats = state, batch_stats
        for epoch in range(args.epochs):
            order = order_rng.permutation(len(recs))
            loader = DeviceLoader(recs, args.batch, order=order,
                                  transform=transform,
                                  rng_stream=pool["augment"],
                                  drop_last=True, prefetch=4)
            t0 = time.time()
            loss = None
            for batch in loader:
                batch.pop("mask", None)
                st, stats, loss, _ = step(st, stats, batch,
                                          pool["dropout"].next())
            _ = float(loss)  # close the epoch's device chain
            dt = time.time() - t0
            epoch_s.append(dt)
            log(f"{tag} epoch {epoch}: {dt:.1f}s = {n_epoch / dt:.1f} img/s")
        return epoch_s

    log("C. end-to-end, NO cache (every epoch decodes from disk):")
    no_cache = run_epochs("C.", cache=False)
    log("D. end-to-end, decoded-uint8 staging cache (epoch 1 decodes once):")
    cached = run_epochs("D.", cache=True)

    # ---- stage E: HBM-resident dataset, epochs as pure device work ----
    from multimodal_isic_tpu.data import DeviceDataset
    recs = DermRecords(df_train, staging_hw=(450, 450))
    t0 = time.time()
    dset = DeviceDataset(recs, upload_batch=128)
    _ = float(dset.images[0, 0, 0, 0])  # close the upload
    upload_s = time.time() - t0
    log(f"E. one-time HBM upload of {args.n_images} staging crops: "
        f"{upload_s:.1f}s ({dset.images.nbytes / 1e9:.2f} GB images)")
    order_rng = np.random.RandomState(0)
    device_epochs = []
    st, stats = state, batch_stats
    for epoch in range(args.epochs):
        order = order_rng.permutation(len(recs))
        t0 = time.time()
        loss = None
        for batch in dset.loader(args.batch, order=order, transform=transform,
                                 rng_stream=pool["augment"], drop_last=True):
            batch.pop("mask", None)
            st, stats, loss, _ = step(st, stats, batch, pool["dropout"].next())
        _ = float(loss)
        dt = time.time() - t0
        device_epochs.append(dt)
        log(f"E. epoch {epoch}: {dt:.1f}s = {n_epoch / dt:.1f} img/s")

    # ---- stage F: HBM-resident + FUSED epoch (one scanned program) --------
    from multimodal_isic_tpu.train.fusion import make_fusion_train_epoch
    epoch_fn = make_fusion_train_epoch(model, opt, transform=transform)
    order_rng = np.random.RandomState(0)
    fused_epochs = []
    st, stats = state, batch_stats
    key = jax.random.PRNGKey(11)
    t0 = time.time()
    order = dset.epoch_order(args.batch, order=order_rng.permutation(len(recs)))
    st, stats, loss, _ = epoch_fn(st, stats, dset.images, dset.masks,
                                  dset.meta, jnp.asarray(order), key)
    _ = float(loss)
    log(f"F. fused epoch compiled+ran in {time.time() - t0:.0f}s")
    for epoch in range(args.epochs):
        order = dset.epoch_order(args.batch,
                                 order=order_rng.permutation(len(recs)))
        key, sub = jax.random.split(key)
        t0 = time.time()
        st, stats, loss, _ = epoch_fn(st, stats, dset.images, dset.masks,
                                      dset.meta, jnp.asarray(order), sub)
        _ = float(loss)  # close the epoch's device chain
        dt = time.time() - t0
        fused_epochs.append(dt)
        log(f"F. epoch {epoch}: {dt:.1f}s = {n_epoch / dt:.1f} img/s")

    # ---- stage G: fused epoch + gather-free Pallas augment ---------------
    # same scanned program with augment.POLICIES['fusion_train_fast'] (batch
    # MXU resize + ops.pallas_warp SSR; r5 warp_ab.py measured the packed
    # take at 447 ms/batch — the gap between stages E/F and the bare step)
    epoch_fast = make_fusion_train_epoch(
        model, opt, transform=augment.POLICIES["fusion_train_fast"])
    fastg_epochs = []
    stg, statsg = state, batch_stats
    keyg = jax.random.PRNGKey(11)
    t0 = time.time()
    order = dset.epoch_order(args.batch, order=order_rng.permutation(len(recs)))
    stg, statsg, loss_g, _ = epoch_fast(stg, statsg, dset.images, dset.masks,
                                        dset.meta, jnp.asarray(order), keyg)
    _ = float(loss_g)
    log(f"G. fast-augment fused epoch compiled+ran in {time.time() - t0:.0f}s")
    for epoch in range(args.epochs):
        order = dset.epoch_order(args.batch,
                                 order=order_rng.permutation(len(recs)))
        keyg, sub = jax.random.split(keyg)
        t0 = time.time()
        stg, statsg, loss_g, _ = epoch_fast(stg, statsg, dset.images,
                                            dset.masks, dset.meta,
                                            jnp.asarray(order), sub)
        _ = float(loss_g)
        dt = time.time() - t0
        fastg_epochs.append(dt)
        log(f"G. epoch {epoch}: {dt:.1f}s = {n_epoch / dt:.1f} img/s "
            f"(loss {float(loss_g):.4f})")

    steady_nc = min(no_cache[1:]) if len(no_cache) > 1 else no_cache[0]
    steady_c = min(cached[1:]) if len(cached) > 1 else cached[0]
    steady_d = (min(device_epochs[1:]) if len(device_epochs) > 1
                else device_epochs[0])
    steady_f = min(fused_epochs)
    result.update({
        "e2e_fused_epoch_s": [round(x, 1) for x in fused_epochs],
        "e2e_fused_img_per_s": round(n_epoch / steady_f, 1),
        "e2e_fast_augment_epoch_s": [round(x, 1) for x in fastg_epochs],
        "e2e_fast_augment_img_per_s": round(n_epoch / min(fastg_epochs), 1),
    })
    result.update({
        "e2e_nocache_epoch_s": [round(x, 1) for x in no_cache],
        "e2e_cache_epoch_s": [round(x, 1) for x in cached],
        "e2e_device_resident_epoch_s": [round(x, 1) for x in device_epochs],
        "hbm_upload_s": round(upload_s, 1),
        "e2e_nocache_img_per_s": round(n_epoch / steady_nc, 1),
        "e2e_cache_img_per_s": round(n_epoch / steady_c, 1),
        "e2e_device_resident_img_per_s": round(n_epoch / steady_d, 1),
    })
    bottleneck = ("host-decode" if host_rate < dev_rate * 0.9 else "device")
    result["bottleneck_nocache"] = bottleneck
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    log(json.dumps(result))
    log(f"SUMMARY: host decode {host_rate:.0f} img/s vs device step "
        f"{dev_rate:.0f} img/s → uncached bottleneck = {bottleneck}; "
        f"steady-state {n_epoch / steady_nc:.0f} img/s uncached → "
        f"{n_epoch / steady_c:.0f} img/s with the staging cache → "
        f"{n_epoch / steady_d:.0f} img/s HBM-resident → "
        f"{n_epoch / steady_f:.0f} img/s HBM-resident fused epoch")


if __name__ == "__main__":
    main()
