"""Input pipeline: host decode → device prefetch → on-device transform.

The reference's per-sample CPU path (cv2 decode + centroid crop +
albumentations per item inside ``DermDataset.__getitem__`` → default
DataLoader collation, ``dataset.py:21-56``) is its throughput bottleneck
(SURVEY.md §3.1).  Here the host does only what must touch bytes on disk —
JPEG decode and the centroid crop (pure slicing) — while resize, augmentation
and normalization run batched on device under one jit; batches are shipped to
HBM ahead of compute by a background prefetch thread.

Per-sample record contract matches the reference dict: image, mask, radiomics,
age, sex, loc, artifacts, target (+ paths kept host-side).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np

from .crop import centroid_crop
from .manifest import ARTIFACT_COLS

RADIOMICS_PLACEHOLDER_DIM = 102  # reference stub at dataset.py:42


class DermRecords:
    """Host-side record reader: decode + centroid-crop, no augmentation.

    ``staging_hw`` fixes the host output size so device batches have static
    shapes: crops whose ``min(H, W)`` differs from it are resized on host
    (cv2.INTER_LINEAR) — a no-op for the dominant 450×600 ISIC shape when
    ``staging_hw == (450, 450)``.
    """

    def __init__(self, df, radiomics=None, staging_hw=(450, 450),
                 use_native: Optional[bool] = None, with_image: bool = True,
                 cache_decoded: bool = False):
        import cv2  # local: host-only dependency
        self._cv2 = cv2
        self.df = df.reset_index(drop=True)
        # cache_decoded=True keeps each decoded+cropped uint8 staging image
        # (and mask) in host RAM after its first read, so epochs 2+ skip
        # JPEG decode entirely — the mitigation for a 1-core host that
        # cannot decode at the chip's training rate (the reference re-decodes
        # every epoch, dataset.py:58-96).  450×450×3 uint8 ≈ 0.6 MB/image:
        # the full HAM10000 train split is ~6 GB of the 125 GB host.
        self._cache: Optional[dict] = {} if cache_decoded else None
        # with_image=False = metadata-only records: no decode, no image/mask
        # keys.  The reference decodes + augments every sample regardless of
        # the modality subset (dataset.py:21-56); skipping that work for
        # image-less fusion configs turns the epoch from decode+warp-bound
        # (~2 s/batch on one core) into pure tabular streaming.
        self.with_image = with_image
        self.radiomics = None
        if radiomics is not None:
            self.radiomics = np.asarray(radiomics, dtype=np.float32)
            if len(self.radiomics) != len(self.df):
                raise ValueError("radiomics rows must align with manifest rows")
        self.staging_hw = staging_hw
        if use_native is None:  # auto: use the C++ worker when built
            from . import native_io
            use_native = native_io.available()
        self.use_native = use_native

    def __len__(self):
        return len(self.df)

    def read_image_mask(self, idx: int):
        import os
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        if self.use_native:
            from . import native_io
            row = self.df.iloc[idx]
            out = native_io.decode_crop(
                row["image_path"], str(row["segmentation_path"]),
                self.staging_hw)
            if self._cache is not None:
                self._cache[idx] = out
            return out
        cv2 = self._cv2
        row = self.df.iloc[idx]
        bgr = cv2.imread(row["image_path"])
        if bgr is None:
            raise FileNotFoundError(row["image_path"])
        image = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        mask_path = row["segmentation_path"]
        if mask_path == "no_mask" or not os.path.exists(str(mask_path)):
            mask = None
        else:
            mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        image, mask = centroid_crop(image, mask)  # min(H, W) square
        if image.shape[:2] != self.staging_hw:
            image = cv2.resize(image, self.staging_hw[::-1], interpolation=cv2.INTER_LINEAR)
            mask = cv2.resize(mask, self.staging_hw[::-1], interpolation=cv2.INTER_NEAREST)
        if self._cache is not None:
            self._cache[idx] = (image, mask)
        return image, mask

    def metadata(self, idx: int) -> Dict[str, np.ndarray]:
        """The non-image fields of a record (no decode)."""
        row = self.df.iloc[idx]
        if self.radiomics is not None:
            radiomics = self.radiomics[idx]
        else:
            radiomics = np.zeros(RADIOMICS_PLACEHOLDER_DIM, np.float32)
        has_art = all(c in row.index for c in ARTIFACT_COLS)
        return {
            "radiomics": radiomics,
            "age": np.float32(row.get("age_normalized", 0.0)),
            "sex": np.int32(row.get("sex_encoded", 0)),
            "loc": np.int32(row.get("loc_encoded", 0)),
            "artifacts": (row[ARTIFACT_COLS].values.astype(np.int32)
                          if has_art else np.zeros(len(ARTIFACT_COLS), np.int32)),
            "target": np.int32(row["dx"]),
        }

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        if not self.with_image:
            return self.metadata(idx)
        row = self.df.iloc[idx]
        image, mask = self.read_image_mask(idx)
        if self.radiomics is not None:
            radiomics = self.radiomics[idx]
        else:
            radiomics = np.zeros(RADIOMICS_PLACEHOLDER_DIM, np.float32)
        has_art = all(c in row.index for c in ARTIFACT_COLS)
        return {
            "image": image,
            "mask": mask,
            "radiomics": radiomics,
            "age": np.float32(row.get("age_normalized", 0.0)),
            "sex": np.int32(row.get("sex_encoded", 0)),
            "loc": np.int32(row.get("loc_encoded", 0)),
            "artifacts": (row[ARTIFACT_COLS].values.astype(np.int32)
                          if has_art else np.zeros(len(ARTIFACT_COLS), np.int32)),
            "target": np.int32(row["dx"]),
        }


def _collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class DeviceDataset:
    """HBM-resident dataset: every staging crop is uploaded ONCE, then each
    epoch gathers its batches and augments entirely on device — zero
    host→device image traffic after warm-up.

    Motivation (r5 measurement): this tunneled TPU backend moves host→device
    data at ~25-40 MB/s, so shipping uint8 450² batches caps training at
    ~30-40 img/s no matter how fast decode and the train step are.  The full
    HAM10000 train split is ~6 GB of staging crops — a fraction of one
    chip's HBM — so the TPU-native design is to stage the dataset in HBM
    (one ~60 s upload) and let epochs be pure device work.  The reference
    re-decodes and re-augments every sample on host every epoch
    (``dataset.py:21-56``).

    Use ``DeviceLoader`` instead when the dataset exceeds HBM.
    """

    def __init__(self, records: DermRecords, upload_batch: int = 256,
                 device=None, with_masks: bool = True):
        """with_masks=False skips staging the lesion masks entirely — the
        fusion train step never consumes them (``train.fusion.BATCH_KEYS``),
        so with a mask-free transform (``augment_fast``) this saves ~25 % of
        the one-time upload and HBM footprint.  Mask-consuming transforms
        (the faithful policies, MAE) need ``with_masks=True``."""
        import jax
        self.records = records
        dev = device or jax.devices()[0]
        img_chunks, mask_chunks = [], []
        helper = DeviceLoader(records, upload_batch)
        for host_batch in helper._host_batches():
            img_chunks.append(jax.device_put(host_batch["image"], dev))
            if with_masks:
                mask_chunks.append(jax.device_put(host_batch["mask"], dev))
        import jax.numpy as jnp
        self.images = jnp.concatenate(img_chunks) if img_chunks else None
        self.masks = jnp.concatenate(mask_chunks) if mask_chunks else None
        meta = _collate([records.metadata(i) for i in range(len(records))])
        self.meta = {k: jax.device_put(v, dev) for k, v in meta.items()}

    def __len__(self):
        return len(self.records)

    def epoch_order(self, batch_size: int,
                    order: Optional[np.ndarray] = None) -> np.ndarray:
        """(n_steps, batch_size) int32 gather indices for the fused-epoch
        path (``train.fusion.make_fusion_train_epoch``); drops the final
        partial batch (the scan needs a static step shape)."""
        order = np.arange(len(self)) if order is None else np.asarray(order)
        n = (len(order) // batch_size) * batch_size
        return order[:n].reshape(-1, batch_size).astype(np.int32)

    def loader(self, batch_size: int, order: Optional[np.ndarray] = None,
               transform: Optional[Callable] = None, rng_stream=None,
               drop_last: bool = False) -> Iterator[Dict]:
        """One epoch of device-resident batches (device gather → transform)."""
        import jax.numpy as jnp
        order = np.arange(len(self)) if order is None else np.asarray(order)
        for start in range(0, len(order), batch_size):
            idx = order[start:start + batch_size]
            if drop_last and len(idx) < batch_size:
                return
            idx_d = jnp.asarray(idx)
            batch = {k: jnp.take(v, idx_d, axis=0)
                     for k, v in self.meta.items()}
            images = jnp.take(self.images, idx_d, axis=0)
            masks = (jnp.take(self.masks, idx_d, axis=0)
                     if self.masks is not None else None)
            if transform is not None:
                if rng_stream is not None:
                    images, masks = transform(images, masks, rng_stream.next())
                else:
                    images, masks = transform(images, masks)
            batch["image"], batch["mask"] = images, masks
            yield batch


class DeviceLoader:
    """Iterates device-resident batches with background host prefetch.

    order        explicit index order per epoch (shuffle / weighted resampling
                 is the caller's policy — see core.splits.weighted_sample_indices).
    transform    jitted batch fn applied on device (e.g. augment.POLICIES),
                 called as transform(images, masks[, key]).
    place        optional fn placing a host batch onto devices (e.g.
                 parallel.shard_batch for a mesh); defaults to device_put.
    """

    def __init__(self, records: DermRecords, batch_size: int,
                 order: Optional[np.ndarray] = None,
                 transform: Optional[Callable] = None,
                 rng_stream=None,
                 place: Optional[Callable] = None,
                 drop_last: bool = False,
                 prefetch: int = 2):
        self.records = records
        self.batch_size = batch_size
        self.order = np.arange(len(records)) if order is None else np.asarray(order)
        self.transform = transform
        self.rng_stream = rng_stream
        self.place = place
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.order)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _host_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        use_native_batch = (getattr(self.records, "use_native", False)
                            and getattr(self.records, "with_image", True))
        for start in range(0, len(self.order), self.batch_size):
            idx = self.order[start:start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            if use_native_batch:
                # metadata without decode + one threaded C call for the
                # whole batch's decode+crop
                from . import native_io
                batch = _collate([self.records.metadata(int(i)) for i in idx])
                cache = self.records._cache
                todo = ([int(i) for i in idx if int(i) not in cache]
                        if cache is not None else [int(i) for i in idx])
                if todo:
                    rows = self.records.df.iloc[todo]
                    images, masks = native_io.decode_crop_batch(
                        rows["image_path"].tolist(),
                        [str(p) for p in rows["segmentation_path"]],
                        self.records.staging_hw)
                    if cache is not None:
                        for pos, i in enumerate(todo):
                            cache[i] = (images[pos], masks[pos])
                if cache is not None:
                    pairs = [cache[int(i)] for i in idx]
                    batch["image"] = np.stack([p[0] for p in pairs])
                    batch["mask"] = np.stack([p[1] for p in pairs])
                else:
                    batch["image"], batch["mask"] = images, masks
            else:
                batch = _collate([self.records[int(i)] for i in idx])
            yield batch

    def __iter__(self):
        import jax
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error_box = []

        def producer():
            try:
                for host_batch in self._host_batches():
                    q.put(host_batch)
            except BaseException as e:  # surface worker errors to the consumer
                error_box.append(e)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        step = 0
        while True:
            item = q.get()
            if item is sentinel:
                if error_box:
                    raise error_box[0]
                return
            batch = dict(item)
            if "image" not in batch:  # metadata-only records
                if self.place is not None:
                    batch = {k: self.place(v) for k, v in batch.items()}
                else:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                step += 1
                yield batch
                continue
            images = batch.pop("image")
            masks = batch.pop("mask")
            if self.place is not None:
                images, masks = self.place(images), self.place(masks)
                batch = {k: self.place(v) for k, v in batch.items()}
            if self.transform is not None:
                if self.rng_stream is not None:
                    images, masks = self.transform(images, masks, self.rng_stream.next())
                else:
                    images, masks = self.transform(images, masks)
            elif self.place is None:
                images = jax.device_put(images)
                masks = jax.device_put(masks)
            batch["image"] = images
            batch["mask"] = masks
            step += 1
            yield batch
