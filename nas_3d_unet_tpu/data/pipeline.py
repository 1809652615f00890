"""Online patch pipeline: random 3D crops + augmentation feeding the device.

Reference behavior (SURVEY.md §2 "Patch generator"): train/val split of the
patient list; each step samples a random patch from a random patient with
random axis flips and intensity jitter, yielding (x, y) batches with region
(WT/TC/ET) label encoding.

TPU-first design (SURVEY.md §7 hard-part 5):
  * The whole preprocessed dataset fits in host RAM → an in-memory
    PatientCache; per-step work is pure numpy slicing (cheap).
  * A background-thread Prefetcher overlaps host batch assembly +
    host→device transfer with device compute, so the step never waits on
    the generator (the reference blocks on h5 reads every step, §3.2).
  * Augmentation can also run on device inside the jitted step
    (`augment_batch`, driven by the step RNG key) — flips/jitter fuse into
    the forward graph and cost ~nothing on the VPU; the host path exists
    for parity tests and CPU runs.
  * Per-host data sharding for multi-host GSPMD: each process keeps only
    `patients[process_index::process_count]` (SURVEY.md §5 comm row).
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.dice import labels_to_class_indices, labels_to_regions
from .native._native import crop_batch_native
from .preprocess import load_patient_h5

Array = jax.Array


def split_patients(paths: Sequence[str], val_fraction: float, seed: int) -> Tuple[List[str], List[str]]:
    """Deterministic shuffled train/val split of patient h5 paths."""
    paths = sorted(paths)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(paths))
    n_val = max(1, int(round(len(paths) * val_fraction))) if len(paths) > 1 else 0
    val_idx = set(perm[:n_val].tolist())
    train = [p for i, p in enumerate(paths) if i not in val_idx]
    val = [p for i, p in enumerate(paths) if i in val_idx]
    return train, val


class PatientCache:
    """All preprocessed patients resident in host RAM.

    Labels are stored COMPACTLY by default (round-5 VERDICT #6): the raw
    uint8 BraTS label volume (1 B/voxel) instead of the fp32 region one-hot
    (3 × 4 B/voxel) — per-patient RAM drops from 28 to 17 B/voxel (image
    4 modalities × fp32 = 16 B/voxel either way), ~1.65× less; full BraTS
    2019 (~335 patients, ~150³ cropped) lands ~17 GB resident instead of
    ~28 GB (sizing table in README).  PatchGenerator converts to the
    training encoding per PATCH at collate; batches are bitwise identical
    to the legacy full-volume-fp32 storage (tests/test_pipeline.py).
    `compact=False` keeps the legacy storage (the equality oracle)."""

    def __init__(self, paths: Sequence[str], label_mode: str = "regions",
                 compact: bool = True):
        if not paths:
            raise ValueError("empty patient list")
        self.label_mode = label_mode
        self.records: List[Dict[str, np.ndarray]] = []
        for p in paths:
            rec = load_patient_h5(p)
            item = {"image": np.ascontiguousarray(rec["image"], dtype=np.float32)}
            if "label" in rec:
                if compact:
                    # raw BraTS labels {0,1,2,4}; mode conversion at collate
                    item["label_u8"] = np.ascontiguousarray(
                        rec["label"], dtype=np.uint8)
                elif label_mode == "regions":
                    item["label"] = np.asarray(
                        labels_to_regions(jnp.asarray(rec["label"].astype(np.int32))),
                        dtype=np.float32)
                else:  # "classes": BraTS {0,1,2,4} → class indices {0,1,2,3}
                    item["label"] = np.asarray(labels_to_class_indices(
                        jnp.asarray(rec["label"].astype(np.int32))))
            self.records.append(item)

    def __len__(self) -> int:
        return len(self.records)


def _crop_at(image: np.ndarray, label: Optional[np.ndarray], start,
             patch: Tuple[int, int, int]):
    """Patch crop at a given origin; volumes smaller than the patch are
    end-padded (the origin is 0 on padded axes by construction)."""
    shape = image.shape[:3]
    pad = [max(0, p - s) for p, s in zip(patch, shape)]
    if any(pad):
        pw = [(0, pad[0]), (0, pad[1]), (0, pad[2])]
        image = np.pad(image, pw + [(0, 0)])
        if label is not None:
            label = np.pad(label, pw + [(0, 0)] * (label.ndim - 3))
    sl = tuple(slice(st, st + p) for st, p in zip(start, patch))
    img = image[sl]
    lab = label[sl] if label is not None else None
    return img, lab


def _augment_np(rng: np.random.Generator, img: np.ndarray, lab: Optional[np.ndarray],
                flip_prob: float, shift: float, scale: float):
    """Random axis flips + per-modality intensity shift/scale (host path)."""
    for axis in range(3):
        if rng.random() < flip_prob:
            img = np.flip(img, axis=axis)
            if lab is not None:
                lab = np.flip(lab, axis=axis)
    if shift > 0 or scale > 0:
        c = img.shape[-1]
        sh = rng.uniform(-shift, shift, size=(1, 1, 1, c)).astype(np.float32)
        sc = 1.0 + rng.uniform(-scale, scale, size=(1, 1, 1, c)).astype(np.float32)
        img = img * sc + sh
    return np.ascontiguousarray(img), (np.ascontiguousarray(lab) if lab is not None else None)


class PatchGenerator:
    """Random-patch batch iterator over a PatientCache (host path).

    Sampling is COUNTER-BASED: batch k of seed s is drawn from a fresh
    ``default_rng((s, k))``, never from a sequential stream.  This makes the
    data stream a pure function of (seed, batch index), so an interrupted +
    resumed run consumes bit-identical batches to an uninterrupted one —
    the trajectory-exact-resume contract (SURVEY.md §5 checkpoint row;
    Trainer/Searcher align the counter to the restored global step via
    `set_step`).  Within a batch the draw order is unchanged (per sample:
    patient idx, then 3 starts; then augment draws), so the native
    batched-crop fast path stays RNG-order-identical to the numpy path.
    """

    def __init__(self, cache: PatientCache, patch_size, batch_size: int, seed: int = 0,
                 augment: bool = True, flip_prob: float = 0.5,
                 intensity_shift: float = 0.1, intensity_scale: float = 0.1,
                 start_step: int = 0):
        self.cache = cache
        self.patch = tuple(int(p) for p in patch_size)
        self.batch_size = batch_size
        self.augment = augment
        self.flip_prob = flip_prob
        self.shift = intensity_shift
        self.scale = intensity_scale
        self.seed = seed
        self._step = int(start_step)

    def set_step(self, step: int) -> None:
        """Position the stream at batch index `step` (resume alignment)."""
        self._step = int(step)

    def clone(self, seed_offset: int) -> "PatchGenerator":
        """Same sampling config, independent RNG stream (multi-worker use)."""
        return PatchGenerator(self.cache, self.patch, self.batch_size,
                              seed=self.seed + seed_offset, augment=self.augment,
                              flip_prob=self.flip_prob, intensity_shift=self.shift,
                              intensity_scale=self.scale, start_step=self._step)

    def _decode_labels(self, y_u8: np.ndarray) -> np.ndarray:
        """Compact-storage collate: raw uint8 BraTS labels → the training
        encoding (fp32 WT/TC/ET one-hot or int32 class indices).  Comparisons
        and the 0/1 cast are exact, so batches are bitwise identical to the
        legacy full-volume-fp32 storage (PatientCache docstring)."""
        from ..metrics.dice import labels_to_class_indices_np, labels_to_regions_np

        if getattr(self.cache, "label_mode", "regions") == "classes":
            return labels_to_class_indices_np(y_u8)
        return labels_to_regions_np(y_u8)

    def next(self) -> Tuple[np.ndarray, np.ndarray]:
        rng = np.random.default_rng((self.seed, self._step))
        self._step += 1
        # fast path: non-augmenting (device-side augmentation) batches whose
        # volumes all fit the patch go through the C++/OpenMP batch cropper
        # (crop_batch_bytes) — one call for images, one for labels.  RNG
        # draw order matches the numpy path exactly (idx, then 3 starts,
        # per sample), so both paths produce identical batches per seed.
        recs, starts = [], []
        native_ok = not self.augment
        for _ in range(self.batch_size):
            rec = self.cache.records[rng.integers(0, len(self.cache))]
            shape = rec["image"].shape[:3]
            if any(s < p for s, p in zip(shape, self.patch)):
                native_ok = False
            starts.append([int(rng.integers(0, max(1, s - p + 1)))
                           for s, p in zip(shape, self.patch)])
            recs.append(rec)
        lkey = "label_u8" if "label_u8" in recs[0] else "label"
        if native_ok and lkey in recs[0]:
            st = np.asarray(starts, dtype=np.int64)
            x = crop_batch_native([r["image"] for r in recs], st, self.patch)
            y = crop_batch_native([r[lkey] for r in recs], st, self.patch)
            if x is not None and y is not None:
                return x, (self._decode_labels(y) if lkey == "label_u8" else y)
        xs, ys = [], []
        for rec, st in zip(recs, starts):
            img, lab = _crop_at(rec["image"], rec.get(lkey), st, self.patch)
            if self.augment:
                img, lab = _augment_np(rng, img, lab, self.flip_prob, self.shift, self.scale)
            xs.append(img)
            ys.append(lab)
        x = np.stack(xs)
        y = np.stack(ys) if ys[0] is not None else None
        if y is not None and lkey == "label_u8":
            y = self._decode_labels(y)
        return x, y

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            yield self.next()


def augment_batch(key: Array, x: Array, y: Array, flip_prob: float = 0.5,
                  intensity_shift: float = 0.1, intensity_scale: float = 0.1):
    """Device-side augmentation, usable inside a jitted train step.

    Flips are applied per-sample per-axis; intensity jitter per-sample
    per-modality.  All branch-free (lax.select on reversed tensors), so the
    step stays a single static graph.
    """
    b = x.shape[0]
    kf, ks, kc = jax.random.split(key, 3)
    flip = jax.random.uniform(kf, (b, 3)) < flip_prob  # (B, 3)

    def flip_one(img, lab, f):
        for axis in range(3):
            img = jnp.where(f[axis], jnp.flip(img, axis=axis), img)
            lab = jnp.where(f[axis], jnp.flip(lab, axis=axis), lab)
        return img, lab

    x, y = jax.vmap(flip_one)(x, y, flip)
    c = x.shape[-1]
    sh = jax.random.uniform(ks, (b, 1, 1, 1, c), minval=-intensity_shift,
                            maxval=intensity_shift, dtype=x.dtype)
    sc = 1.0 + jax.random.uniform(kc, (b, 1, 1, 1, c), minval=-intensity_scale,
                                  maxval=intensity_scale, dtype=x.dtype)
    return x * sc + sh, y


_SENTINEL = object()


class Prefetcher:
    """Background thread(s) assembling batches and staging them on device.

    workers=1 (default) keeps batch order deterministic.  workers>1 clones
    the generator per worker (independent RNG streams) and interleaves their
    batches nondeterministically — use when the device step outruns one
    host thread's crop+augment throughput (numpy releases the GIL for the
    large slice copies, so threads scale).
    """

    def __init__(self, generator: PatchGenerator, depth: int = 2, device=None,
                 sharding=None, workers: int = 1):
        self._error = None
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, workers))
        self._stop = threading.Event()
        self._device = device
        self._sharding = sharding
        gens = [generator] if workers <= 1 else [
            generator.clone(1000 * w) for w in range(workers)]
        self._threads = [
            threading.Thread(target=self._worker, args=(g,), daemon=True)
            for g in gens]
        for t in self._threads:
            t.start()

    def _put(self, arr: np.ndarray) -> Array:
        if self._sharding is not None:
            # single-host: device_put with the rank-trimmed batch spec.
            # multi-host: this array is the PER-PROCESS slice of the global
            # batch and put_global_batch stitches the hosts' slices into one
            # global array (README multi-host contract step 3).
            from ..parallel.mesh import put_global_batch

            return put_global_batch(arr, self._sharding)
        if self._device is not None:
            return jax.device_put(arr, self._device)
        return jax.device_put(arr)

    def _worker(self, gen: PatchGenerator):
        try:
            while not self._stop.is_set():
                x, y = gen.next()
                batch = (self._put(x), self._put(y) if y is not None else None)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.25)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # propagate instead of hanging next()
            self._error = e
            try:
                self._q.put(_SENTINEL, timeout=1.0)
            except queue.Full:
                pass

    def next(self):
        item = self._q.get()
        if item is _SENTINEL:
            raise RuntimeError("Prefetcher worker failed") from self._error
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        for t in self._threads:
            t.join(timeout=2.0)


def dataset_paths(processed_dir: str, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> List[str]:
    """Patient h5 paths, optionally index-sharded per host for multi-host DP."""
    paths = sorted(glob.glob(os.path.join(processed_dir, "*.h5")))
    if process_index is None:
        process_index = jax.process_index()
        process_count = jax.process_count()
    if process_count and process_count > 1:
        paths = paths[process_index::process_count]
    return paths
