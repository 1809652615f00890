"""Whole-volume prediction driver (reference `predict.py`, SURVEY.md §3.4).

Per patient: load preprocessed HDF5 → sliding-window averaged region
probabilities → threshold → remap regions to BraTS labels {0,1,2,4} →
un-crop to the original scan geometry → write `.nii.gz`; report per-region
Dice (WT/TC/ET) when ground truth is present.
"""

from __future__ import annotations

import glob
import json
import os
import queue
import threading
import time
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preprocess import load_patient_h5
from ..io.nifti import write_nifti
from ..metrics.dice import (class_indices_to_labels, labels_to_regions,
                            region_dice, regions_to_labels)
from .sliding import SlidingWindowPredictor


def uncrop_labels(labels: np.ndarray, crop_start: np.ndarray,
                  orig_shape: np.ndarray) -> np.ndarray:
    """Place a cropped label map back into the original volume geometry."""
    out = np.zeros(tuple(int(s) for s in orig_shape), dtype=labels.dtype)
    s = [int(v) for v in crop_start]
    out[s[0]:s[0] + labels.shape[0],
        s[1]:s[1] + labels.shape[1],
        s[2]:s[2] + labels.shape[2]] = labels
    return out


def _iter_patients_prefetched(paths: Sequence[str],
                              depth: int = 1) -> Iterator[Tuple[str, Dict]]:
    """Yield (path, record) with the NEXT patient's HDF5 read and host→device
    transfer running in a background thread while the current one computes.

    `jax.device_put` is asynchronous — calling it from the loader thread
    starts the DMA immediately, so by the time the consumer touches
    `image_dev` the transfer is done or in flight.  Per-patient wall time
    becomes max(transfer, compute) instead of their sum (the reference
    transfers strictly sequentially per batch, SURVEY.md §3.4)."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    _END = object()
    err: List[BaseException] = []

    def loader():
        try:
            for path in paths:
                rec = load_patient_h5(path)
                rec["image_dev"] = jax.device_put(
                    np.ascontiguousarray(rec["image"], dtype=np.float32))
                if "label" in rec:
                    # uint8 keeps the upload at 1 B/voxel (labels are
                    # {0,1,2,4}); labels_to_regions compares small ints
                    rec["label_dev"] = jax.device_put(
                        np.ascontiguousarray(rec["label"], dtype=np.uint8))
                q.put((path, rec))
        except BaseException as e:  # propagate instead of hanging the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=loader, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise RuntimeError("patient prefetch failed") from err[0]
            return
        yield item


def _dispatch_patient(predictor: SlidingWindowPredictor, rec: Dict,
                      threshold: float) -> Tuple:
    """Enqueue one patient's DEVICE work and return the device handles.

    Everything here is asynchronous dispatch: the jitted stitch+decode and
    the on-device Dice reduction are queued on the device stream and the
    function returns without waiting, so the caller can immediately dispatch
    the NEXT patient while this one computes (the writer thread blocks on
    the readback instead — see predict_dataset)."""
    labels_dev = predictor.predict_labels(
        rec.get("image_dev", rec["image"]), threshold=threshold)
    dice_dev = None
    if "label" in rec:
        # Dice reduces on device while the labels are still there; only the
        # three scalars cross back.  labels_to_regions compares small ints,
        # so uint8 inputs need no widening cast.
        true = rec.get("label_dev")
        if true is None:
            true = jnp.asarray(rec["label"])
        dice_dev = region_dice(labels_to_regions(labels_dev),
                               labels_to_regions(true))
    return labels_dev, dice_dev


def _finalize_patient(labels_dev, dice_dev, rec: Dict,
                      out_dir: Optional[str]) -> Dict:
    """Host side of one patient: readback (blocks until the device work is
    done) → uncrop → NIfTI write → dice scalars.  Pure host work apart from
    the two readbacks, so it runs safely on the writer thread while the next
    patient's stitch occupies the device."""
    labels = np.asarray(labels_dev)                       # one uint8 readback
    full = uncrop_labels(labels, rec["crop_start"], rec["orig_shape"])
    result: Dict = {"patient": rec["patient"]}
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, rec["patient"] + ".nii.gz")
        write_nifti(out_path, full, rec.get("affine"))
        result["output"] = out_path
    if dice_dev is not None:
        dice = np.asarray(dice_dev)
        result["dice"] = {"WT": float(dice[0]), "TC": float(dice[1]),
                          "ET": float(dice[2])}
    return result


def predict_patient(
    predictor: SlidingWindowPredictor,
    h5_path: str,
    out_dir: Optional[str] = None,
    threshold: float = 0.5,
    rec: Optional[Dict] = None,
    device_decode: bool = True,
) -> Dict:
    """One patient end-to-end; returns metrics + timing.

    Label decode follows the predictor's label_mode: region probabilities
    are thresholded and nested-decoded; class probabilities are argmaxed
    and remapped (index 3 → BraTS label 4).  Dice is reported per region
    either way.

    `device_decode=True` (default) decodes labels on device and reads back
    only the uint8 label volume — ~30× fewer tunnel bytes than pulling the
    fp32 sum/count buffers (the measured per-patient wall dominator).  The
    device decode evaluates exact-mean predicates; it can differ from the
    probs route only on voxels within a division-rounding ulp of the
    decision boundary, where it is the more faithful of the two (see
    infer/sliding.py:_decode_labels).  `device_decode=False` keeps the
    original host-side probs route (the golden bit-for-bit path).
    """
    if rec is None:
        rec = load_patient_h5(h5_path)
    t0 = time.perf_counter()
    if device_decode:
        labels_dev, dice_dev = _dispatch_patient(predictor, rec, threshold)
    else:
        probs = predictor.predict_volume(rec.get("image_dev", rec["image"]))
        if getattr(predictor, "label_mode", "regions") == "classes":
            labels_dev = class_indices_to_labels(jnp.argmax(jnp.asarray(probs), axis=-1))
        else:
            labels_dev = regions_to_labels(jnp.asarray(probs), threshold)
        dice_dev = None
        if "label" in rec:
            true = rec.get("label_dev")
            if true is None:
                true = jnp.asarray(rec["label"])
            dice_dev = region_dice(labels_to_regions(labels_dev),
                                   labels_to_regions(true))
    labels = np.asarray(labels_dev)                       # one uint8 readback
    full = uncrop_labels(labels, rec["crop_start"], rec["orig_shape"])
    # `seconds` spans predict + decode + readback + uncrop, matching the
    # bench_infer metric; the Dice reduction is scoring, not timed.
    elapsed = time.perf_counter() - t0

    result: Dict = {"patient": rec["patient"], "seconds": elapsed}
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, rec["patient"] + ".nii.gz")
        write_nifti(out_path, full, rec.get("affine"))
        result["output"] = out_path
    if dice_dev is not None:
        dice = np.asarray(dice_dev)
        result["dice"] = {"WT": float(dice[0]), "TC": float(dice[1]), "ET": float(dice[2])}
    return result


def predict_records(
    predictor: SlidingWindowPredictor,
    records,                    # iterable of (path, rec) — rec as from
                                # load_patient_h5, image_dev/label_dev optional
    out_dir: Optional[str] = None,
    threshold: float = 0.5,
    verbose: bool = True,
) -> List[Dict]:
    """Pipelined patient loop over already-loaded records (round-5 VERDICT
    #4 — the reference runs every stage strictly sequentially, SURVEY.md
    §3.4).  Two overlapped stages on top of whatever prefetch `records`
    itself does:

      * main thread: asynchronous device dispatch of stitch + decode + Dice
        (`_dispatch_patient` — returns without waiting),
      * writer thread: label readback (the point that actually blocks on
        the device) + uncrop + NIfTI write + dice scalars
        (`_finalize_patient`).

    So patient i's readback/uncrop/write overlaps patient i+1's device
    compute; per-patient wall approaches the device-side stitch bound
    (BENCH history: 0.499 s wall vs 0.29 s device-side stitch before the
    overlap).  Results come back in patient order, and equality with the
    sequential path is pinned by tests/test_predict_e2e.py.  Each result's
    `seconds` is that patient's dispatch→finalize wall (includes time spent
    queued behind the previous patient's finalize) — a pipeline residency
    time, NOT the standalone latency that `predict_patient` reports."""
    results: List[Dict] = []
    # depth 2: the queue holds at most two dispatched patients — enough to
    # keep the device busy through one finalize, bounded so label volumes
    # don't pile up in HBM
    q: "queue.Queue" = queue.Queue(maxsize=2)
    _END = object()
    err: List[BaseException] = []

    def writer():
        while True:
            item = q.get()
            if item is _END:
                return
            if err:
                continue                                  # unblock producers
            rec, labels_dev, dice_dev, t_disp = item
            try:
                res = _finalize_patient(labels_dev, dice_dev, rec, out_dir)
                res["seconds"] = time.perf_counter() - t_disp
                if verbose:
                    print(json.dumps(res))
                results.append(res)   # FIFO queue → dispatch (patient) order
            except BaseException as e:
                err.append(e)

    wt = threading.Thread(target=writer, daemon=True)
    wt.start()
    try:
        for path, rec in records:
            labels_dev, dice_dev = _dispatch_patient(predictor, rec, threshold)
            q.put((rec, labels_dev, dice_dev, time.perf_counter()))
    finally:
        q.put(_END)
        wt.join()
    if err:
        raise RuntimeError("patient finalize failed") from err[0]
    return results


def predict_dataset(
    predictor: SlidingWindowPredictor,
    processed_dir: str,
    out_dir: Optional[str] = None,
    threshold: float = 0.5,
    overlap_output: bool = True,
) -> List[Dict]:
    """All patients under processed_dir; prints one JSON line per patient.

    The patient loop is a THREE-stage pipeline: a loader thread (HDF5 read +
    async host→device transfer of the NEXT patients,
    `_iter_patients_prefetched`) feeding `predict_records`' dispatch/finalize
    overlap — see there for the pipeline contract.  `overlap_output=False`
    restores the strictly sequential per-patient loop."""
    paths = sorted(glob.glob(os.path.join(processed_dir, "*.h5")))
    if not overlap_output:
        results = []
        for path, rec in _iter_patients_prefetched(paths):
            res = predict_patient(predictor, path, out_dir, threshold, rec=rec)
            print(json.dumps(res))
            results.append(res)
        return results
    return predict_records(predictor, _iter_patients_prefetched(paths),
                           out_dir, threshold)
