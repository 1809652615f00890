"""Offline BraTS preprocessing: NIfTI → per-patient HDF5.

Mirrors the reference pipeline (SURVEY.md §2 "BraTS preprocessor", §3.1):
walk ``HGG/`` + ``LGG/`` patient dirs, load the four modalities
(t1, t1ce, t2, flair) plus segmentation, z-score-normalize each modality
within its nonzero brain mask, crop everything to the union foreground
bounding box, stack modalities, and write one HDF5 file per patient.

Pure-numpy host work (no device involved); embarrassingly parallel across
patients via a process pool.  Output layout is channels-last (D, H, W, 4)
float32 — the layout the TPU model consumes — plus the crop offset and the
original shape so inference can un-crop its label map back to BraTS
submission geometry.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import numpy as np

from ..io.nifti import read_nifti
from .native import available as _native_available
from .native import union_bbox_native, zscore_native

MODALITIES = ("t1", "t1ce", "t2", "flair")
SEG_SUFFIX = "seg"


def _use_native() -> bool:
    return _native_available() and not os.environ.get("NAS3D_NO_NATIVE")


def zscore_in_mask(vol: np.ndarray, mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Z-score normalize within the nonzero mask; background stays 0.

    Matches the reference's per-modality normalization (SURVEY.md §3.1).
    """
    vol = vol.astype(np.float32)
    if mask is None:
        if _use_native():  # C++/OpenMP fast path (data/native/preproc.cpp)
            out = zscore_native(vol)
            if out is not None:
                return out
        mask = vol != 0
    vals = vol[mask]
    if vals.size == 0:
        return np.zeros_like(vol)
    mean = vals.mean(dtype=np.float64)
    std = vals.std(dtype=np.float64)
    if std == 0:
        std = 1.0
    out = np.zeros_like(vol)
    out[mask] = ((vals - mean) / std).astype(np.float32)
    return out


def foreground_bbox(mask: np.ndarray) -> Tuple[slice, ...]:
    """Tight bounding box of True voxels (full volume if empty)."""
    if not mask.any():
        return tuple(slice(0, s) for s in mask.shape)
    slices = []
    for axis in range(mask.ndim):
        other = tuple(i for i in range(mask.ndim) if i != axis)
        prof = mask.any(axis=other)
        idx = np.where(prof)[0]
        slices.append(slice(int(idx[0]), int(idx[-1]) + 1))
    return tuple(slices)


def preprocess_arrays(
    modality_vols: Sequence[np.ndarray],
    seg: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Core transform on raw arrays; returns image/label/crop metadata.

    Exposed separately so tests can oracle-check it without touching disk.
    """
    orig_shape = np.array(modality_vols[0].shape, dtype=np.int64)
    vols32 = [np.ascontiguousarray(v, dtype=np.float32) for v in modality_vols]
    bbox = union_bbox_native(vols32) if _use_native() else None
    if bbox is None:
        union = np.zeros(vols32[0].shape, dtype=bool)
        for v in vols32:
            union |= v != 0
        bbox = foreground_bbox(union)

    channels = []
    for v in vols32:
        norm = zscore_in_mask(v)
        channels.append(norm[bbox])
    image = np.stack(channels, axis=-1).astype(np.float32)  # (D,H,W,4)

    out = {
        "image": image,
        "crop_start": np.array([s.start for s in bbox], dtype=np.int64),
        "orig_shape": orig_shape,
    }
    if seg is not None:
        out["label"] = np.asarray(seg)[bbox].astype(np.uint8)
    return out


def _find_modality_file(patient_dir: str, name: str, suffix: str) -> Optional[str]:
    for ext in (".nii.gz", ".nii"):
        p = os.path.join(patient_dir, f"{name}_{suffix}{ext}")
        if os.path.exists(p):
            return p
    return None


def preprocess_patient(
    patient_dir: str,
    out_path: str,
    modalities: Sequence[str] = MODALITIES,
    seg_suffix: str = SEG_SUFFIX,
) -> str:
    """One patient: read NIfTIs, transform, write HDF5 atomically."""
    name = os.path.basename(os.path.normpath(patient_dir))
    vols, affine = [], None
    for m in modalities:
        path = _find_modality_file(patient_dir, name, m)
        if path is None:
            raise FileNotFoundError(f"{patient_dir}: missing modality {m!r}")
        img = read_nifti(path)
        vols.append(np.asarray(img.data, dtype=np.float32))
        affine = img.affine if affine is None else affine

    seg = None
    seg_path = _find_modality_file(patient_dir, name, seg_suffix)
    if seg_path is not None:
        seg = np.asarray(read_nifti(seg_path).data)

    rec = preprocess_arrays(vols, seg)

    tmp = out_path + ".tmp"
    with h5py.File(tmp, "w") as f:
        f.create_dataset("image", data=rec["image"], compression=None)
        if "label" in rec:
            f.create_dataset("label", data=rec["label"], compression=None)
        f.attrs["crop_start"] = rec["crop_start"]
        f.attrs["orig_shape"] = rec["orig_shape"]
        f.attrs["affine"] = affine
        f.attrs["modalities"] = ",".join(modalities)
        f.attrs["patient"] = name
    os.replace(tmp, out_path)  # atomic publish (SURVEY.md §5 checkpoint row)
    return out_path


def list_patient_dirs(raw_dir: str) -> List[str]:
    """HGG/ + LGG/ grade dirs if present, else every subdir of raw_dir."""
    dirs: List[str] = []
    grade_dirs = [os.path.join(raw_dir, g) for g in ("HGG", "LGG")]
    roots = [g for g in grade_dirs if os.path.isdir(g)] or [raw_dir]
    for root in roots:
        for entry in sorted(os.listdir(root)):
            full = os.path.join(root, entry)
            if os.path.isdir(full):
                dirs.append(full)
    return dirs


def preprocess_dataset(
    raw_dir: str,
    out_dir: str,
    modalities: Sequence[str] = MODALITIES,
    seg_suffix: str = SEG_SUFFIX,
    workers: int = 0,
) -> List[str]:
    """Preprocess every patient under raw_dir into out_dir/*.h5."""
    os.makedirs(out_dir, exist_ok=True)
    patients = list_patient_dirs(raw_dir)
    jobs = [
        (p, os.path.join(out_dir, os.path.basename(os.path.normpath(p)) + ".h5"))
        for p in patients
    ]
    if workers and workers > 1:
        with cf.ProcessPoolExecutor(max_workers=workers) as ex:
            futs = [ex.submit(preprocess_patient, p, o, modalities, seg_suffix)
                    for p, o in jobs]
            return [f.result() for f in futs]
    return [preprocess_patient(p, o, modalities, seg_suffix) for p, o in jobs]


def load_patient_h5(path: str) -> Dict[str, np.ndarray]:
    """Read a preprocessed patient back into memory."""
    with h5py.File(path, "r") as f:
        rec = {"image": f["image"][()]}
        if "label" in f:
            rec["label"] = f["label"][()]
        rec["crop_start"] = np.asarray(f.attrs["crop_start"])
        rec["orig_shape"] = np.asarray(f.attrs["orig_shape"])
        rec["affine"] = np.asarray(f.attrs["affine"])
        rec["patient"] = str(f.attrs["patient"])
    return rec
