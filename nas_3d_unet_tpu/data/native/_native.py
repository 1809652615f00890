"""ctypes loader for the C++ preprocessing kernels (preproc.cpp).

Compiles on first use with g++ -O3 -fopenmp into a per-user cache dir and
binds via ctypes (no pybind11 in this image).  Every entry point has a
numpy fallback in data/preprocess.py — `available()` gates the fast path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "preproc.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("NAS3D_NATIVE_CACHE",
                           os.path.join(tempfile.gettempdir(), "nas3d_native"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"preproc_{digest}.so")


def _build(out: str) -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", out + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(out + ".tmp", out)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _cache_path()
        if not os.path.exists(path) and not _build(path):
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.zscore_in_mask.restype = ctypes.c_int64
        lib.zscore_in_mask.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.union_foreground_bbox.restype = ctypes.c_int32
        lib.union_foreground_bbox.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.crop_batch_bytes.restype = None
        lib.crop_batch_bytes.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def zscore_native(vol: np.ndarray) -> Optional[np.ndarray]:
    """In-place-semantics z-score within nonzero mask; None if lib missing.

    `vol` must be float32; a C-contiguous copy is normalized and returned.
    """
    lib = _load()
    if lib is None:
        return None
    out = np.ascontiguousarray(vol, dtype=np.float32).copy()
    ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.zscore_in_mask(ptr, out.size)
    return out


def union_bbox_native(vols: List[np.ndarray]) -> Optional[Tuple[slice, slice, slice]]:
    """Union nonzero bbox across float32 volumes; None if lib missing."""
    lib = _load()
    if lib is None:
        return None
    contig = [np.ascontiguousarray(v, dtype=np.float32) for v in vols]
    d, h, w = contig[0].shape
    arr_t = ctypes.POINTER(ctypes.c_float) * len(contig)
    ptrs = arr_t(*[v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for v in contig])
    bbox = (ctypes.c_int64 * 6)()
    lib.union_foreground_bbox(ptrs, len(contig), d, h, w, bbox)
    return (slice(bbox[0], bbox[1]), slice(bbox[2], bbox[3]), slice(bbox[4], bbox[5]))


def crop_batch_native(vols: List[np.ndarray], starts: np.ndarray,
                      patch: Tuple[int, int, int]) -> Optional[np.ndarray]:
    """Multithreaded batched patch crop (the generator hot loop).

    `vols`: n C-contiguous volumes of shape (D, H, W[, C]) sharing dtype and
    trailing (channel) shape; `starts`: (n, 3) int64 crop origins.  Returns
    the (n, pd, ph, pw[, C]) batch, or None when the library is missing.
    """
    lib = _load()
    if lib is None or not vols:
        return None
    v0 = vols[0]
    trail = v0.shape[3:]
    vox_bytes = int(np.prod(trail, dtype=np.int64)) * v0.itemsize if trail \
        else v0.itemsize
    if any((not v.flags.c_contiguous) or v.dtype != v0.dtype
           or v.shape[3:] != trail for v in vols):
        return None
    n = len(vols)
    pd, ph, pw = (int(x) for x in patch)
    dims = np.asarray([v.shape[:3] for v in vols], dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    out = np.empty((n, pd, ph, pw) + trail, dtype=v0.dtype)
    ptr_t = ctypes.c_void_p * n
    ptrs = ptr_t(*[v.ctypes.data for v in vols])
    lib.crop_batch_bytes(
        ptrs, dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.c_void_p), n, pd, ph, pw, vox_bytes)
    return out
