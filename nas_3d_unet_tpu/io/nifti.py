"""Minimal pure-numpy NIfTI-1 reader/writer.

The reference uses nibabel to load BraTS ``*.nii.gz`` volumes (SURVEY.md §2
"BraTS preprocessor", §3.1).  nibabel is not available in this image
(SURVEY.md §7 [ENV]), and BraTS files are plain single-file NIfTI-1
(348-byte header + raw data, usually gzipped), so we read/write them
directly.

Only the fields the pipeline needs are handled: dims, datatype, pixdim,
scl_slope/scl_inter, the sform/qform affine rows, and vox_offset.  Data is
returned as a numpy array in Fortran order semantics (NIfTI is
column-major): ``data[i, j, k]`` indexes (x, y, z) voxels, matching
nibabel's ``get_fdata`` layout.
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

HDR_SIZE = 348
MAGIC_N1 = b"n+1\x00"  # single-file nifti

# NIfTI datatype code → numpy dtype
_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}
_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


@dataclass
class NiftiImage:
    """A loaded NIfTI volume: data + the affine and header bits we preserve."""

    data: np.ndarray
    affine: np.ndarray = field(default_factory=lambda: np.eye(4, dtype=np.float32))
    pixdim: Optional[np.ndarray] = None  # zooms for each spatial dim

    @property
    def shape(self):
        return self.data.shape


def _maybe_gzip_open(path: str, mode: str):
    if mode == "rb":
        with open(path, "rb") as f:
            magic = f.read(2)
        if magic == b"\x1f\x8b":
            return gzip.open(path, "rb")
        return open(path, "rb")
    # write: choose by extension
    if str(path).endswith(".gz"):
        return gzip.open(path, mode, compresslevel=1)
    return open(path, mode)


def read_nifti(path: str) -> NiftiImage:
    """Read a (possibly gzipped) single-file NIfTI-1 image."""
    with _maybe_gzip_open(path, "rb") as f:
        raw = f.read()

    hdr = raw[:HDR_SIZE]
    (sizeof_hdr,) = struct.unpack_from("<i", hdr, 0)
    byteorder = "<"
    if sizeof_hdr != HDR_SIZE:
        (sizeof_hdr_be,) = struct.unpack_from(">i", hdr, 0)
        if sizeof_hdr_be == HDR_SIZE:
            byteorder = ">"
        else:
            raise ValueError(f"{path}: not a NIfTI-1 file (sizeof_hdr={sizeof_hdr})")

    dim = struct.unpack_from(byteorder + "8h", hdr, 40)
    ndim = dim[0]
    if not 1 <= ndim <= 7:
        raise ValueError(f"{path}: bad ndim {ndim}")
    shape = tuple(int(d) for d in dim[1 : 1 + ndim])

    (datatype,) = struct.unpack_from(byteorder + "h", hdr, 70)
    if datatype not in _DTYPES:
        raise ValueError(f"{path}: unsupported NIfTI datatype code {datatype}")
    dtype = np.dtype(_DTYPES[datatype]).newbyteorder(byteorder)

    pixdim = np.array(struct.unpack_from(byteorder + "8f", hdr, 76), dtype=np.float32)
    (vox_offset,) = struct.unpack_from(byteorder + "f", hdr, 108)
    scl_slope, scl_inter = struct.unpack_from(byteorder + "2f", hdr, 112)
    (sform_code,) = struct.unpack_from(byteorder + "h", hdr, 254)

    affine = np.eye(4, dtype=np.float32)
    if sform_code > 0:
        srow = struct.unpack_from(byteorder + "12f", hdr, 280)
        affine[0, :] = srow[0:4]
        affine[1, :] = srow[4:8]
        affine[2, :] = srow[8:12]
    else:
        # fall back to pixdim scaling only (qform decoding not needed for BraTS)
        for i in range(3):
            affine[i, i] = pixdim[i + 1] if pixdim[i + 1] != 0 else 1.0

    offset = int(vox_offset) if vox_offset >= HDR_SIZE else HDR_SIZE
    count = int(np.prod(shape))
    data = np.frombuffer(raw, dtype=dtype, count=count, offset=offset)
    # NIfTI data is column-major: first axis fastest.
    data = data.reshape(shape, order="F")

    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        data = data.astype(np.float32) * slope + scl_inter

    return NiftiImage(data=np.asarray(data), affine=affine, pixdim=pixdim[1 : 1 + ndim])


def write_nifti(path: str, data: np.ndarray, affine: Optional[np.ndarray] = None) -> None:
    """Write a single-file NIfTI-1 image (gzipped iff path ends with .gz)."""
    data = np.asarray(data)
    if data.dtype not in _CODES:
        data = data.astype(np.float32)
    affine = np.eye(4, dtype=np.float32) if affine is None else np.asarray(affine, np.float32)

    hdr = bytearray(HDR_SIZE)
    struct.pack_into("<i", hdr, 0, HDR_SIZE)
    dim = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, _CODES[np.dtype(data.dtype)])
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)  # bitpix
    # pixdim from affine column norms
    zooms = [1.0] + [float(np.linalg.norm(affine[:3, i])) or 1.0 for i in range(3)]
    zooms += [1.0] * (8 - len(zooms))
    struct.pack_into("<8f", hdr, 76, *zooms[:8])
    struct.pack_into("<f", hdr, 108, float(HDR_SIZE + 4))  # vox_offset (+4 ext flag)
    struct.pack_into("<2f", hdr, 112, 1.0, 0.0)  # scl_slope, scl_inter
    struct.pack_into("<h", hdr, 252, 1)  # qform_code (identity-ish, unused)
    struct.pack_into("<h", hdr, 254, 1)  # sform_code
    struct.pack_into("<12f", hdr, 280, *affine[0, :], *affine[1, :], *affine[2, :])
    hdr[344:348] = MAGIC_N1

    with _maybe_gzip_open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00\x00\x00\x00")  # no header extensions
        f.write(np.asfortranarray(data).tobytes(order="F"))
