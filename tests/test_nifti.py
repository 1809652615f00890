"""NIfTI-1 reader/writer round-trip and format checks."""

import numpy as np
import pytest

from nas_3d_unet_tpu.io.nifti import read_nifti, write_nifti


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_roundtrip(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        data = rng.standard_normal((7, 5, 3)).astype(dtype)
    else:
        data = rng.integers(0, 100, (7, 5, 3)).astype(dtype)
    affine = np.eye(4, dtype=np.float32)
    affine[:3, 3] = [1.0, -2.0, 3.0]
    path = str(tmp_path / f"vol{suffix}")
    write_nifti(path, data, affine)
    img = read_nifti(path)
    np.testing.assert_array_equal(img.data, data)
    np.testing.assert_allclose(img.affine, affine)
    assert img.data.dtype == dtype


def test_fortran_order_semantics(tmp_path):
    # first axis must be fastest-varying on disk (NIfTI column-major)
    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    path = str(tmp_path / "v.nii")
    write_nifti(path, data)
    import struct
    with open(path, "rb") as f:
        raw = f.read()
    (vox_offset,) = struct.unpack_from("<f", raw, 108)
    flat = np.frombuffer(raw, dtype=np.int16, offset=int(vox_offset))
    np.testing.assert_array_equal(flat.reshape(2, 3, 4, order="F"), data)


def test_4d_roundtrip(tmp_path):
    data = np.random.default_rng(1).standard_normal((4, 5, 6, 2)).astype(np.float32)
    path = str(tmp_path / "v4.nii.gz")
    write_nifti(path, data)
    np.testing.assert_array_equal(read_nifti(path).data, data)
