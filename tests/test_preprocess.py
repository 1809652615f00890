"""Preprocessing oracle tests: z-score, bbox crop, HDF5 round-trip."""

import numpy as np

from nas_3d_unet_tpu.data.preprocess import (
    foreground_bbox,
    load_patient_h5,
    preprocess_arrays,
    preprocess_dataset,
    preprocess_patient,
    zscore_in_mask,
)
from nas_3d_unet_tpu.io.nifti import write_nifti


def _synthetic_patient(tmp_path, name="BraTS19_x_1", with_seg=True, shape=(24, 20, 16)):
    rng = np.random.default_rng(hash(name) % 2**32)
    pdir = tmp_path / name
    pdir.mkdir(parents=True)
    # brain occupies an inner box; background exactly 0
    for mod in ("t1", "t1ce", "t2", "flair"):
        vol = np.zeros(shape, dtype=np.float32)
        vol[4:20, 3:17, 2:14] = rng.random((16, 14, 12)).astype(np.float32) * 100 + 10
        write_nifti(str(pdir / f"{name}_{mod}.nii.gz"), vol)
    if with_seg:
        seg = np.zeros(shape, dtype=np.uint8)
        seg[8:14, 6:12, 5:10] = rng.choice([0, 1, 2, 4], (6, 6, 5)).astype(np.uint8)
        write_nifti(str(pdir / f"{name}_seg.nii.gz"), seg)
    return pdir


def test_zscore_oracle():
    rng = np.random.default_rng(0)
    vol = np.zeros((8, 8, 8), np.float32)
    vol[2:6, 2:6, 2:6] = rng.random((4, 4, 4)).astype(np.float32) + 1.0
    out = zscore_in_mask(vol)
    mask = vol != 0
    np.testing.assert_allclose(out[mask].mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(out[mask].std(), 1.0, atol=1e-4)
    assert (out[~mask] == 0).all()


def test_bbox():
    m = np.zeros((10, 9, 8), bool)
    m[2:5, 1:7, 3:4] = True
    assert foreground_bbox(m) == (slice(2, 5), slice(1, 7), slice(3, 4))
    empty = np.zeros((4, 4, 4), bool)
    assert foreground_bbox(empty) == (slice(0, 4),) * 3


def test_preprocess_arrays_crop_and_stack():
    vols = [np.zeros((12, 10, 8), np.float32) for _ in range(4)]
    for i, v in enumerate(vols):
        v[2:8, 1:9, 3:7] = i + 1.0
    seg = np.zeros((12, 10, 8), np.uint8)
    seg[4, 4, 4] = 4
    rec = preprocess_arrays(vols, seg)
    assert rec["image"].shape == (6, 8, 4, 4)
    assert rec["label"].shape == (6, 8, 4)
    np.testing.assert_array_equal(rec["crop_start"], [2, 1, 3])
    np.testing.assert_array_equal(rec["orig_shape"], [12, 10, 8])
    # constant-within-mask modality → z-score 0 everywhere
    assert np.abs(rec["image"]).max() == 0.0
    assert rec["label"][2, 3, 1] == 4


def test_preprocess_patient_h5_roundtrip(tmp_path):
    pdir = _synthetic_patient(tmp_path / "HGG")
    out = tmp_path / "out.h5"
    preprocess_patient(str(pdir), str(out))
    rec = load_patient_h5(str(out))
    assert rec["image"].shape[-1] == 4
    assert rec["image"].dtype == np.float32
    assert rec["label"].dtype == np.uint8
    assert rec["patient"] == "BraTS19_x_1"
    # normalized: nonzero voxels ~ zero-mean per modality
    img = rec["image"]
    for c in range(4):
        vals = img[..., c][img[..., c] != 0]
        assert abs(vals.mean()) < 0.05


def test_preprocess_dataset_walks_grades(tmp_path):
    _synthetic_patient(tmp_path / "raw" / "HGG", "BraTS19_a_1")
    _synthetic_patient(tmp_path / "raw" / "LGG", "BraTS19_b_2", with_seg=False)
    outs = preprocess_dataset(str(tmp_path / "raw"), str(tmp_path / "h5"))
    assert len(outs) == 2
    rec_b = load_patient_h5(outs[1])
    assert "label" not in rec_b
