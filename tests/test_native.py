"""C++ preprocessing kernels vs the numpy oracles."""

import numpy as np
import pytest

from nas_3d_unet_tpu.data.native import available, union_bbox_native, zscore_native
from nas_3d_unet_tpu.data.preprocess import foreground_bbox, preprocess_arrays, zscore_in_mask

needs_native = pytest.mark.skipif(not available(), reason="native lib unavailable")


@needs_native
def test_zscore_native_matches_numpy():
    rng = np.random.default_rng(0)
    vol = np.zeros((30, 28, 26), np.float32)
    vol[5:25, 4:24, 3:23] = (rng.random((20, 20, 20)) * 50 + 7).astype(np.float32)
    got = zscore_native(vol)
    mask = vol != 0
    want = np.zeros_like(vol)
    vals = vol[mask]
    want[mask] = ((vals - vals.mean(dtype=np.float64)) / vals.std(dtype=np.float64)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert (got[~mask] == 0).all()


@needs_native
def test_zscore_native_empty_and_constant():
    empty = np.zeros((4, 4, 4), np.float32)
    np.testing.assert_array_equal(zscore_native(empty), empty)
    const = np.zeros((4, 4, 4), np.float32)
    const[1:3] = 5.0
    got = zscore_native(const)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[1:3], 0.0, atol=1e-6)


@needs_native
def test_union_bbox_native_matches_numpy():
    rng = np.random.default_rng(1)
    a = np.zeros((20, 18, 16), np.float32)
    b = np.zeros((20, 18, 16), np.float32)
    a[3:9, 2:8, 4:10] = 1.0
    b[7:15, 5:12, 1:6] = 2.0
    got = union_bbox_native([a, b])
    want = foreground_bbox((a != 0) | (b != 0))
    assert got == want
    # empty → full volume
    assert union_bbox_native([np.zeros((5, 6, 7), np.float32)]) == (
        slice(0, 5), slice(0, 6), slice(0, 7))


@needs_native
def test_preprocess_arrays_native_vs_numpy_path(monkeypatch):
    rng = np.random.default_rng(2)
    vols = []
    for _ in range(4):
        v = np.zeros((24, 22, 20), np.float32)
        v[4:20, 3:19, 2:18] = (rng.random((16, 16, 16)) * 30 + 1).astype(np.float32)
        vols.append(v)
    seg = np.zeros((24, 22, 20), np.uint8)
    seg[8:12, 7:11, 6:10] = 2

    rec_native = preprocess_arrays(vols, seg)
    monkeypatch.setenv("NAS3D_NO_NATIVE", "1")
    rec_numpy = preprocess_arrays(vols, seg)

    np.testing.assert_array_equal(rec_native["crop_start"], rec_numpy["crop_start"])
    assert rec_native["image"].shape == rec_numpy["image"].shape
    np.testing.assert_allclose(rec_native["image"], rec_numpy["image"], atol=1e-5)
    np.testing.assert_array_equal(rec_native["label"], rec_numpy["label"])


def test_crop_batch_native_matches_numpy_path():
    # the generator's native fast path must produce byte-identical batches
    # to the numpy path for the same seed (same RNG draw order)
    import numpy as np
    from nas_3d_unet_tpu.data.native._native import available, crop_batch_native

    if not available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    vols = [np.ascontiguousarray(rng.standard_normal((12 + i, 11, 10, 4)).astype(np.float32))
            for i in range(4)]
    starts = np.asarray([[2, 1, 0], [0, 3, 2], [4, 0, 1], [1, 1, 1]], np.int64)
    out = crop_batch_native(vols, starts, (8, 8, 8))
    for i, (v, st) in enumerate(zip(vols, starts)):
        want = v[st[0]:st[0] + 8, st[1]:st[1] + 8, st[2]:st[2] + 8]
        np.testing.assert_array_equal(out[i], want)


def test_generator_native_and_numpy_paths_identical(tmp_path):
    import numpy as np
    from nas_3d_unet_tpu.data import pipeline as pl
    from tests.helpers import write_synthetic_h5

    paths = write_synthetic_h5(str(tmp_path / "h5"), n_patients=3)
    cache = pl.PatientCache(paths)
    g1 = pl.PatchGenerator(cache, (8, 8, 8), 4, seed=7, augment=False)
    g2 = pl.PatchGenerator(cache, (8, 8, 8), 4, seed=7, augment=False)
    x1, y1 = g1.next()
    # force the numpy fallback on the second generator
    import nas_3d_unet_tpu.data.pipeline as pmod
    orig = pmod.crop_batch_native
    pmod.crop_batch_native = lambda *a, **k: None
    try:
        x2, y2 = g2.next()
    finally:
        pmod.crop_batch_native = orig
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
