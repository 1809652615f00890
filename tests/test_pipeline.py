"""Patch pipeline: split, cache, crop/augment, prefetch, device-side augment."""

import jax
import jax.numpy as jnp
import numpy as np

from nas_3d_unet_tpu.data.pipeline import (
    PatchGenerator,
    PatientCache,
    Prefetcher,
    augment_batch,
    dataset_paths,
    split_patients,
)
from tests.helpers import write_synthetic_h5


def test_split_deterministic_and_disjoint():
    paths = [f"p{i}.h5" for i in range(10)]
    tr1, va1 = split_patients(paths, 0.2, seed=3)
    tr2, va2 = split_patients(paths, 0.2, seed=3)
    assert tr1 == tr2 and va1 == va2
    assert len(va1) == 2 and not set(tr1) & set(va1)
    assert sorted(tr1 + va1) == sorted(paths)


def test_generator_shapes_and_determinism(tmp_path):
    paths = write_synthetic_h5(str(tmp_path), n_patients=2)
    cache = PatientCache(paths)
    g1 = PatchGenerator(cache, (8, 8, 8), 3, seed=5)
    g2 = PatchGenerator(cache, (8, 8, 8), 3, seed=5)
    x1, y1 = g1.next()
    x2, y2 = g2.next()
    assert x1.shape == (3, 8, 8, 8, 4) and y1.shape == (3, 8, 8, 8, 3)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    # labels are region-encoded: WT ⊇ TC ⊇ ET
    assert ((y1[..., 0] >= y1[..., 1]) & (y1[..., 1] >= y1[..., 2])).all()


def test_generator_patch_larger_than_volume(tmp_path):
    paths = write_synthetic_h5(str(tmp_path), n_patients=1, shape=(10, 9, 8))
    cache = PatientCache(paths)
    g = PatchGenerator(cache, (16, 16, 16), 1, seed=0)
    x, y = g.next()
    assert x.shape == (1, 16, 16, 16, 4)


def test_prefetcher_delivers_and_closes(tmp_path):
    paths = write_synthetic_h5(str(tmp_path), n_patients=1)
    g = PatchGenerator(PatientCache(paths), (8, 8, 8), 2, seed=0)
    pf = Prefetcher(g, depth=2)
    for _ in range(4):
        x, y = pf.next()
        assert isinstance(x, jax.Array) and x.shape == (2, 8, 8, 8, 4)
    pf.close()


def test_device_augment_consistent_xy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 6, 6, 6, 4)).astype(np.float32))
    # y mirrors channel 0 of x so flips must track exactly
    y = jnp.stack([x[..., 0]] * 3, axis=-1)
    xa, ya = augment_batch(jax.random.PRNGKey(1), x, y,
                           flip_prob=0.5, intensity_shift=0.0, intensity_scale=0.0)
    np.testing.assert_array_equal(np.asarray(xa[..., 0]), np.asarray(ya[..., 0]))
    # augmentation with zero jitter is a pure permutation: same multiset
    np.testing.assert_allclose(np.sort(np.asarray(xa).ravel()),
                               np.sort(np.asarray(x).ravel()))


def test_dataset_paths_host_sharding(tmp_path):
    paths = write_synthetic_h5(str(tmp_path), n_patients=5)
    all_parts = [dataset_paths(str(tmp_path), process_index=i, process_count=2)
                 for i in range(2)]
    assert sorted(sum(all_parts, [])) == sorted(paths)
    assert not set(all_parts[0]) & set(all_parts[1])


def test_prefetcher_multiworker_batches(tmp_path):
    """workers>1 interleaves independent generator streams; every batch is
    well-formed (shape/dtype) and the queue drains without deadlock."""
    from tests.helpers import write_synthetic_h5
    from nas_3d_unet_tpu.data.pipeline import PatchGenerator, PatientCache, Prefetcher

    paths = write_synthetic_h5(str(tmp_path), n_patients=2)
    g = PatchGenerator(PatientCache(paths), (8, 8, 8), 2, seed=0)
    pf = Prefetcher(g, depth=2, workers=3)
    try:
        for _ in range(6):
            x, y = pf.next()
            assert x.shape == (2, 8, 8, 8, 4)
            assert y.shape == (2, 8, 8, 8, 3)
    finally:
        pf.close()


def test_patch_generator_clone_independent_stream(tmp_path):
    from tests.helpers import write_synthetic_h5
    from nas_3d_unet_tpu.data.pipeline import PatchGenerator, PatientCache

    paths = write_synthetic_h5(str(tmp_path), n_patients=2)
    cache = PatientCache(paths)
    g = PatchGenerator(cache, (8, 8, 8), 2, seed=5)
    c = g.clone(1000)
    xg, _ = g.next()
    xc, _ = c.next()
    assert xg.shape == xc.shape
    assert not np.array_equal(xg, xc)  # different RNG streams
    # clone of same offset reproduces the same stream
    c2 = PatchGenerator(cache, (8, 8, 8), 2, seed=1005)
    np.testing.assert_array_equal(xc, c2.next()[0])


def test_compact_label_storage_bitwise_equal(tmp_path):
    """Round-5 VERDICT #6: PatientCache stores raw uint8 BraTS labels
    (1 B/voxel) instead of the fp32 region one-hot (12 B/voxel); batches
    must be BITWISE identical across storage modes — augmented numpy path
    and non-augmented (native fast) path, regions and classes modes."""
    paths = write_synthetic_h5(str(tmp_path), n_patients=2)
    for mode in ("regions", "classes"):
        compact = PatientCache(paths, label_mode=mode, compact=True)
        legacy = PatientCache(paths, label_mode=mode, compact=False)
        # compact stores 1 B/voxel raw labels
        assert compact.records[0]["label_u8"].dtype == np.uint8
        assert set(np.unique(compact.records[0]["label_u8"])).issubset({0, 1, 2, 4})
        assert "label" not in compact.records[0]
        for augment in (False, True):  # False → native fast path if built
            gc = PatchGenerator(compact, (8, 8, 8), 3, seed=11, augment=augment)
            gl = PatchGenerator(legacy, (8, 8, 8), 3, seed=11, augment=augment)
            for _ in range(3):
                xc, yc = gc.next()
                xl, yl = gl.next()
                assert yc.dtype == yl.dtype
                np.testing.assert_array_equal(xc, xl)
                np.testing.assert_array_equal(yc, yl)


def test_numpy_region_converters_match_jax(tmp_path):
    from nas_3d_unet_tpu.metrics.dice import (labels_to_class_indices,
                                              labels_to_class_indices_np,
                                              labels_to_regions,
                                              labels_to_regions_np)

    rng = np.random.default_rng(0)
    labels = rng.choice(np.array([0, 1, 2, 4], np.uint8), size=(6, 5, 4))
    np.testing.assert_array_equal(
        labels_to_regions_np(labels),
        np.asarray(labels_to_regions(jnp.asarray(labels.astype(np.int32)))))
    np.testing.assert_array_equal(
        labels_to_class_indices_np(labels),
        np.asarray(labels_to_class_indices(jnp.asarray(labels.astype(np.int32)))))
