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
