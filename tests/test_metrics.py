"""Dice loss/metric and BraTS label↔region mapping (numpy oracles)."""

import jax.numpy as jnp
import numpy as np

from nas_3d_unet_tpu.metrics.dice import (
    dice_ce_loss,
    labels_to_regions,
    region_dice,
    regions_to_labels,
    soft_dice_loss,
)


def test_labels_to_regions_roundtrip():
    labels = np.array([0, 1, 2, 4, 1, 0], dtype=np.int32)
    regions = np.asarray(labels_to_regions(jnp.asarray(labels)))
    # WT fires for 1,2,4; TC for 1,4; ET for 4
    np.testing.assert_array_equal(regions[:, 0], [0, 1, 1, 1, 1, 0])
    np.testing.assert_array_equal(regions[:, 1], [0, 1, 0, 1, 1, 0])
    np.testing.assert_array_equal(regions[:, 2], [0, 0, 0, 1, 0, 0])
    back = np.asarray(regions_to_labels(jnp.asarray(regions)))
    np.testing.assert_array_equal(back, labels)


def test_soft_dice_perfect_and_worst():
    y = jnp.zeros((1, 4, 4, 4, 3)).at[:, :2].set(1.0)
    assert float(soft_dice_loss(y, y)) < 1e-6
    # disjoint prediction → dice ≈ 0 → loss ≈ 1 (up to smoothing)
    p = 1.0 - y
    assert float(soft_dice_loss(p, y)) > 0.98


def test_soft_dice_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    p = rng.random((2, 3, 3, 3, 3)).astype(np.float32)
    y = (rng.random((2, 3, 3, 3, 3)) > 0.5).astype(np.float32)
    got = float(soft_dice_loss(jnp.asarray(p), jnp.asarray(y)))
    pf = p.reshape(2, -1, 3)
    yf = y.reshape(2, -1, 3)
    inter = (pf * yf).sum(1)
    dice = (2 * inter + 1.0) / (pf.sum(1) + yf.sum(1) + 1.0)
    np.testing.assert_allclose(got, (1 - dice).mean(), rtol=1e-5)


def test_dice_ce_loss_finite_and_ordered():
    rng = np.random.default_rng(1)
    y = (rng.random((2, 4, 4, 4, 3)) > 0.5).astype(np.float32)
    good = jnp.asarray(20.0 * (y - 0.5))  # confident correct logits
    bad = -good
    lg = float(dice_ce_loss(good, jnp.asarray(y)))
    lb = float(dice_ce_loss(bad, jnp.asarray(y)))
    assert np.isfinite(lg) and np.isfinite(lb) and lg < lb


def test_region_dice_empty_convention():
    pred = jnp.zeros((10, 3))
    true = jnp.zeros((10, 3))
    np.testing.assert_allclose(np.asarray(region_dice(pred, true)), [1.0, 1.0, 1.0])


def test_region_dice_known_value():
    pred = jnp.zeros((8, 3)).at[:4, 0].set(1.0)
    true = jnp.zeros((8, 3)).at[2:6, 0].set(1.0)
    d = np.asarray(region_dice(pred, true))
    np.testing.assert_allclose(d[0], 0.5, atol=1e-5)  # |∩|=2, 2*2/(4+4)
    np.testing.assert_allclose(d[1:], [1.0, 1.0])


def test_softmax_class_mode_loss_and_mapping():
    from nas_3d_unet_tpu.metrics.dice import (
        class_indices_to_labels,
        labels_to_class_indices,
        softmax_dice_ce_loss,
    )

    labels = jnp.asarray(np.array([0, 1, 2, 4], dtype=np.int32))
    idx = labels_to_class_indices(labels)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(class_indices_to_labels(idx)),
                                  np.asarray(labels))

    rng = np.random.default_rng(0)
    y = rng.integers(0, 4, (2, 4, 4, 4)).astype(np.int32)
    good = jnp.asarray(20.0 * np.eye(4, dtype=np.float32)[y] - 10.0)
    bad = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 4)).astype(np.float32))
    lg = float(softmax_dice_ce_loss(good, jnp.asarray(y)))
    lb = float(softmax_dice_ce_loss(bad, jnp.asarray(y)))
    assert np.isfinite(lg) and np.isfinite(lb) and lg < lb


def test_class_mode_patient_cache(tmp_path):
    from tests.helpers import write_synthetic_h5
    from nas_3d_unet_tpu.data.pipeline import PatchGenerator, PatientCache

    paths = write_synthetic_h5(str(tmp_path), n_patients=1)
    cache = PatientCache(paths, label_mode="classes")
    # compact storage (round-5): raw uint8 BraTS labels in RAM...
    lab = cache.records[0]["label_u8"]
    assert lab.dtype == np.uint8 and set(np.unique(lab)).issubset({0, 1, 2, 4})
    # ...but batches still deliver int32 class indices {0,1,2,3}
    _, y = PatchGenerator(cache, (8, 8, 8), 2, seed=0, augment=False).next()
    assert y.dtype == np.int32 and set(np.unique(y)).issubset({0, 1, 2, 3})
    # legacy storage keeps the old full-volume int32 encoding
    legacy = PatientCache(paths, label_mode="classes", compact=False)
    lab = legacy.records[0]["label"]
    assert lab.dtype == np.int32 and set(np.unique(lab)).issubset({0, 1, 2, 3})
