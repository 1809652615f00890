"""End-to-end: synthetic NIfTI patient → preprocess → sliding-window predict
→ uncropped BraTS-label NIfTI output + per-region dice."""

import jax
import numpy as np

from nas_3d_unet_tpu.data.preprocess import preprocess_patient
from nas_3d_unet_tpu.infer.predict import predict_patient
from nas_3d_unet_tpu.infer.sliding import SlidingWindowPredictor
from nas_3d_unet_tpu.io.nifti import read_nifti, write_nifti
from nas_3d_unet_tpu.models.genotype import init_alphas, parse_alphas
from nas_3d_unet_tpu.models.unet import DerivedNet


def _make_patient(tmp_path, name="BraTS19_e2e_1", shape=(28, 24, 20)):
    rng = np.random.default_rng(7)
    pdir = tmp_path / name
    pdir.mkdir(parents=True)
    for mod in ("t1", "t1ce", "t2", "flair"):
        vol = np.zeros(shape, dtype=np.float32)
        vol[2:26, 2:22, 2:18] = rng.random((24, 20, 16)).astype(np.float32) + 0.5
        write_nifti(str(pdir / f"{name}_{mod}.nii.gz"), vol)
    seg = np.zeros(shape, dtype=np.uint8)
    seg[10:16, 8:14, 6:12] = 2
    seg[12:14, 10:12, 8:10] = 4
    write_nifti(str(pdir / f"{name}_seg.nii.gz"), seg)
    return pdir


def test_predict_patient_end_to_end(tmp_path):
    pdir = _make_patient(tmp_path)
    h5_path = str(tmp_path / "p.h5")
    preprocess_patient(str(pdir), h5_path)

    geno = parse_alphas(init_alphas(jax.random.PRNGKey(0), 2), 2)
    net = DerivedNet(genotype=geno, in_channels=4, num_classes=3, base_channels=4,
                     depth=2, n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")
    x0 = np.zeros((1, 8, 8, 8, 4), np.float32)
    params = net.init(jax.random.PRNGKey(1), x0)

    predictor = SlidingWindowPredictor(net.apply, params, patch_size=(8, 8, 8),
                                       overlap=0.5, batch_size=4, num_classes=3)
    res = predict_patient(predictor, h5_path, out_dir=str(tmp_path / "out"))

    assert "dice" in res and set(res["dice"]) == {"WT", "TC", "ET"}
    assert all(0.0 <= v <= 1.0 for v in res["dice"].values())
    out = read_nifti(res["output"])
    # original (uncropped) geometry, BraTS label alphabet
    assert out.data.shape == (28, 24, 20)
    assert set(np.unique(out.data)).issubset({0, 1, 2, 4})
    assert res["seconds"] > 0


def test_predict_dataset_prefetched_matches_sequential(tmp_path):
    # the double-buffered (look-ahead) patient loop must be bit-identical to
    # per-patient sequential prediction, and device-resident input volumes
    # must stitch bit-identically to numpy inputs
    import jax.numpy as jnp

    from nas_3d_unet_tpu.data.preprocess import load_patient_h5
    from nas_3d_unet_tpu.infer.predict import predict_dataset

    h5dir = tmp_path / "h5"
    h5dir.mkdir()
    for i in range(3):
        pdir = _make_patient(tmp_path, name=f"BraTS19_pf_{i}",
                             shape=(28 - i, 24, 20 + i))
        preprocess_patient(str(pdir), str(h5dir / f"p{i}.h5"))

    geno = parse_alphas(init_alphas(jax.random.PRNGKey(0), 2), 2)
    net = DerivedNet(genotype=geno, in_channels=4, num_classes=3, base_channels=4,
                     depth=2, n_nodes=2, gn_groups=4, remat=False,
                     dtype_name="float32")
    params = net.init(jax.random.PRNGKey(1), np.zeros((1, 8, 8, 8, 4), np.float32))
    predictor = SlidingWindowPredictor(net.apply, params, patch_size=(8, 8, 8),
                                       overlap=0.5, batch_size=4, num_classes=3)

    results = predict_dataset(predictor, str(h5dir), out_dir=str(tmp_path / "o1"))
    assert len(results) == 3
    for i, res in enumerate(results):
        seq = predict_patient(predictor, str(h5dir / f"p{i}.h5"),
                              out_dir=str(tmp_path / "o2"))
        a = read_nifti(res["output"]).data
        b = read_nifti(seq["output"]).data
        np.testing.assert_array_equal(a, b)

    # device-resident volume == numpy volume, bitwise
    rec = load_patient_h5(str(h5dir / "p0.h5"))
    p_np = predictor.predict_volume(rec["image"])
    p_dev = predictor.predict_volume(jax.device_put(
        np.ascontiguousarray(rec["image"], np.float32)))
    np.testing.assert_array_equal(p_np, p_dev)
