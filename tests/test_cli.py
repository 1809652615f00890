"""CLI integration: preprocess → search → train → predict, via the argparse
surface with a YAML config (the reference's four entry scripts, SURVEY.md §1)."""

import json
import os

import numpy as np
import yaml

from nas_3d_unet_tpu.cli import main
from nas_3d_unet_tpu.io.nifti import write_nifti


def _write_raw(tmp_path, n=2, shape=(20, 18, 16)):
    rng = np.random.default_rng(0)
    for i in range(n):
        name = f"BraTS19_cli_{i}"
        pdir = tmp_path / "raw" / ("HGG" if i % 2 == 0 else "LGG") / name
        pdir.mkdir(parents=True)
        blob = np.zeros(shape, np.float32)
        c = [s // 2 for s in shape]
        zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
        mask = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2 < 16
        blob[mask] = 1.0
        for mod in ("t1", "t1ce", "t2", "flair"):
            vol = rng.random(shape).astype(np.float32) * 0.2 + 0.1
            if mod == "t1ce":
                vol = vol + blob
            write_nifti(str(pdir / f"{name}_{mod}.nii.gz"), vol)
        seg = np.zeros(shape, np.uint8)
        seg[mask] = 2
        write_nifti(str(pdir / f"{name}_seg.nii.gz"), seg)


def _config(tmp_path):
    cfg = {
        "data": {
            "raw_dir": str(tmp_path / "raw"),
            "processed_dir": str(tmp_path / "h5"),
            "patch_size": [8, 8, 8],
            "batch_size": 2,
            "val_fraction": 0.5,
        },
        "model": {"base_channels": 4, "depth": 2, "n_nodes": 2, "gn_groups": 4,
                  "dtype": "float32", "remat": False},
        "search": {"epochs": 1, "steps_per_epoch": 2, "warmup_epochs": 0,
                   "checkpoint_dir": str(tmp_path / "ckpt_search")},
        "train": {"epochs": 1, "steps_per_epoch": 2,
                  "checkpoint_dir": str(tmp_path / "ckpt_train"),
                  "genotype_path": str(tmp_path / "ckpt_search" / "genotype.json")},
        "infer": {"patch_size": [8, 8, 8], "overlap": 0.5, "batch_size": 2,
                  "output_dir": str(tmp_path / "pred"),
                  "checkpoint_dir": str(tmp_path / "ckpt_train")},
        "parallel": {"data_parallel": 1, "spatial_parallel": 1},
    }
    path = tmp_path / "config.yml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_cli_full_pipeline(tmp_path, capsys):
    _write_raw(tmp_path)
    cfg = _config(tmp_path)

    assert main(["preprocess", "-c", cfg]) == 0
    assert len(os.listdir(tmp_path / "h5")) == 2

    assert main(["search", "-c", cfg]) == 0
    assert (tmp_path / "ckpt_search" / "genotype.json").exists()

    assert main(["train", "-c", cfg]) == 0
    assert (tmp_path / "ckpt_train" / "best.msgpack").exists()

    assert main(["predict", "-c", cfg, "-o", "infer.overlap=0.25"]) == 0
    outs = os.listdir(tmp_path / "pred")
    assert len(outs) == 2 and all(o.endswith(".nii.gz") for o in outs)

    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    events = [json.loads(l).get("event") for l in lines]
    for ev in ("preprocess_done", "search_done", "train_done", "predict_done"):
        assert ev in events, events


def test_cli_override_types(tmp_path):
    _write_raw(tmp_path, n=1)
    cfg = _config(tmp_path)
    # tuple / float / string overrides parse via literal_eval
    assert main(["preprocess", "-c", cfg,
                 "-o", "data.patch_size=(8,8,8)", "-o", "data.val_fraction=0.3"]) == 0


def test_cli_predict_sharded_bitexact(tmp_path, capsys):
    # cmd_predict builds the mesh from parallel.*: DP patch batches + the
    # spatial (CP-analog) volume sharding must produce bit-identical NIfTI
    # outputs to the unsharded run (round-3 VERDICT #5)
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs fake multi-device mesh")
    from nas_3d_unet_tpu.io.nifti import read_nifti

    _write_raw(tmp_path)
    cfg = _config(tmp_path)
    assert main(["preprocess", "-c", cfg]) == 0
    assert main(["train", "-c", cfg]) == 0  # default genotype fallback

    out_a = str(tmp_path / "pred_unsharded")
    assert main(["predict", "-c", cfg, "-o", f"infer.output_dir={out_a}"]) == 0

    out_b = str(tmp_path / "pred_sharded")
    assert main(["predict", "-c", cfg, "-o", f"infer.output_dir={out_b}",
                 "-o", "parallel.data_parallel=2",
                 "-o", "parallel.spatial_parallel=2"]) == 0

    names = sorted(os.listdir(out_a))
    assert names == sorted(os.listdir(out_b)) and names
    for n in names:
        a = read_nifti(os.path.join(out_a, n)).data
        b = read_nifti(os.path.join(out_b, n)).data
        np.testing.assert_array_equal(a, b)
