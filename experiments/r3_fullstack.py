"""Full-stack hardware validation on the real chip (round 3).

Runs the shipped CLI pipeline — preprocess → search → train → predict —
on a synthetic BraTS-like dataset with the ROUND-3 SHIPPED DEFAULTS
(lane-packed execution, bf16 body, remat off, on-device label decode),
at chip-meaningful sizes (32³ patches, ~(80,96,64) volumes), on whatever
platform jax selects (axon TPU here).  Mirrors tests/test_cli.py but at
hardware scale; prints per-stage wall seconds and the CLI's JSON events.

Usage:  python experiments/r3_fullstack.py [workdir]
"""

import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nas_3d_unet_tpu.cli import main
from nas_3d_unet_tpu.io.nifti import write_nifti


def write_raw(root: str, n: int = 3, shape=(80, 96, 64)) -> None:
    rng = np.random.default_rng(0)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    for i in range(n):
        name = f"BraTS19_fs_{i}"
        pdir = os.path.join(root, "HGG" if i % 2 == 0 else "LGG", name)
        os.makedirs(pdir, exist_ok=True)
        c = [int(rng.integers(s // 3, 2 * s // 3)) for s in shape]
        r = min(shape) // 4
        mask = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2 < r * r
        inner = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2 < (r - 3) ** 2
        blob = mask.astype(np.float32)
        for mod in ("t1", "t1ce", "t2", "flair"):
            vol = rng.random(shape).astype(np.float32) * 0.2 + 0.1
            if mod == "t1ce":
                vol = vol + blob
            write_nifti(os.path.join(pdir, f"{name}_{mod}.nii.gz"), vol)
        seg = np.zeros(shape, np.uint8)
        seg[mask] = 2
        seg[inner] = 4
        write_nifti(os.path.join(pdir, f"{name}_seg.nii.gz"), seg)


def build_config(wd: str) -> str:
    # Shipped defaults (config.yml / utils/config.py) except sized down to a
    # few minutes of chip time: packed=true, bf16 body, remat=false, fp32
    # head/loss/stitch, device label decode.
    cfg = {
        "data": {
            "raw_dir": os.path.join(wd, "raw"),
            "processed_dir": os.path.join(wd, "h5"),
            "patch_size": [32, 32, 32],
            "batch_size": 1,
            "val_fraction": 0.34,
        },
        "model": {"base_channels": 16, "depth": 3, "n_nodes": 3,
                  "gn_groups": 8, "dtype": "bfloat16", "remat": False},
        "search": {"epochs": 1, "steps_per_epoch": 6, "warmup_epochs": 0,
                   "checkpoint_dir": os.path.join(wd, "ckpt_search")},
        "train": {"epochs": 2, "steps_per_epoch": 10,
                  "checkpoint_dir": os.path.join(wd, "ckpt_train"),
                  "genotype_path": os.path.join(wd, "ckpt_search", "genotype.json")},
        "infer": {"patch_size": [32, 32, 32], "overlap": 0.5, "batch_size": 1,
                  "output_dir": os.path.join(wd, "pred"),
                  "checkpoint_dir": os.path.join(wd, "ckpt_train")},
        "parallel": {"data_parallel": 1, "spatial_parallel": 1},
    }
    path = os.path.join(wd, "config.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def run() -> int:
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_fullstack"
    os.makedirs(wd, exist_ok=True)
    write_raw(os.path.join(wd, "raw"))
    cfg = build_config(wd)
    for stage in ("preprocess", "search", "train", "predict"):
        t0 = time.perf_counter()
        rc = main([stage, "-c", cfg])
        dt = time.perf_counter() - t0
        print(f"[r3_fullstack] {stage}: rc={rc} wall={dt:.1f}s", flush=True)
        if rc != 0:
            return rc
    outs = sorted(os.listdir(os.path.join(wd, "pred")))
    print(f"[r3_fullstack] predictions: {outs}")
    assert outs and all(o.endswith(".nii.gz") for o in outs)
    print("[r3_fullstack] GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(run())
