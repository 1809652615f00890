"""Chip-scale searched-genotype run (round 5; VERDICT r4 #3 'a chip-scale
twin recorded in BASELINE.md').

Same conv-only-fittable shift task as tests/test_searched_genotype.py but
at chip-meaningful sizes and the SHIPPED defaults (packed execution, bf16
body, remat off, fp32 head/loss/stitch, device label decode), through the
CLI end to end:

    preprocess -> search (bilevel DARTS, emits genotype.json)
               -> train (DerivedNet built from THAT genotype)
               -> predict -> whole-volume region dice vs ground truth.

The label blob is the t1ce blob shifted by +6 voxels on every axis, so
parameter-free candidates (zero-phase operators) cannot express it alone —
the searched genotype must carry conv-family ops, and training it must
reach the dice bar.  The CPU suite twin (tests/test_searched_genotype.py)
additionally proves the CONTRAST against a noise-searched genotype; this
run proves the same pipeline at chip scale.

Usage:  python experiments/r5_genotype_chip.py [workdir]
"""

import json
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nas_3d_unet_tpu.cli import main
from nas_3d_unet_tpu.io.nifti import write_nifti

SHIFT = 6
CONV_FAMILY = {"conv3", "dil_conv3", "sep_conv3",
               "down_conv3", "down_dil_conv3", "down_sep_conv3",
               "up_transpose", "up_conv3", "up_sep_conv3"}


def write_raw(root: str, n: int = 4, shape=(96, 112, 80), seed=0) -> None:
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    for i in range(n):
        name = f"BraTS19_shift_{i}"
        pdir = os.path.join(root, "HGG" if i % 2 == 0 else "LGG", name)
        os.makedirs(pdir, exist_ok=True)
        # center placed so BOTH the blob and its +SHIFT image fit
        r = min(shape) // 4
        c = [int(rng.integers(r + 2, s - r - SHIFT - 2)) for s in shape]
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        blob = (d2 < r * r).astype(np.float32)
        d2s = ((zz - c[0] - SHIFT) ** 2 + (yy - c[1] - SHIFT) ** 2
               + (xx - c[2] - SHIFT) ** 2)
        sblob = d2s < r * r
        score = d2s < (r - 6) ** 2
        for m, mod in enumerate(("t1", "t1ce", "t2", "flair")):
            vol = rng.random(shape).astype(np.float32) * 0.2 + 0.1
            if mod == "t1ce":  # t1ce carries the UNSHIFTED blob
                vol = vol + 1.0 * blob
            write_nifti(os.path.join(pdir, f"{name}_{mod}.nii.gz"), vol)
        seg = np.zeros(shape, np.uint8)
        seg[sblob] = 2
        seg[score] = 4
        write_nifti(os.path.join(pdir, f"{name}_seg.nii.gz"), seg)


def build_config(wd: str) -> str:
    # shipped flagship defaults sized to minutes of chip time; NO
    # augmentation — flips would randomize the shift direction the searched
    # architecture has to express (same rationale as the CPU twin)
    cfg = {
        "data": {
            "raw_dir": os.path.join(wd, "raw"),
            "processed_dir": os.path.join(wd, "h5"),
            "patch_size": [64, 64, 64],
            "batch_size": 1,
            "val_fraction": 0.25,
            "flip_prob": 0.0, "intensity_shift": 0.0, "intensity_scale": 0.0,
        },
        "model": {"base_channels": 16, "depth": 3, "n_nodes": 3,
                  "gn_groups": 8, "dtype": "bfloat16", "remat": False},
        "search": {"epochs": 5, "steps_per_epoch": 40, "warmup_epochs": 1,
                   "alpha_lr": 3e-2, "val_steps": 2,
                   "checkpoint_dir": os.path.join(wd, "ckpt_search")},
        "train": {"epochs": 4, "steps_per_epoch": 50, "lr": 1e-3,
                  "checkpoint_dir": os.path.join(wd, "ckpt_train"),
                  "genotype_path": os.path.join(wd, "ckpt_search",
                                                "genotype.json")},
        "infer": {"patch_size": [64, 64, 64], "overlap": 0.5, "batch_size": 1,
                  "output_dir": os.path.join(wd, "pred"),
                  "checkpoint_dir": os.path.join(wd, "ckpt_train")},
        "parallel": {"data_parallel": 1, "spatial_parallel": 1},
    }
    path = os.path.join(wd, "config.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def run() -> int:
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5_genotype_chip"
    os.makedirs(wd, exist_ok=True)
    write_raw(os.path.join(wd, "raw"))
    cfg = build_config(wd)
    for stage in ("preprocess", "search", "train", "predict"):
        t0 = time.perf_counter()
        rc = main([stage, "-c", cfg])
        dt = time.perf_counter() - t0
        print(f"[r5_genotype_chip] {stage}: rc={rc} wall={dt:.1f}s", flush=True)
        if rc != 0:
            return rc

    from nas_3d_unet_tpu.models.genotype import Genotype

    genotype = Genotype.load(os.path.join(wd, "ckpt_search", "genotype.json"))
    ops = [op for node in genotype.down + genotype.up for _, op in node]
    n_conv = sum(op in CONV_FAMILY for op in ops)
    print(f"[r5_genotype_chip] genotype: {genotype}  conv_ops={n_conv}/{len(ops)}")

    import glob

    import h5py
    import jax.numpy as jnp

    from nas_3d_unet_tpu.io.nifti import read_nifti
    from nas_3d_unet_tpu.metrics.dice import labels_to_regions, region_dice

    dices = []
    for h5p in sorted(glob.glob(os.path.join(wd, "h5", "*.h5"))):
        with h5py.File(h5p) as f:
            true = np.asarray(f["label"]).astype(np.int32)
            crop = np.asarray(f.attrs["crop_start"])
            pat = f.attrs["patient"]
        pred_full = read_nifti(os.path.join(wd, "pred", pat + ".nii.gz")).data
        s = [int(v) for v in crop]
        pred = pred_full[s[0]:s[0] + true.shape[0], s[1]:s[1] + true.shape[1],
                         s[2]:s[2] + true.shape[2]].astype(np.int32)
        d = np.asarray(region_dice(labels_to_regions(jnp.asarray(pred)),
                                   labels_to_regions(jnp.asarray(true))))
        dices.append(d)
        print(f"[r5_genotype_chip] {pat}: WT={d[0]:.3f} TC={d[1]:.3f} ET={d[2]:.3f}")
    mean = np.mean(dices, axis=0)
    print(json.dumps({"event": "r5_genotype_chip_done", "conv_ops": n_conv,
                      "mean_dice": {"WT": float(mean[0]), "TC": float(mean[1]),
                                    "ET": float(mean[2])}}))
    assert n_conv >= 3, f"searched genotype carries only {n_conv} conv ops"
    assert mean[0] >= 0.7, f"WT dice {mean[0]:.3f} < 0.7"
    print("[r5_genotype_chip] GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(run())
