"""Proof the stack LEARNS (VERDICT r3 #1; SURVEY.md §4 integration bullet:
"Dice on a learnable synthetic task exceeds threshold").

Two levels:
  * Trainer-level: train a tiny derived net on the designed-learnable blob
    task and assert whole-volume sliding-window WT dice on a HELD-OUT
    patient exceeds 0.7 — segmentation quality, not mechanics.
  * CLI-level: the shipped preprocess→train→predict surface reaches the
    same bar, asserted on the `predict_done` mean_dice event.

These are the only quality evidence this environment allows (no BraTS data,
empty reference mount — SURVEY.md §0/§6); the chip-scale twin lives in
experiments/r4_learn_chip.py with its result recorded in BASELINE.md.
"""

import json

import jax
import numpy as np

from nas_3d_unet_tpu.data.pipeline import split_patients
from nas_3d_unet_tpu.infer.predict import predict_patient
from nas_3d_unet_tpu.infer.sliding import SlidingWindowPredictor
from nas_3d_unet_tpu.models.genotype import default_genotype
from nas_3d_unet_tpu.models.unet import DerivedNet
from nas_3d_unet_tpu.train.loop import Trainer
from nas_3d_unet_tpu.utils.config import load_config
from tests.helpers import write_learnable_h5

DICE_WT_THRESHOLD = 0.7


def _learn_net():
    return DerivedNet(genotype=default_genotype(2), in_channels=4,
                      num_classes=3, base_channels=8, depth=2, n_nodes=2,
                      gn_groups=4, remat=False, dtype_name="float32")


def test_trainer_learns_to_segment(tmp_path):
    paths = write_learnable_h5(str(tmp_path / "h5"), n_patients=4)
    cfg = load_config(None, overrides={
        "data.patch_size": (16, 16, 16), "data.batch_size": 2,
        "data.val_fraction": 0.25, "model.base_channels": 8,
        "model.depth": 2, "model.n_nodes": 2, "model.gn_groups": 4,
        "model.dtype": "float32", "model.remat": False,
        "train.lr": 3e-3, "train.checkpoint_dir": str(tmp_path / "ckpt"),
        "train.seed": 0,
    })
    net = _learn_net()
    trainer = Trainer(net, cfg, paths, log_path=str(tmp_path / "log.jsonl"))
    state = trainer.train(epochs=3, steps_per_epoch=40, val_steps=2)

    # Whole-volume prediction on the HELD-OUT patient (same split the
    # Trainer used), scored per BraTS region.
    _, val_paths = split_patients(paths, cfg.data.val_fraction, cfg.data.seed)
    assert val_paths, "split must hold out at least one patient"
    predictor = SlidingWindowPredictor(net.apply, state.params, (16, 16, 16),
                                       overlap=0.5, batch_size=2, num_classes=3)
    dices = [predict_patient(predictor, p)["dice"] for p in val_paths]
    wt = float(np.mean([d["WT"] for d in dices]))
    tc = float(np.mean([d["TC"] for d in dices]))
    assert wt >= DICE_WT_THRESHOLD, (wt, dices)
    # the enhancing core is also learnable (it has its own t1ce signature)
    assert tc >= 0.5, (tc, dices)


def test_cli_learns_to_segment(tmp_path, capsys):
    """CLI-level variant: preprocess → train (default genotype) → predict
    must report predict_done.mean_dice.WT above threshold."""
    import yaml

    from nas_3d_unet_tpu.cli import main
    from nas_3d_unet_tpu.io.nifti import write_nifti

    # raw NIfTI dataset with the same designed-learnable two-modality signal
    shape = (28, 28, 28)
    rng = np.random.default_rng(0)
    zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
    for i in range(3):
        name = f"BraTS19_learn_{i}"
        pdir = tmp_path / "raw" / ("HGG" if i % 2 == 0 else "LGG") / name
        pdir.mkdir(parents=True)
        c = [int(rng.integers(2 * s // 5, 3 * s // 5)) for s in shape]
        r = min(shape) // 3
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        blob = (d2 < r * r).astype(np.float32)
        core = (d2 < (r - 3) ** 2).astype(np.float32)
        for m, mod in enumerate(("t1", "t1ce", "t2", "flair")):
            v = rng.random(shape).astype(np.float32) * 0.2 + 0.1
            if mod == "t1ce":
                v = v + 1.0 * blob + 0.5 * core
            elif mod == "flair":
                v = v + 0.8 * blob
            write_nifti(str(pdir / f"{name}_{mod}.nii.gz"), v)
        seg = np.zeros(shape, np.uint8)
        seg[blob > 0] = 2
        seg[core > 0] = 4
        write_nifti(str(pdir / f"{name}_seg.nii.gz"), seg)

    cfg = {
        "data": {"raw_dir": str(tmp_path / "raw"),
                 "processed_dir": str(tmp_path / "h5"),
                 "patch_size": [16, 16, 16], "batch_size": 2,
                 "val_fraction": 0.34},
        "model": {"base_channels": 8, "depth": 2, "n_nodes": 2,
                  "gn_groups": 4, "dtype": "float32", "remat": False},
        "train": {"epochs": 3, "steps_per_epoch": 40, "lr": 3e-3,
                  "checkpoint_dir": str(tmp_path / "ckpt_train"),
                  "genotype_path": str(tmp_path / "nonexistent.json")},
        "infer": {"patch_size": [16, 16, 16], "overlap": 0.5, "batch_size": 2,
                  "output_dir": str(tmp_path / "pred"),
                  "checkpoint_dir": str(tmp_path / "ckpt_train")},
        "parallel": {"data_parallel": 1, "spatial_parallel": 1},
    }
    cfg_path = tmp_path / "config.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    assert main(["preprocess", "-c", str(cfg_path)]) == 0
    assert main(["train", "-c", str(cfg_path)]) == 0
    assert main(["predict", "-c", str(cfg_path)]) == 0

    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    done = [json.loads(l) for l in lines if '"predict_done"' in l]
    assert done and "mean_dice" in done[-1], lines
    assert done[-1]["mean_dice"]["WT"] >= DICE_WT_THRESHOLD, done[-1]
