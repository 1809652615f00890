"""Calibration for the searched-genotype quality loop (round-5 VERDICT #3).

Closes the NAS pipeline's actual product question: is the genotype that
bilevel search EMITS a good architecture to train?  Flow (CPU):

  shifted-blob task --search--> genotype_sig --retrain--> dice_sig
  noise control     --search--> genotype_ctl --retrain ON SIGNAL--> dice_ctl

The shift task is learnable only through conv-family candidates
(tests/helpers.write_shifted_h5), so a signal-searched genotype should
carry the convs needed to model the +3-voxel offset, while the
noise-searched genotype drifts toward parameter-free ops and should
underperform when retrained on the same signal task with the same budget.

Run:  python experiments/r5_searched_genotype.py
Prints calibration numbers for tests/test_searched_genotype.py thresholds.
"""

import json
import os
import sys
import tempfile
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nas_3d_unet_tpu.data.pipeline import split_patients
from nas_3d_unet_tpu.infer.predict import predict_patient
from nas_3d_unet_tpu.infer.sliding import SlidingWindowPredictor
from nas_3d_unet_tpu.models.unet import DerivedNet, SuperNet
from nas_3d_unet_tpu.search.bilevel import Searcher
from nas_3d_unet_tpu.train.loop import Trainer
from nas_3d_unet_tpu.utils.config import load_config
from tests.helpers import write_shifted_h5

CONV_FAMILY = {"conv3", "dil_conv3", "sep_conv3",
               "down_conv3", "down_dil_conv3", "down_sep_conv3",
               "up_transpose", "up_conv3", "up_sep_conv3"}


def search_genotype(paths, ckpt_dir, seed=0):
    cfg = load_config(None, overrides={
        "data.patch_size": (12, 12, 12), "data.batch_size": 2,
        "data.val_fraction": 0.25, "model.base_channels": 4,
        "model.depth": 2, "model.n_nodes": 2, "model.gn_groups": 4,
        "model.dtype": "float32", "model.remat": False,
        "search.alpha_lr": 3e-2, "search.warmup_epochs": 1,
        "search.val_steps": 1, "search.checkpoint_dir": ckpt_dir,
        "search.seed": seed,
    })
    net = SuperNet(in_channels=4, num_classes=3, base_channels=4, depth=2,
                   n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")
    searcher = Searcher(net, cfg, paths, device_augment=False)
    _, genotype = searcher.search(epochs=4, steps_per_epoch=20)
    return genotype


def retrain_and_score(genotype, paths, ckpt_dir, epochs=3, steps=40):
    cfg = load_config(None, overrides={
        "data.patch_size": (12, 12, 12), "data.batch_size": 2,
        "data.val_fraction": 0.25, "model.base_channels": 8,
        "model.depth": 2, "model.n_nodes": 2, "model.gn_groups": 4,
        "model.dtype": "float32", "model.remat": False,
        # zero augmentation: flips would randomize the shift direction the
        # architecture has to express
        "data.flip_prob": 0.0, "data.intensity_shift": 0.0,
        "data.intensity_scale": 0.0,
        "train.lr": 3e-3, "train.checkpoint_dir": ckpt_dir, "train.seed": 0,
    })
    net = DerivedNet(genotype=genotype, in_channels=4, num_classes=3,
                     base_channels=8, depth=2, n_nodes=2, gn_groups=4,
                     remat=False, dtype_name="float32")
    trainer = Trainer(net, cfg, paths, device_augment=True)
    state = trainer.train(epochs=epochs, steps_per_epoch=steps, val_steps=2)
    _, val_paths = split_patients(paths, cfg.data.val_fraction, cfg.data.seed)
    predictor = SlidingWindowPredictor(net.apply, state.params, (12, 12, 12),
                                       overlap=0.5, batch_size=2, num_classes=3)
    dices = [predict_patient(predictor, p)["dice"] for p in val_paths]
    # WT alone saturates for ANY conv-bearing genotype (r5 calibration:
    # 0.854 sig vs 0.836 ctl); the architecture-sensitive signal is in the
    # finer regions (patch-val ET gap ~0.2), so score all three.
    per = {k: float(np.mean([d[k] for d in dices])) for k in ("WT", "TC", "ET")}
    per["mean"] = float(np.mean([per["WT"], per["TC"], per["ET"]]))
    return per


def conv_count(genotype):
    ops = [op for node in genotype.down + genotype.up for _, op in node]
    return sum(op in CONV_FAMILY for op in ops), len(ops)


def main():
    tmp = tempfile.mkdtemp()
    t0 = time.time()
    sig_paths = write_shifted_h5(os.path.join(tmp, "h5_sig"))
    ctl_paths = write_shifted_h5(os.path.join(tmp, "h5_ctl"), noise=True)

    g_sig = search_genotype(sig_paths, os.path.join(tmp, "ck_ssig"))
    t1 = time.time()
    g_ctl = search_genotype(ctl_paths, os.path.join(tmp, "ck_sctl"))
    t2 = time.time()
    print("genotype_sig:", g_sig.to_dict() if hasattr(g_sig, "to_dict") else g_sig)
    print("genotype_ctl:", g_ctl.to_dict() if hasattr(g_ctl, "to_dict") else g_ctl)
    print("conv_count sig:", conv_count(g_sig), "ctl:", conv_count(g_ctl))

    d_sig = retrain_and_score(g_sig, sig_paths, os.path.join(tmp, "ck_tsig"))
    t3 = time.time()
    d_ctl = retrain_and_score(g_ctl, sig_paths, os.path.join(tmp, "ck_tctl"))
    t4 = time.time()

    print(json.dumps({
        "dice_sig_genotype": d_sig,
        "dice_ctl_genotype": d_ctl,
        "conv_sig": conv_count(g_sig)[0], "conv_ctl": conv_count(g_ctl)[0],
        "t_search_sig": round(t1 - t0, 1), "t_search_ctl": round(t2 - t1, 1),
        "t_retrain_sig": round(t3 - t2, 1), "t_retrain_ctl": round(t4 - t3, 1),
    }))


def quick():
    """Retrain-only recalibration: reuse the r5 calibrated genotypes (the
    searches are deterministic at fixed seed — see the full run's output)
    and re-score with per-region dice.  ~2.5 min instead of ~10."""
    from nas_3d_unet_tpu.models.genotype import Genotype

    g_sig = Genotype(n_nodes=2,
                     down=((("in1", "down_max_pool"), ("in0", "down_max_pool")),
                           (("in0", "down_sep_conv3"), ("in1", "down_conv3"))),
                     up=((("below", "up_conv3"), ("skip", "sep_conv3")),
                         (("below", "up_sep_conv3"), ("skip", "max_pool3"))))
    g_ctl = Genotype(n_nodes=2,
                     down=((("in1", "down_sep_conv3"), ("in0", "down_avg_pool")),
                           (("in0", "down_sep_conv3"), ("in1", "down_max_pool"))),
                     up=((("below", "up_sep_conv3"), ("skip", "max_pool3")),
                         (("skip", "max_pool3"), ("below", "up_conv3"))))
    tmp = tempfile.mkdtemp()
    sig_paths = write_shifted_h5(os.path.join(tmp, "h5_sig"))
    d_sig = retrain_and_score(g_sig, sig_paths, os.path.join(tmp, "ck_tsig"))
    d_ctl = retrain_and_score(g_ctl, sig_paths, os.path.join(tmp, "ck_tctl"))
    print(json.dumps({"dice_sig_genotype": d_sig, "dice_ctl_genotype": d_ctl}))


if __name__ == "__main__" and "--quick" in sys.argv:
    quick()
    sys.exit(0)


if __name__ == "__main__":
    main()
