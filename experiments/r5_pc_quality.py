"""Round-5 partial-channel search QUALITY calibration.

Runs the signal-vs-noise contrast harness (tests/test_search_quality.py
design: shifted-blob task learnable only through conv-family candidates,
vs an unlearnable noise control) with search.partial_channels = K and
prints the contrast numbers, so the pc quality test's thresholds are
calibrated measurements, not guesses:

    python experiments/r5_pc_quality.py           # K from PC_K (default 2)

PC-DARTS' published caveat is that channel sampling makes the α signal
noisier (they add edge-normalization β, which we deliberately do NOT —
parsing stays reference top-2-by-α); this measures how much signal
survives at our scale.
"""

import json
import os
import sys
import tempfile

import jax

jax.config.update("jax_platforms", os.environ.get("PLAT", "cpu"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tests.helpers import write_shifted_h5
from tests.test_search_quality import CONV_FAMILY, _conv_mass, _none_mass
from nas_3d_unet_tpu.models.unet import SuperNet
from nas_3d_unet_tpu.search.bilevel import Searcher
from nas_3d_unet_tpu.utils.config import load_config


def run_search(paths, ckpt_dir, pc_k: int):
    cfg = load_config(None, overrides={
        "data.patch_size": (12, 12, 12), "data.batch_size": 2,
        "data.val_fraction": 0.25, "model.base_channels": 4,
        "model.depth": 2, "model.n_nodes": 2, "model.gn_groups": 4,
        "model.dtype": "float32", "model.remat": False,
        "search.alpha_lr": 3e-2,            # same harness rationale
        "search.warmup_epochs": 1, "search.val_steps": 1,
        "search.partial_channels": pc_k,
        "search.checkpoint_dir": ckpt_dir, "search.seed": 0,
    })
    net = SuperNet(in_channels=4, num_classes=3, base_channels=4, depth=2,
                   n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")
    log = ckpt_dir + ".log.jsonl"
    searcher = Searcher(net, cfg, paths, log_path=log, device_augment=False)
    state, genotype = searcher.search(epochs=4, steps_per_epoch=20)
    with open(log) as f:
        recs = [json.loads(l) for l in f if '"epoch"' in l]
    best_dice = max((r.get("dice_wt", 0.0) for r in recs), default=0.0)
    return dict(alphas=jax.device_get(state.alphas), genotype=genotype,
                best_dice=float(best_dice))


def main():
    pc_k = int(os.environ.get("PC_K", "2"))
    with tempfile.TemporaryDirectory() as td:
        sig = run_search(write_shifted_h5(os.path.join(td, "h5_sig")),
                         os.path.join(td, "ck_sig"), pc_k)
        ctl = run_search(write_shifted_h5(os.path.join(td, "h5_ctl"), noise=True),
                         os.path.join(td, "ck_ctl"), pc_k)
    g = sig["genotype"]
    ops = [op for node in g.down + g.up for _, op in node]
    print(json.dumps({
        "pc_k": pc_k,
        "conv_mass_signal": round(_conv_mass(sig["alphas"]), 4),
        "conv_mass_noise": round(_conv_mass(ctl["alphas"]), 4),
        "none_mass_signal": round(_none_mass(sig["alphas"]), 4),
        "none_mass_noise": round(_none_mass(ctl["alphas"]), 4),
        "best_wt_dice_signal": round(sig["best_dice"], 4),
        "best_wt_dice_noise": round(ctl["best_dice"], 4),
        "genotype_conv_ops_signal": sum(op in CONV_FAMILY for op in ops),
        "genotype_n_ops": len(ops),
    }, indent=2))


if __name__ == "__main__":
    main()
