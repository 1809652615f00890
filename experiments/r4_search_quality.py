"""Prototype for the search-quality test (round 4; VERDICT r3 #2).

Task designed so parameter-free ops CANNOT fit: the label blob is the t1ce
blob spatially shifted by +3 voxels on every axis.  identity / avg / max
pool candidates are symmetric (zero-phase) operators — no stack of them
followed by the 1x1 head can produce a directional offset — while conv
candidates can learn asymmetric taps that encode the shift.  If DARTS
works, alpha mass must migrate off `none`/pool/identity toward the conv
family, entropy must fall, and the parsed genotype must be conv-dominated.

Run on CPU:  python experiments/r4_search_quality.py [epochs steps]
Prints per-epoch alpha diagnostics + the final genotype; the frozen
assertions live in tests/test_search_quality.py.
"""

import json
import os
import sys
import tempfile

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nas_3d_unet_tpu.models.unet import SuperNet
from nas_3d_unet_tpu.search.bilevel import Searcher
from nas_3d_unet_tpu.utils.config import load_config

CONV_FAMILY = {"conv3", "dil_conv3", "sep_conv3",
               "down_conv3", "down_dil_conv3", "down_sep_conv3",
               "up_transpose", "up_conv3", "up_sep_conv3"}


# the dataset writer is shared with the frozen test: tests/helpers.py
from tests.helpers import write_shifted_h5  # noqa: E402


def _softmax(a):
    a = np.asarray(a, np.float64)
    p = np.exp(a - a.max(-1, keepdims=True))
    return p / p.sum(-1, keepdims=True)


def none_mass(alphas):
    """Mean softmax prob of `none` across the NORMAL-op alpha groups."""
    from nas_3d_unet_tpu.ops.primitives import NORMAL_OPS

    k = NORMAL_OPS.index("none")
    return float(np.mean(np.concatenate(
        [_softmax(alphas[n])[:, k] for n in ("down_mid", "up_skip", "up_mid")])))


def group_masses(alphas):
    """Per alpha-group: summed softmax mass on conv-family ops (mean over
    edges), to calibrate which groups carry a robust signal."""
    from nas_3d_unet_tpu.ops.primitives import DOWN_OPS, NORMAL_OPS, UP_OPS

    group_ops = {"down_in": DOWN_OPS, "down_mid": NORMAL_OPS,
                 "up_below": UP_OPS, "up_skip": NORMAL_OPS,
                 "up_mid": NORMAL_OPS}
    out = {}
    for name, ops in group_ops.items():
        idx = [i for i, o in enumerate(ops) if o in CONV_FAMILY]
        out[name] = float(np.mean(_softmax(alphas[name])[:, idx].sum(-1)))
    return out


def conv_count(genotype):
    ops = [op for node in genotype.down + genotype.up for _, op in node]
    return sum(op in CONV_FAMILY for op in ops), len(ops)


def run(epochs=4, steps=20, warmup=1, noise=0):
    wd = tempfile.mkdtemp(prefix="r4sq_")
    paths = write_shifted_h5(os.path.join(wd, "h5"), noise=bool(noise))
    cfg = load_config(None, overrides={
        "data.patch_size": (12, 12, 12), "data.batch_size": 2,
        "data.val_fraction": 0.25, "model.base_channels": 4,
        "model.depth": 2, "model.n_nodes": 2, "model.gn_groups": 4,
        "model.dtype": "float32", "model.remat": False,
        # 10x the default alpha lr: in a ~60-step run the architecture
        # gradient's DIRECTION is the signal under test; the default 3e-3
        # moves alpha by ~1e-3 logits (directionally right but too small to
        # assert robustly across toolchains)
        "search.alpha_lr": 3e-2,
        "search.warmup_epochs": warmup, "search.val_steps": 1,
        "search.checkpoint_dir": os.path.join(wd, "ck"),
        "search.seed": 0,
    })
    net = SuperNet(in_channels=4, num_classes=3, base_channels=4, depth=2,
                   n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")
    log = os.path.join(wd, "log.jsonl")
    # device_augment=False: random flips would flip the shift direction and
    # destroy the task's directionality
    searcher = Searcher(net, cfg, paths, log_path=log, device_augment=False)

    import time

    t0 = time.perf_counter()
    state, genotype = searcher.search(epochs=epochs, steps_per_epoch=steps)
    dt = time.perf_counter() - t0

    from nas_3d_unet_tpu.models.genotype import init_alphas
    a0 = jax.device_get(init_alphas(jax.random.PRNGKey(0), 2))
    aT = jax.device_get(state.alphas)
    print(f"wall={dt:.1f}s  none_mass init={none_mass(a0):.4f} "
          f"final={none_mass(aT):.4f}")
    gm0, gmT = group_masses(a0), group_masses(aT)
    for name in gm0:
        print(f"conv_mass[{name}] init={gm0[name]:.4f} final={gmT[name]:.4f} "
              f"delta={gmT[name] - gm0[name]:+.4f}")
    with open(log) as f:
        recs = [json.loads(l) for l in f if '"epoch"' in l]
    for r in recs:
        ent = np.mean([v for k, v in r.items() if k.startswith("entropy_")])
        print(f"epoch {r['epoch']} warm={r['warmup']} tr={r['train_loss']:.4f} "
              f"va={r['val_loss']:.4f} ent={ent:.4f} "
              + (f"dice_wt={r.get('dice_wt', float('nan')):.3f}" if not r["warmup"] else ""))
    nconv, ntot = conv_count(genotype)
    print(f"genotype conv-family ops: {nconv}/{ntot}")
    print(genotype.to_json())
    ents = [np.mean([v for k, v in r.items() if k.startswith("entropy_")])
            for r in recs]
    print("SUMMARY " + json.dumps({
        "noise": bool(noise), "warmup": warmup, "epochs": epochs,
        "steps": steps, "wall_s": round(dt, 1),
        "ent_init": round(float(ents[0]), 4),
        "ent_final": round(float(ents[-1]), 4),
        "none_init": round(none_mass(a0), 4),
        "none_final": round(none_mass(aT), 4),
        "conv_mass_final": {k: round(v, 4) for k, v in gmT.items()},
        "best_dice_wt": round(max((r.get("dice_wt", 0.0) for r in recs),
                                  default=0.0), 4),
        "conv_ops": nconv, "total_ops": ntot,
    }))


if __name__ == "__main__":
    run(*(int(a) for a in sys.argv[1:]))  # epochs steps warmup noise
