"""Chip A/B for train.microbatch (gradient accumulation), round 4.

Question (PERF_NOTES round-3 "batch-2 regression diagnosed"): b2 pays a
12.5% per-patch tax over b1 — ~2× copy/pad time plus conv streaming through
`while` loops under HBM pressure.  Gradient accumulation (scan-of-grads over
size-1 slices) runs every microbatch through the exact b1 conv graph with
one slice's residuals live at a time; if the b2 tax is graph-shape-induced,
accumulation should land near 2× the b1 step time (184 ms) instead of the
measured 203 ms full-batch b2.

Measures the shipped bench config (derived 128³ bf16 packed no-remat,
device augment), chip idle, fenced:
  b1 full-batch      — the reference optimum
  b2 full-batch      — the known-regressed graph
  b2 microbatch=1    — the accumulation candidate
  b4 variants (HBM permitting) via B=4 env.

Usage: python experiments/r4_microbatch.py            # b1/b2 set
       B=4 python experiments/r4_microbatch.py b4     # add b4 pair
"""

import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nas_3d_unet_tpu.models.genotype import default_genotype
from nas_3d_unet_tpu.models.unet import DerivedNet
from nas_3d_unet_tpu.train.loop import TrainState, make_optimizer, make_train_step
from nas_3d_unet_tpu.utils.timing import time_step_chain


def _net():
    return DerivedNet(genotype=default_genotype(3), in_channels=4,
                      num_classes=3, base_channels=16, depth=3, n_nodes=3,
                      gn_groups=8, norm="group", remat=False,
                      dtype_name="bfloat16", packed=True, unpack_head=False)


def _batch(b, patch=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, patch, patch, patch, 4)).astype(np.float32))
    wt = (x[..., 1] > 0.5).astype(jnp.float32)
    y = jnp.stack([wt, wt, wt], axis=-1)
    return x, y


def run(b, microbatch, iters=12):
    net = _net()
    tx = make_optimizer(3e-4, 1e-4)
    aug = dict(flip_prob=0.5, intensity_shift=0.1, intensity_scale=0.1)
    x, y = _batch(b)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros_like(x))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(1))
    step = make_train_step(net.apply, tx, augment=aug, microbatch=microbatch)
    dt, _ = time_step_chain(step, state, x, y, iters=iters, warmup=3)
    print(json.dumps({"b": b, "microbatch": microbatch,
                      "ms_per_step": round(dt * 1e3, 2),
                      "patches_per_s": round(b / dt, 3)}), flush=True)


def main():
    if "b4only" in sys.argv[1:]:
        # b4 compiles are cold (minutes each); mb1 first — it is the config
        # that matters (full-batch b4 may not even fit HBM).
        run(4, 1, iters=8)
        run(4, 0, iters=8)
        return
    run(1, 0)
    run(2, 0)
    run(2, 1)
    if "b4" in sys.argv[1:] or os.environ.get("B") == "4":
        run(4, 0, iters=8)
        run(4, 1, iters=8)


if __name__ == "__main__":
    main()
