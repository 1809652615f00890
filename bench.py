"""Headline benchmark: derived-model training throughput on one chip.

Matches BASELINE.json configs[2]: derived-architecture training with
Dice+CE loss, 128³ patches, device-side augmentation, bf16 activations,
single chip.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "patches/s/chip", "vs_baseline": N}

The reference published no numbers (BASELINE.json "published": {}), so
vs_baseline compares against the most recent recorded BENCH_r*.json in the
repo (round-over-round trend); 1.0 on the first round.
"""

import glob
import json
import os
import re
import sys
import time

import jax

# persistent compile cache: the axon remote compile of the full train step
# takes minutes cold; cached reruns take seconds
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def _prev_baseline() -> float:
    best = None
    for path in sorted(glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            rec = json.load(open(path))
            # the driver wraps bench output under "parsed"
            val = float(rec.get("value") or rec.get("parsed", {}).get("value", 0.0))
            if val > 0:
                best = (int(m.group(1)), val)
        except Exception:
            continue
    return best[1] if best else None


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from nas_3d_unet_tpu.models.genotype import default_genotype
    from nas_3d_unet_tpu.models.unet import DerivedNet
    from nas_3d_unet_tpu.train.loop import TrainState, make_optimizer, make_train_step

    patch = int(os.environ.get("BENCH_PATCH", "128"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    # lane-packed execution + no remat is the measured-fastest single-chip
    # config (packed residuals are lane-dense, so saving them beats
    # recompute — ops/packed.py, PERF_NOTES.md round 2)
    packed = os.environ.get("BENCH_PACKED", "1") == "1"
    remat = os.environ.get("BENCH_REMAT", "0") == "1"

    net = DerivedNet(genotype=default_genotype(3), in_channels=4, num_classes=3,
                     base_channels=16, depth=3, n_nodes=3, gn_groups=8,
                     norm="group", remat=remat, dtype_name="bfloat16",
                     packed=packed)
    tx = make_optimizer(3e-4, 1e-4)
    step = make_train_step(net.apply, tx,
                           augment=dict(flip_prob=0.5, intensity_shift=0.1,
                                        intensity_scale=0.1))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, patch, patch, patch, 4)).astype(np.float32))
    wt = (x[..., 1] > 0.5).astype(jnp.float32)
    y = jnp.stack([wt, wt, wt], axis=-1)

    params = net.init(jax.random.PRNGKey(0), jnp.zeros_like(x))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(1))

    # NOTE: jax.block_until_ready is unreliable on the axon remote platform
    # (returns before device completion); time with forced value readback.
    from nas_3d_unet_tpu.utils.timing import time_step_chain

    dt, state = time_step_chain(step, state, x, y, iters=iters, warmup=warmup)
    pps = batch / dt
    prev = _prev_baseline()
    print(json.dumps({
        "metric": "derived_train_patches_per_sec_per_chip_128c_bf16",
        "value": round(pps, 4),
        "unit": "patches/s/chip",
        "vs_baseline": round(pps / prev, 4) if prev else 1.0,
    }))


if __name__ == "__main__":
    main()
