"""Round-3 re-profile of the shipped derived train step (VERDICT #1c).

Times the current default config (packed, no remat, FMA GN) and captures an
xplane trace of 2 steps for opcode bucketing via experiments/xplane.py.
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
from nas_3d_unet_tpu.utils.timing import fence, time_step_chain


def main():
    patch = int(os.environ.get("P", "128"))
    batch = int(os.environ.get("B", "1"))
    remat = os.environ.get("REMAT", "0") == "1"
    aug = os.environ.get("AUG", "1") == "1"
    unpack_head = os.environ.get("UNPACK_HEAD", "0") == "1"
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/r3_trace")

    net = DerivedNet(genotype=default_genotype(3), in_channels=4, num_classes=3,
                     base_channels=16, depth=3, n_nodes=3, gn_groups=8,
                     norm="group", remat=remat, dtype_name="bfloat16", packed=True,
                     unpack_head=unpack_head)
    tx = make_optimizer(3e-4, 1e-4, flat=os.environ.get("FLAT", "1") == "1")
    step = make_train_step(net.apply, tx,
                           augment=dict(flip_prob=0.5, intensity_shift=0.1,
                                        intensity_scale=0.1) if aug else None)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, patch, patch, patch, 4)).astype(np.float32))
    wt = (x[..., 1] > 0.5).astype(jnp.float32)
    y = jnp.stack([wt, wt, wt], axis=-1)

    params = net.init(jax.random.PRNGKey(0), jnp.zeros_like(x))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(1))

    # XLA_OPT="k=v,k2=v2" → per-jit compiler options (these ride the PJRT
    # compile request, so they reach the axon REMOTE compiler — env XLA_FLAGS
    # may not be forwarded there).
    if os.environ.get("XLA_OPT"):
        opts = dict(kv.split("=", 1) for kv in os.environ["XLA_OPT"].split(","))
        step = step.lower(state, x, y).compile(compiler_options=opts)
        print(json.dumps({"compiler_options": opts}))

    dt, state = time_step_chain(step, state, x, y, iters=8, warmup=3)
    print(json.dumps({"ms_per_step": round(dt * 1e3, 2),
                      "patches_per_sec": round(batch / dt, 3)}))

    if os.environ.get("TRACE", "1") == "1":
        jax.profiler.start_trace(trace_dir)
        for _ in range(2):
            state, m = step(state, x, y)
        fence(m)
        jax.profiler.stop_trace()
        print("trace at", trace_dir)


if __name__ == "__main__":
    main()
