"""Round-3 search-step bench/profile (VERDICT #3: 1.4 s -> <1 s at 128³).

Times the jitted bilevel step at the shipped 128³ config with the remat
structure under env control, optionally capturing an xplane trace:

    REMAT=1 REMAT_EDGES=0 P=128 python experiments/r3_search_profile.py

Knobs: P (patch), B (batch), REMAT (cell remat), REMAT_EDGES, TRACE,
UNROLLED (second-order step).
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
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nas_3d_unet_tpu.models.genotype import init_alphas
from nas_3d_unet_tpu.models.unet import SuperNet, arch_weights_from_alphas
from nas_3d_unet_tpu.search.bilevel import (SearchState, make_search_step,
                                            make_search_step_unrolled)
from nas_3d_unet_tpu.utils.timing import fence


def main():
    patch = int(os.environ.get("P", "128"))
    batch = int(os.environ.get("B", "1"))
    remat = os.environ.get("REMAT", "1") == "1"
    remat_edges = os.environ.get("REMAT_EDGES", "0") == "1"
    unrolled = os.environ.get("UNROLLED", "0") == "1"
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/r3_search_trace")

    net = SuperNet(in_channels=4, num_classes=3, base_channels=16, depth=3,
                   n_nodes=3, gn_groups=8, norm="group", remat=remat,
                   remat_edges=remat_edges, dtype_name="bfloat16", packed=True,
                   unpack_head=False)
    w_tx = optax.adamw(3e-4, weight_decay=1e-4)
    a_tx = optax.adamw(1e-3, weight_decay=1e-3)
    aug = dict(flip_prob=0.5, intensity_shift=0.1, intensity_scale=0.1)
    mk = make_search_step_unrolled if unrolled else make_search_step
    step = (mk(net.apply, w_tx, a_tx, 3e-4, aug) if unrolled
            else mk(net.apply, w_tx, a_tx, aug))

    rng = np.random.default_rng(0)
    xs = []
    for s in range(2):
        x = jnp.asarray(rng.standard_normal(
            (batch, patch, patch, patch, 4)).astype(np.float32))
        wt = (x[..., 1] > 0.5).astype(jnp.float32)
        xs.append((x, jnp.stack([wt, wt, wt], axis=-1)))
    (x_tr, y_tr), (x_val, y_val) = xs

    alphas = init_alphas(jax.random.PRNGKey(0), 3)
    params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x_tr),
                      arch_weights_from_alphas(alphas))
    state = SearchState(params=params, w_opt=w_tx.init(params), alphas=alphas,
                        a_opt=a_tx.init(alphas), step=jnp.asarray(0, jnp.int32),
                        rng=jax.random.PRNGKey(2))

    import time
    for _ in range(2):   # warmup (compile)
        state, m = step(state, x_tr, y_tr, x_val, y_val)
    fence(m["train_loss"])
    iters = int(os.environ.get("ITERS", "6"))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, x_tr, y_tr, x_val, y_val)
    fence(m["train_loss"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"s_per_step": round(dt, 4), "remat": remat,
                      "remat_edges": remat_edges, "unrolled": unrolled,
                      "patch": patch, "batch": batch}))

    if os.environ.get("TRACE", "0") == "1":
        jax.profiler.start_trace(trace_dir)
        state, m = step(state, x_tr, y_tr, x_val, y_val)
        fence(m["train_loss"])
        jax.profiler.stop_trace()
        print("trace at", trace_dir)


if __name__ == "__main__":
    main()
