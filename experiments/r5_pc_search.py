"""Round-5 partial-channel search A/B (search.partial_channels = K).

The 128³ bilevel step is aggregate-bandwidth-bound (PERF_NOTES round-5
closure: no bucket > ~9 ms, fusions stream at ~1 TB/s), so the remaining
lever is evaluating fewer candidate bytes per step.  PC-DARTS-style
partial channels route only C/K of each edge through the candidate ops —
this script measures the fenced step time at the shipped 128³ search
config for K ∈ {1, 2, 4}:

    python experiments/r5_pc_search.py            # K sweep from PC_KS
    PC_KS=1,2 P=64 python experiments/r5_pc_search.py

Knobs: P (patch), B (batch), PC_KS (comma list), REMAT/REMAT_EDGES,
ITERS, TRACE/TRACE_DIR (trace the LAST K).
Chip runs need an otherwise-idle host (CLAUDE.md timing rule).
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

from nas_3d_unet_tpu.models.genotype import init_alphas, parse_alphas
from nas_3d_unet_tpu.models.unet import SuperNet, arch_weights_from_alphas
from nas_3d_unet_tpu.search.bilevel import SearchState, make_search_step
from nas_3d_unet_tpu.utils.timing import fence


def bench_k(pc_k: int, patch: int, batch: int, remat: bool,
            remat_edges: bool, iters: int, trace_dir: str | None):
    import time

    net = SuperNet(in_channels=4, num_classes=3, base_channels=16, depth=3,
                   n_nodes=3, gn_groups=8, norm="group", remat=remat,
                   remat_edges=remat_edges, dtype_name="bfloat16", packed=True,
                   unpack_head=False, pc_k=pc_k)
    w_tx = optax.adamw(3e-4, weight_decay=1e-4)
    a_tx = optax.adamw(1e-3, weight_decay=1e-3)
    aug = dict(flip_prob=0.5, intensity_shift=0.1, intensity_scale=0.1)
    step = make_search_step(net.apply, w_tx, a_tx, aug)

    rng = np.random.default_rng(0)
    xs = []
    for _ in range(2):
        x = jnp.asarray(rng.standard_normal(
            (batch, patch, patch, patch, 4)).astype(np.float32))
        wt = (x[..., 1] > 0.5).astype(jnp.float32)
        xs.append((x, jnp.stack([wt, wt, wt], axis=-1)))
    (x_tr, y_tr), (x_val, y_val) = xs

    alphas = init_alphas(jax.random.PRNGKey(0), 3)
    # jit the init: eager init compiles hundreds of one-op modules through
    # the axon remote compiler one HTTP round-trip at a time (~30+ min for
    # a cold pc graph); one jitted init graph compiles in minutes
    params = jax.jit(net.init)(jax.random.PRNGKey(1), jnp.zeros_like(x_tr),
                               arch_weights_from_alphas(alphas))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    state = SearchState(params=params, w_opt=w_tx.init(params), alphas=alphas,
                        a_opt=a_tx.init(alphas), step=jnp.asarray(0, jnp.int32),
                        rng=jax.random.PRNGKey(2))

    for _ in range(2):   # warmup (compile)
        state, m = step(state, x_tr, y_tr, x_val, y_val)
    fence(m["train_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, x_tr, y_tr, x_val, y_val)
    fence(m["train_loss"])
    dt = (time.perf_counter() - t0) / iters

    # the emitted genotype parses identically to full-channel DARTS
    parse_alphas(jax.device_get(state.alphas), 3).validate()

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        state, m = step(state, x_tr, y_tr, x_val, y_val)
        fence(m["train_loss"])
        jax.profiler.stop_trace()
    return dt, n_params


def main():
    patch = int(os.environ.get("P", "128"))
    batch = int(os.environ.get("B", "1"))
    remat = os.environ.get("REMAT", "0") == "1"
    remat_edges = os.environ.get("REMAT_EDGES", "0") == "1"
    iters = int(os.environ.get("ITERS", "6"))
    ks = [int(v) for v in os.environ.get("PC_KS", "1,2,4").split(",")]
    trace = os.environ.get("TRACE", "0") == "1"
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/r5_pc_trace")

    base = None
    for i, k in enumerate(ks):
        td = trace_dir if (trace and i == len(ks) - 1) else None
        dt, n_params = bench_k(k, patch, batch, remat, remat_edges, iters, td)
        base = base or dt
        print(json.dumps({"pc_k": k, "s_per_step": round(dt, 4),
                          "speedup_vs_k1": round(base / dt, 3),
                          "supernet_params": n_params,
                          "patch": patch, "batch": batch, "remat": remat}),
              flush=True)


if __name__ == "__main__":
    main()
