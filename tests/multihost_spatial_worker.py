"""Worker for the two-process data×spatial multi-host test (round-5
VERDICT #5).

Round 4 dodged multi-host spatial sharding: several collective cliques in
one step made gloo context numbering diverge between processes and init
deadlocked.  The fix is `parallel/mesh.py:warmup_collectives` — fixed-order,
individually-fenced trivial collectives, one per clique family, run by
`make_mesh` on every multi-process mesh (probed green:
experiments/r5_mh_spatial_probe.py).

This worker runs ONE jitted derived train step on a data×spatial mesh in
BOTH orientations over 2 processes × 2 local devices:

  * "halo_local": make_mesh's native layout — the data axis crosses the
    process boundary (two concurrent cross-process gradient all-reduce
    cliques, one per spatial shard) while conv halo permutes stay
    intra-process.  The deployment shape: halos ride the faster links.
  * "halo_cross": the transposed device grid — the SPATIAL axis crosses
    the process boundary, so conv halo exchanges and the loss reduction
    ride gloo across processes.

For each orientation it reports the loss and an md5 of the updated
replicated params; the parent asserts both match across processes.  The
reference is single-process single-GPU (SURVEY.md §2b/§5 — no distributed
backend); single-process numeric equality of spatial sharding is pinned by
tests/test_parallel.py — THIS file proves the cross-process entry path.
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.time()


def _log(msg: str) -> None:
    if os.environ.get("MH_VERBOSE"):
        print(f"[mhs {os.environ.get('JAX_PROCESS_ID', '?')}] "
              f"+{time.time() - _T0:.1f}s {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    if os.environ.get("MH_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["MH_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nas_3d_unet_tpu.parallel.mesh import (DATA_AXIS, SPATIAL_AXIS,
                                               make_mesh,
                                               maybe_initialize_distributed,
                                               warmup_collectives)

    maybe_initialize_distributed()
    _log("initialized")

    import numpy as np
    import jax.numpy as jnp
    from flax import serialization
    from jax.sharding import Mesh

    from nas_3d_unet_tpu.models.genotype import default_genotype
    from nas_3d_unet_tpu.models.unet import DerivedNet
    from nas_3d_unet_tpu.parallel.mesh import batch_sharding, replicate
    from nas_3d_unet_tpu.train.loop import (TrainState, make_optimizer,
                                            make_train_step)

    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    net = DerivedNet(genotype=default_genotype(2), in_channels=4,
                     num_classes=3, base_channels=4, depth=2, n_nodes=2,
                     gn_groups=4, norm="group", remat=False,
                     dtype_name="float32", packed=False)
    tx = make_optimizer(1e-3, 1e-4)
    step = make_train_step(net.apply, tx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 4)).astype(np.float32))
    wt = (x[..., 1] > 0.5).astype(jnp.float32)
    y = jnp.stack([wt, wt, wt], axis=-1)

    report = {"process_id": jax.process_index()}
    for name in ("halo_local", "halo_cross"):
        if name == "halo_local":
            # devices (0,1)=p0, (2,3)=p1 reshaped (2,2): data axis crosses
            # processes, spatial stays within each
            mesh = make_mesh(data_parallel=2, spatial_parallel=2)
        else:
            # transposed grid: spatial axis crosses processes (halos over
            # gloo); built manually, so warm up the cliques explicitly
            arr = np.asarray(jax.devices()).reshape(2, 2).T
            mesh = Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))
            warmup_collectives(mesh)
        _log(f"{name}: mesh ready (cliques warmed)")

        params = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.zeros_like(x))
        state = replicate(mesh, TrainState(
            params=params, opt_state=tx.init(params),
            step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(1)))
        sh = batch_sharding(mesh, spatial=True)
        xs = jax.device_put(x, sh)
        ys = jax.device_put(y, sh)
        _log(f"{name}: compiling + running data×spatial train step...")
        state, metrics = step(state, xs, ys)
        loss = float(jax.device_get(metrics["loss"]))
        params_np = jax.tree_util.tree_map(
            np.asarray, jax.device_get(state.params))
        md5 = hashlib.md5(serialization.to_bytes(params_np)).hexdigest()
        _log(f"{name}: loss = {loss}")
        report[name] = {"loss": loss, "finite": bool(np.isfinite(loss)),
                        "params_md5": md5}

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
