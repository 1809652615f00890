"""Worker process for the two-process multi-host integration test.

Launched by tests/test_multihost.py with the README launch-contract env:
JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID (+ CPU platform
and per-process virtual devices).  Each process:

  1. calls maybe_initialize_distributed() FIRST (the init-ordering
     contract — parallel/mesh.py),
  2. builds a global data-parallel mesh over ALL processes' devices,
  3. runs one jitted packed derived train step on a globally-sharded batch
     (the gradient all-reduce crosses the process boundary via gloo),
  4. checks the per-host dataset sharding split is a disjoint cover,
  5. saves a checkpoint (process 0 must write, others must no-op),

and prints ONE JSON line the parent asserts on.  The reference is
single-process single-GPU (SURVEY.md §2b/§5 comm rows — "none"); this file
is the executable proof of the rebuilt distributed entry path.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.time()


def _log(msg: str) -> None:
    if os.environ.get("MH_VERBOSE"):
        print(f"[mh {os.environ.get('JAX_PROCESS_ID', '?')}] "
              f"+{time.time() - _T0:.1f}s {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    # Per-process virtual CPU devices must be configured before the backend
    # comes up; distributed init must run before ANY backend touch.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    if os.environ.get("MH_CACHE_DIR"):
        # share the suite's persistent compile cache: the cold CPU compile
        # of the packed step takes minutes, warm reruns seconds
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["MH_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nas_3d_unet_tpu.parallel.mesh import (maybe_initialize_distributed,
                                               make_mesh, replicate,
                                               shard_batch)

    _log("distributed init...")
    maybe_initialize_distributed()
    _log("initialized")

    import jax.numpy as jnp
    import numpy as np

    from nas_3d_unet_tpu.data.pipeline import dataset_paths
    from nas_3d_unet_tpu.models.genotype import default_genotype
    from nas_3d_unet_tpu.models.unet import DerivedNet
    from nas_3d_unet_tpu.train.checkpoint import save_checkpoint
    from nas_3d_unet_tpu.train.loop import (TrainState, make_optimizer,
                                            make_train_step)

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    # Data-only mesh: each gloo context is numbered by a PER-PROCESS counter
    # keyed into the coordination KV store; when a step has several
    # collective cliques (e.g. spatial halo pairs + the gradient
    # all-reduce) their creation order is execution-order-dependent, the
    # counters diverge between processes, and context init deadlocks
    # (observed: both workers stuck 30 s on key cpu:gloo/...;/4).  One
    # clique -> deterministic numbering.  Spatial sharding correctness is
    # covered by the single-process 8-device tests; THIS test's job is the
    # cross-process entry path.
    mesh = make_mesh(data_parallel=8, spatial_parallel=1)

    # Barrier + gloo warm-up: the first cross-process collective does the
    # gloo context key-value exchange under a fixed 30 s deadline, so both
    # processes must reach it near-simultaneously.  Running one trivial
    # all-reduce here (compiles in <1 s) initializes the clique AND
    # synchronizes the processes so they enter the multi-minute train-step
    # compile in lockstep — without it, asymmetric compile arrival at the
    # step's first collective flakes with DEADLINE_EXCEEDED.
    from jax.sharding import NamedSharding, PartitionSpec as P
    ones = jax.device_put(np.ones((8,), np.float32),
                          NamedSharding(mesh, P("data")))
    barrier = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))
    assert float(jax.device_get(barrier(ones))) == 8.0
    _log("barrier all-reduce done")

    net = DerivedNet(genotype=default_genotype(2), in_channels=4,
                     num_classes=3, base_channels=4, depth=2, n_nodes=2,
                     gn_groups=4, norm="group", remat=False,
                     dtype_name="bfloat16", packed=True, unpack_head=False)
    tx = make_optimizer(1e-3, 1e-4)
    step = make_train_step(net.apply, tx,
                           augment=dict(flip_prob=0.5, intensity_shift=0.1,
                                        intensity_scale=0.1))

    # Same seed on every host -> same global batch; device_put with the
    # global NamedSharding places each host's addressable shards.
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 16, 4)).astype(np.float32))
    wt = (x[..., 1] > 0.5).astype(jnp.float32)
    y = jnp.stack([wt, wt, wt], axis=-1)

    _log("net.init...")
    # jit the whole init: eager flax init dispatches ~30 tiny initializer
    # programs, each of which compiles slowly on the multi-process backend
    # (measured ~3-13 s apiece vs ms single-process)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.zeros_like(x))
    _log("net.init done")
    state = replicate(mesh, TrainState(params=params, opt_state=tx.init(params),
                                       step=jnp.asarray(0, jnp.int32),
                                       rng=jax.random.PRNGKey(1)))
    xs, ys = shard_batch(mesh, (x, y), spatial=False)
    _log("compiling + running train step...")
    state, metrics = step(state, xs, ys)
    _log("step dispatched")
    # The loss is replicated output of a psum-carrying graph: fully
    # addressable on every host.
    loss = float(jax.device_get(metrics["loss"]))
    _log(f"loss = {loss}")

    # Per-host data sharding: the two hosts' path lists must partition the
    # dataset disjointly (data/pipeline.py dataset_paths index-shards by
    # jax.process_index()::process_count).
    data_dir = os.environ["MH_DATA_DIR"]
    mine = [os.path.basename(p) for p in dataset_paths(data_dir)]
    assert len(mine) == 5, mine

    # Process-0-only checkpoint write (train/checkpoint.py guard).
    ckpt_dir = os.environ["MH_CKPT_DIR"]
    _log("save_checkpoint...")
    save_checkpoint(ckpt_dir, 1, state, metadata={"proc": jax.process_index()})
    _log("save_checkpoint done")

    print(json.dumps({
        "process_id": jax.process_index(),
        "process_count": jax.process_count(),
        "n_global_devices": len(jax.devices()),
        "loss": loss,
        "finite": bool(np.isfinite(loss)),
        "host_shard": mine,
    }), flush=True)


if __name__ == "__main__":
    main()
