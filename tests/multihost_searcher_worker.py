"""Worker process for the two-process multi-host SEARCHER epoch-loop test.

multihost_trainer_worker.py proves the TRAINER's control loop stays
consistent across processes (the plateau-LR branch consumes a replicated
scalar).  The Searcher's epoch loop has no LR branch, but it has its own
cross-process invariants worth pinning one level above the single-step
test:

  * both the w-phase and the α-phase consume GLOBAL batches assembled from
    per-host slices (search/bilevel.py uses the same put_global_batch
    pattern as training), so α and params stay replicated — identical
    bytes on every host after real epochs (warmup epoch + bilevel epoch,
    including the frozen-α eval pass),
  * the genotype parsed from those replicated α is identical on every
    host, and the genotype.json / checkpoint writes happen on process 0
    ONLY.

This worker runs TWO real `Searcher.search` epochs (1 warmup + 1 bilevel,
with the α-split eval) across two processes and reports md5s of the final
replicated α and params, the parsed genotype, and its host shard.
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
    # ONE device per process: the global mesh is exactly the two processes,
    # so every batch row crosses the process boundary (the property under
    # test) — same geometry as multihost_trainer_worker.py
    jax.config.update("jax_num_cpu_devices", 1)
    if os.environ.get("MH_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["MH_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nas_3d_unet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                               maybe_initialize_distributed)

    _log("distributed init...")
    maybe_initialize_distributed()
    _log("initialized")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nas_3d_unet_tpu.data.pipeline import dataset_paths
    from nas_3d_unet_tpu.models.unet import SuperNet
    from nas_3d_unet_tpu.search.bilevel import Searcher
    from nas_3d_unet_tpu.utils.config import load_config

    assert jax.process_count() == 2
    assert len(jax.devices()) == 2

    mesh = make_mesh(data_parallel=2, spatial_parallel=1)
    sharding = batch_sharding(mesh)

    # barrier + gloo warm-up before the long bilevel compile (same trick as
    # the other workers)
    ones = jax.device_put(np.ones((2,), np.float32),
                          NamedSharding(mesh, P("data")))
    barrier = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))
    assert float(jax.device_get(barrier(ones))) == 2.0
    _log("barrier all-reduce done")

    data_dir = os.environ["MH_DATA_DIR"]
    paths = dataset_paths(data_dir)  # this host's disjoint patient shard
    assert len(paths) == 2, paths

    cfg = load_config(None, overrides={
        "data.patch_size": (8, 8, 8), "data.batch_size": 2,
        "data.val_fraction": 0.5, "model.base_channels": 4,
        "model.depth": 2, "model.n_nodes": 2, "model.gn_groups": 4,
        "model.dtype": "float32", "model.remat": False,
        "search.warmup_epochs": 1, "search.val_steps": 1,
        "search.checkpoint_dir": os.environ["MH_CKPT_DIR"],
    })
    net = SuperNet(in_channels=4, num_classes=3, base_channels=4, depth=2,
                   n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")

    searcher = Searcher(net, cfg, paths, device_augment=True,
                        sharding=sharding)
    assert searcher.local_batch == 1  # global 2 over 2 processes
    _log("searching (1 warmup + 1 bilevel epoch, compile included)...")
    state, genotype = searcher.search(epochs=2, steps_per_epoch=2)
    _log("search done")

    # replicated α and params: identical bytes expected on every host
    from flax import serialization

    def _md5(tree) -> str:
        tree_np = jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
        return hashlib.md5(serialization.to_bytes(tree_np)).hexdigest()

    print(json.dumps({
        "process_id": jax.process_index(),
        "alphas_md5": _md5(state.alphas),
        "params_md5": _md5(state.params),
        "genotype": genotype.to_json(),
        "final_step": int(jax.device_get(state.step)),
        "host_shard": [os.path.basename(p) for p in paths],
    }), flush=True)


if __name__ == "__main__":
    main()
