"""Device mesh + GSPMD sharding helpers (SURVEY.md §2b, §5 comm rows).

The reference is single-process single-GPU with no communication layer at
all; scaling here is pure GSPMD: build a `jax.sharding.Mesh`, place the
batch with a NamedSharding over the `data` axis (and optionally the `spatial`
axis over the volume's D dimension — the CNN analog of context/sequence
parallelism), replicate params, and let XLA insert the gradient all-reduce
over ICI.  No collectives appear in model code.

Axes:
  data    — batch dimension; gradients all-reduce across it.
  spatial — D (depth) axis of the volume; XLA inserts conv halo exchanges
            automatically for SAME-padded convolutions under sharding.
            Used when a whole volume or its activations exceed one chip's
            HBM (SURVEY.md §5 long-context row).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def maybe_initialize_distributed() -> None:
    """Multi-host init, driven by standard env vars; no-op single-process.

    (The reference has no distributed backend at all — SURVEY.md §2b.)

    Ordering is load-bearing: `jax.distributed.initialize()` must run BEFORE
    anything touches a backend — even `jax.process_count()`/`jax.devices()`
    initializes (and locks) the local backend, after which multi-host init
    cannot take effect.  So: check the env var first, then the
    backend-initialization state, and only then init (mirrors
    `__graft_entry__._provision_virtual_devices`).
    """
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return                      # single-process launch: nothing to do
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return                      # already initialized (idempotent)
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        raise RuntimeError(
            "JAX_COORDINATOR_ADDRESS is set but a JAX backend was already "
            "initialized in this process; jax.distributed.initialize() must "
            "run before any jax.devices()/process_count() call. Call "
            "maybe_initialize_distributed() first thing in the entry point.")
    # jax.distributed.initialize reads JAX_COORDINATOR_ADDRESS itself but NOT
    # the process geometry; on managed clusters (SLURM/OpenMPI/TPU-pod/K8s)
    # auto-detection fills it in, everywhere else (README launch contract,
    # tests/multihost_worker.py) JAX_NUM_PROCESSES + JAX_PROCESS_ID must be
    # set and are forwarded here.
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        num_processes=int(num) if num is not None else None,
        process_id=int(pid) if pid is not None else None)


def make_mesh(data_parallel: int = -1, spatial_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over the available devices: ('data', 'spatial').

    data_parallel == -1 → use every device not taken by the spatial axis.

    Multi-process, the returned mesh's collective cliques are warmed up in
    a fixed order before first use (`warmup_collectives`) — required for
    deterministic gloo context numbering; free single-process.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spatial_parallel < 1 or n % spatial_parallel != 0:
        raise ValueError(f"spatial_parallel {spatial_parallel} must divide device count {n}")
    if data_parallel == -1:
        data_parallel = n // spatial_parallel
    need = data_parallel * spatial_parallel
    if need > n:
        raise ValueError(
            f"data_parallel*spatial_parallel = {need} exceeds {n} devices")
    arr = np.asarray(devices[:need]).reshape(data_parallel, spatial_parallel)
    mesh = Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))
    warmup_collectives(mesh)
    return mesh


def warmup_collectives(mesh: Mesh) -> None:
    """Fixed-order collective-clique warm-up for multi-process meshes.

    Each gloo context is numbered by a PER-PROCESS counter keyed into the
    coordination KV store.  A compiled step with several collective cliques
    (e.g. per-spatial-shard gradient all-reduces + spatial halo permutes)
    creates them in execution-dependent order, the counters diverge between
    processes, and context init deadlocks (observed round 4,
    tests/multihost_worker.py).  Running one trivial collective PER CLIQUE
    the real step will use — in the same order on every process, each fenced
    with an addressable-shard readback before the next is dispatched — makes
    the numbering deterministic; after this, cross-process data×spatial
    train steps run (probed: experiments/r5_mh_spatial_probe.py PROBE_OK,
    pinned by tests/test_multihost.py::test_two_process_spatial_train_step).

    A welcome side effect: the first warm-up doubles as a process BARRIER,
    so the processes enter any long jit compile that follows in lockstep —
    without it the first real collective can hit gloo's fixed 30 s
    context-init deadline asymmetrically (DEADLINE_EXCEEDED flakes).

    No-op single-process (the sharded sum compiles in <1 s and only runs
    multi-process)."""
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp

    def fence(a):
        # outputs sharded over a cross-process axis span non-addressable
        # devices, so fence via this process's addressable shards only
        for s in a.addressable_shards:
            np.asarray(s.data)

    d, s = mesh.shape[DATA_AXIS], mesh.shape[SPATIAL_AXIS]
    x = jax.device_put(np.arange(d * s, dtype=np.float32).reshape(d, s),
                       NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS)))
    # clique family 1: all-reduce over data (one clique per spatial shard)
    fence(jax.jit(lambda a: a.sum(axis=0, keepdims=True),
                  out_shardings=NamedSharding(mesh, P(None, SPATIAL_AXIS)))(x))
    if s > 1:
        # clique family 2: all-reduce over spatial (loss/stats reductions)
        fence(jax.jit(lambda a: a.sum(axis=1, keepdims=True),
                      out_shardings=NamedSharding(mesh, P(DATA_AXIS, None)))(x))
        # clique family 3: collective-permute along spatial (conv halos)
        fence(jax.jit(
            lambda a: jnp.roll(a, 1, axis=1),
            out_shardings=NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS)))(x))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for (B, D, H, W, C) batches: B over data, optionally D over spatial."""
    spec = P(DATA_AXIS, SPATIAL_AXIS if spatial else None, None, None, None)
    return NamedSharding(mesh, spec)


def batch_partitions(sharding) -> int:
    """Number of shards along the leading (batch) axis of a batch sharding.

    Used by the Trainer to validate `train.microbatch` against the data-axis
    size: the strided grad-accumulation grouping is collective-free only
    when the microbatch is a multiple of this count (train/loop.py
    `accum_grads`)."""
    if not isinstance(sharding, NamedSharding) or not len(sharding.spec):
        return 1
    axes = sharding.spec[0]
    if axes is None:
        return 1
    if isinstance(axes, str):
        axes = (axes,)
    n = 1
    for a in axes:
        n *= sharding.mesh.shape[a]
    return int(n)


def sharding_for_rank(sharding, ndim: int):
    """Trim a batch sharding's PartitionSpec to an array's rank.

    label_mode="classes" labels are rank-4 (B, D, H, W) int arrays while
    images are rank-5; applying the rank-5 spec to them raises.  A spec
    SHORTER than the rank is valid (trailing dims replicate), so trimming
    covers every batch leaf.  Non-NamedSharding placements pass through."""
    if not isinstance(sharding, NamedSharding) or len(sharding.spec) <= ndim:
        return sharding
    return NamedSharding(sharding.mesh, P(*sharding.spec[:ndim]))


def put_batch(tree: Any, sharding) -> Any:
    """device_put every leaf with the sharding trimmed to its rank."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding_for_rank(sharding, np.ndim(a))),
        tree)


def put_global_batch(tree: Any, sharding) -> Any:
    """Assemble GLOBAL batch arrays from per-process LOCAL slices.

    This is the multi-host batch contract (README "Multi-host launch
    contract" step 3): the global batch size is `data.batch_size`; process p
    generates ONLY its local rows [p·b_local, (p+1)·b_local) with
    b_local = batch/process_count, and
    `jax.make_array_from_process_local_data` stitches them into one global
    array — no host assembles (or throws away) any other host's rows.

    Single-process this is exactly `put_batch`, so single-host behavior
    (and its bitwise-pinned tests) is unchanged.
    """
    if jax.process_count() == 1 or not isinstance(sharding, NamedSharding):
        return put_batch(tree, sharding)

    def put(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(
            sharding_for_rank(sharding, a.ndim), a)

    return jax.tree_util.tree_map(put, tree)


def local_batch_size(global_batch: int, what: str = "data.batch_size") -> int:
    """Per-process slice of the global batch (multi-host contract step 3)."""
    p = jax.process_count()
    if global_batch % p != 0:
        raise ValueError(
            f"{what}={global_batch} must be divisible by the process count "
            f"{p}: the global batch is assembled from equal per-host slices")
    return global_batch // p


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree: Any, spatial: bool = False) -> Any:
    """Place batch arrays with the (data[, spatial]) sharding."""
    sharding = batch_sharding(mesh, spatial)
    return jax.device_put(tree, sharding)
