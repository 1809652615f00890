"""Probe: can a data×spatial mesh run across PROCESSES on gloo? (round-5
VERDICT #5)

Round 4 dodged multi-host spatial sharding: each gloo context is numbered
by a per-process counter keyed into the coordination KV store, and a step
with several collective cliques (spatial halo pairs + the gradient
all-reduce) creates them in execution-dependent order, so the counters
diverge between processes and context init deadlocks
(tests/multihost_worker.py:72-81).

Hypothesis under test: FIXED-ORDER warm-up collectives — one trivial,
individually-fenced collective per clique the real step will use, in the
same order on every process — make gloo context numbering deterministic
(the same trick the DP-only worker uses for its single clique), after which
a data×spatial train step can run cross-process.

Run:  python experiments/r5_mh_spatial_probe.py          (parent: spawns 2)
      MHS_ROLE=worker ... (internal)

Prints PROBE_OK or the failure mode; result is recorded in PERF_NOTES /
README and decides between a real test and a loud runtime guard.
"""

import json
import os
import socket
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)


def worker() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    cache = os.path.join(_REPO, "tests", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nas_3d_unet_tpu.parallel.mesh import (DATA_AXIS, SPATIAL_AXIS,
                                               make_mesh,
                                               maybe_initialize_distributed)

    maybe_initialize_distributed()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    t0 = time.time()

    def log(msg):
        print(f"[probe {jax.process_index()}] +{time.time() - t0:.1f}s {msg}",
              file=sys.stderr, flush=True)

    # mesh (data=2, spatial=2): jax.devices() lists process 0's two devices
    # then process 1's, so reshape(2, 2) puts the DATA axis across processes
    # (gradient all-reduce crosses gloo) and the SPATIAL axis within each
    # process — matching a pod slice where halos ride the faster links.
    mesh = make_mesh(data_parallel=2, spatial_parallel=2)

    # --- fixed-order clique warm-up (the property under test) -------------
    # One trivial collective per axis, each individually fenced with a host
    # readback so the context-creation ORDER is identical on both processes.
    # Outputs sharded over the DATA axis span both processes, so the fence
    # reads back only this process's addressable shards (blocks until the
    # dispatched collective completes — the ordering point we need).
    def fence(a):
        for s in a.addressable_shards:
            np.asarray(s.data)

    x8 = jax.device_put(np.arange(8, dtype=np.float32).reshape(2, 2, 2),
                        NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS)))
    warm_data = jax.jit(lambda a: a.sum(axis=0),
                        out_shardings=NamedSharding(mesh, P(None, SPATIAL_AXIS)))
    fence(warm_data(x8))
    log("warm-up 1 (data all-reduce) done")
    warm_spatial = jax.jit(lambda a: a.sum(axis=1),
                           out_shardings=NamedSharding(mesh, P(DATA_AXIS)))
    fence(warm_spatial(x8))
    log("warm-up 2 (spatial all-reduce) done")
    # halo-shaped clique: a collective-permute along spatial comes from
    # shifting a spatially-sharded array
    def shift(a):
        return jnp.roll(a, 1, axis=1)
    warm_perm = jax.jit(shift, out_shardings=NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS)))
    fence(warm_perm(x8))
    log("warm-up 3 (spatial permute) done")

    # --- the real thing: data×spatial train step ---------------------------
    from nas_3d_unet_tpu.models.genotype import default_genotype
    from nas_3d_unet_tpu.models.unet import DerivedNet
    from nas_3d_unet_tpu.parallel.mesh import batch_sharding, replicate
    from nas_3d_unet_tpu.train.loop import (TrainState, make_optimizer,
                                            make_train_step)

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

    log("net.init...")
    params = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.zeros_like(x))
    state = replicate(mesh, TrainState(params=params, opt_state=tx.init(params),
                                       step=jnp.asarray(0, jnp.int32),
                                       rng=jax.random.PRNGKey(1)))
    sh = batch_sharding(mesh, spatial=True)
    xs = jax.device_put(x, sh)
    ys = jax.device_put(y, sh)
    log("compiling + running data×spatial train step...")
    state, metrics = step(state, xs, ys)
    loss = float(jax.device_get(metrics["loss"]))
    log(f"loss = {loss}")
    print(json.dumps({"process_id": jax.process_index(), "loss": loss,
                      "finite": bool(np.isfinite(loss))}), flush=True)


def parent() -> None:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env_base = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env_base.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(2):
        env = dict(env_base, MHS_ROLE="worker",
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    ok = True
    losses = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            print(f"--- worker {pid} TIMEOUT", flush=True)
            ok = False
        print(f"--- worker {pid} rc={p.returncode}")
        sys.stderr.write("\n".join(err.splitlines()[-12:]) + "\n")
        if p.returncode != 0:
            ok = False
        else:
            losses.append(json.loads(out.splitlines()[-1])["loss"])
    if ok and len(losses) == 2 and losses[0] == losses[1]:
        print(f"PROBE_OK loss={losses[0]}")
    else:
        print(f"PROBE_FAIL losses={losses}")


if __name__ == "__main__":
    if os.environ.get("MHS_ROLE") == "worker":
        worker()
    else:
        parent()
