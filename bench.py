"""Headline benchmark: derived-model training throughput on one chip.

Matches BASELINE.json configs[2]: derived-architecture training with
Dice+CE loss, 128³ patches, device-side augmentation, bf16 activations,
single chip.  Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "patches/s/chip", "vs_baseline": N}

All three driver configs are regression-visible EVERY round (round-3
VERDICT #5): the search-step and infer metrics print as JSON lines on
STDERR unconditionally (so the stdout contract stays one line); set
BENCH_SEARCH=0 / BENCH_INFER=0 to skip them (e.g. for quick A/B loops on
the train metric only).  Per-round history: BASELINE.md "Round history".

The axon remote compile helper fails INTERMITTENTLY (HTTP 500); every
compile-bearing section runs under bounded retries (PERF_NOTES.md round-2
"batch scaling" note) so a transient infra failure doesn't zero a round.

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


def _with_retries(fn, label: str, attempts: int = 3, sleep_s: float = 10.0):
    """Bounded retries around a compile-bearing call (axon HTTP 500s are
    intermittent — one success among retries is the norm, not the exception)."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(json.dumps({"event": "bench_retry", "label": label,
                              "attempt": i + 1, "error": str(e)[:300]}),
                  file=sys.stderr)
            time.sleep(sleep_s)


def bench_train() -> float:
    """configs[2]: derived training patches/s/chip (the headline metric)."""
    from nas_3d_unet_tpu.models.genotype import default_genotype
    from nas_3d_unet_tpu.models.unet import DerivedNet
    from nas_3d_unet_tpu.train.loop import TrainState, make_optimizer, make_train_step
    from nas_3d_unet_tpu.utils.timing import time_step_chain

    patch = int(os.environ.get("BENCH_PATCH", "128"))
    # b2 + microbatch=1 (gradient accumulation) is the measured-fastest
    # shipped config: 11.33 patches/s vs 11.07 (b1) / 9.97 (b2 full-batch);
    # b4+mb1 plateaus at the same 11.33 (PERF_NOTES round-4 grad-accum A/B)
    batch = int(os.environ.get("BENCH_BATCH", "2"))
    microbatch = int(os.environ.get("BENCH_MICROBATCH", "1"))
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
                     packed=packed, unpack_head=not packed)
    tx = make_optimizer(3e-4, 1e-4)
    step = make_train_step(net.apply, tx,
                           augment=dict(flip_prob=0.5, intensity_shift=0.1,
                                        intensity_scale=0.1),
                           microbatch=microbatch)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, patch, patch, patch, 4)).astype(np.float32))
    wt = (x[..., 1] > 0.5).astype(jnp.float32)
    y = jnp.stack([wt, wt, wt], axis=-1)

    def run():
        params = net.init(jax.random.PRNGKey(0), jnp.zeros_like(x))
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(1))
        # NOTE: jax.block_until_ready is unreliable on the axon remote
        # platform; time with forced value readback (utils/timing.py).
        dt, _ = time_step_chain(step, state, x, y, iters=iters, warmup=warmup)
        return dt

    dt = _with_retries(run, "train_step")
    return batch / dt


def bench_search(pc_k: int = 1) -> float:
    """configs[3]: bilevel search step seconds at 128³ (packed + merged,
    remat fully off — fits HBM and is the shipped default since round 3:
    0.934 s/step vs 1.305 with cell remat, PERF_NOTES round 3).

    pc_k > 1 measures the opt-in partial-channel search
    (search.partial_channels, PERF_NOTES round-5) — reported as its own
    stderr metric under BENCH_PC=1, never as the default-semantics one."""
    from nas_3d_unet_tpu.models.genotype import init_alphas
    from nas_3d_unet_tpu.models.unet import SuperNet, arch_weights_from_alphas
    from nas_3d_unet_tpu.search.bilevel import SearchState, make_search_step
    from nas_3d_unet_tpu.utils.timing import time_step_chain
    import optax

    patch = int(os.environ.get("BENCH_PATCH", "128"))
    iters = int(os.environ.get("BENCH_SEARCH_ITERS", "5"))

    net = SuperNet(in_channels=4, num_classes=3, base_channels=16, depth=3,
                   n_nodes=3, gn_groups=8, norm="group", remat=False,
                   remat_edges=False, dtype_name="bfloat16", packed=True,
                   unpack_head=False, pc_k=pc_k)
    w_tx = optax.adamw(3e-4, weight_decay=1e-4)
    a_tx = optax.adamw(3e-4, weight_decay=1e-3)
    step = make_search_step(net.apply, w_tx, a_tx,
                            augment=dict(flip_prob=0.5, intensity_shift=0.1,
                                         intensity_scale=0.1))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, patch, patch, patch, 4)).astype(np.float32))
    wt = (x[..., 1] > 0.5).astype(jnp.float32)
    y = jnp.stack([wt, wt, wt], axis=-1)

    def run():
        alphas = init_alphas(jax.random.PRNGKey(0), 3)
        params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x),
                          arch_weights_from_alphas(alphas))
        state = SearchState(params=params, w_opt=w_tx.init(params),
                            alphas=alphas, a_opt=a_tx.init(alphas),
                            step=jnp.asarray(0, jnp.int32),
                            rng=jax.random.PRNGKey(2))
        dt, _ = time_step_chain(step, state, x, y, x, y, iters=iters, warmup=2)
        return dt

    return _with_retries(run, "search_step")


def bench_infer() -> float:
    """configs[1]: whole-volume sliding-window sec/patient on the shipped
    product path (predict_dataset's pipelined loop): device-side stitch +
    on-device label decode + on-device Dice, with patient i's uint8 label
    readback/uncrop running on the writer thread WHILE patient i+1 stitches
    (round-5 overlap, infer/predict.py predict_records).  Timed as the wall
    of the whole pipelined run over several patients ÷ patients, fenced by
    the readbacks the run itself performs.  The old probs route pulls 75 MB
    of fp32 buffers through the axon tunnel and measures 5-19 s of
    rig-transfer variance instead of the framework (PERF_NOTES round-3
    "device-side label decode")."""
    from nas_3d_unet_tpu.infer.predict import predict_records
    from nas_3d_unet_tpu.infer.sliding import SlidingWindowPredictor
    from nas_3d_unet_tpu.models.genotype import default_genotype
    from nas_3d_unet_tpu.models.unet import DerivedNet

    net = DerivedNet(genotype=default_genotype(3), in_channels=4, num_classes=3,
                     base_channels=16, depth=3, n_nodes=3, gn_groups=8,
                     norm="group", remat=False, dtype_name="float32", packed=True)
    rng = np.random.default_rng(0)
    shape = (160, 192, 152)
    params = net.init(jax.random.PRNGKey(0),
                      np.zeros((1, 128, 128, 128, 4), np.float32))
    pred = SlidingWindowPredictor(net.apply, params, (128, 128, 128),
                                  overlap=0.5, batch_size=1, num_classes=3)

    # 4 keeps round-over-round comparability; the pipeline's fill/drain is
    # amortized over n patients, so BENCH_INFER_PATIENTS=12 approaches the
    # steady-state per-patient wall (PERF_NOTES round-5 infer note)
    n = int(os.environ.get("BENCH_INFER_PATIENTS", "4"))
    recs = []
    for i in range(n):
        vol = rng.standard_normal((*shape, 4)).astype(np.float32)
        lab = (rng.integers(0, 3, shape) * 2).astype(np.uint8)  # {0,2,4}
        recs.append({
            "patient": f"bench_{i}",
            "image": vol,
            "image_dev": jax.device_put(vol),
            "label_dev": jax.device_put(lab),
            "crop_start": np.zeros(3, np.int64),
            "orig_shape": np.asarray(shape, np.int64),
        })

    def run():
        # compile + warm the FULL per-patient path (stitch, decode, dice)
        # — one pipelined patient, fenced by its own readbacks
        predict_records(pred, [(recs[0]["patient"], recs[0])],
                        out_dir=None, verbose=False)
        t0 = time.perf_counter()
        out = predict_records(pred, [(r["patient"], r) for r in recs],
                              out_dir=None, verbose=False)
        dt = (time.perf_counter() - t0) / n
        assert len(out) == n
        return dt

    return _with_retries(run, "infer_volume")


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # secondary configs run by default; a failure there must not zero the
    # headline metric, so they are individually fenced
    if os.environ.get("BENCH_SEARCH", "1") == "1":
        try:
            dt = bench_search()
            print(json.dumps({"metric": "search_step_seconds_128c_bf16",
                              "value": round(dt, 4), "unit": "s/step"}),
                  file=sys.stderr)
        except Exception as e:
            print(json.dumps({"event": "bench_error", "label": "search",
                              "error": str(e)[:300]}), file=sys.stderr)
    # opt-in: the partial-channel search step (search.partial_channels=K,
    # NOT the reference semantics — kept off the default lines)
    if os.environ.get("BENCH_PC", "0") == "1":
        k = int(os.environ.get("BENCH_PC_K", "2"))
        try:
            dt = bench_search(pc_k=k)
            print(json.dumps({"metric": f"search_pc{k}_step_seconds_128c_bf16",
                              "value": round(dt, 4), "unit": "s/step"}),
                  file=sys.stderr)
        except Exception as e:
            print(json.dumps({"event": "bench_error", "label": f"search_pc{k}",
                              "error": str(e)[:300]}), file=sys.stderr)
    if os.environ.get("BENCH_INFER", "1") == "1":
        try:
            dt = bench_infer()
            print(json.dumps({"metric": "infer_seconds_per_patient_device_side",
                              "value": round(dt, 4), "unit": "s/patient"}),
                  file=sys.stderr)
        except Exception as e:
            print(json.dumps({"event": "bench_error", "label": "infer",
                              "error": str(e)[:300]}), file=sys.stderr)

    pps = bench_train()
    prev = _prev_baseline()
    print(json.dumps({
        "metric": "derived_train_patches_per_sec_per_chip_128c_bf16",
        "value": round(pps, 4),
        "unit": "patches/s/chip",
        "vs_baseline": round(pps / prev, 4) if prev else 1.0,
    }))


if __name__ == "__main__":
    main()
