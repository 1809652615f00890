"""Chip A/B for the round-3 dispatch-amortization + bf16-inference features.

Modes (arg 1):
  stepn    — derived train step, 128³ bf16 packed no-remat (the bench
             config): single-step driver vs make_train_step_n with
             n ∈ {2, 4, 8}.  Reports ms per LOGICAL step; the expected win
             is the ~1-4 ms/dispatch axon relay gap (PERF_NOTES round 3:
             92.07 ms wall vs 88.15 ms device span), paid once per n steps.
  infer16  — whole-volume sliding window (bench_infer geometry), fp32 body
             vs bf16 body (infer.dtype); device-side s/patient, fenced.

Chip must be idle (concurrent CPU load corrupts axon timings — PERF_NOTES
round-3 methodology note).
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
from nas_3d_unet_tpu.train.loop import (TrainState, make_optimizer,
                                        make_train_step, make_train_step_n)
from nas_3d_unet_tpu.utils.timing import fence, time_fn, time_step_chain


def _bench_net(dtype="bfloat16", packed=True, unpack_head=None):
    # training keeps the head packed (packed-layout loss); inference needs
    # the unpacked (B,D,H,W,K) head for the stitcher
    if unpack_head is None:
        unpack_head = not packed
    return DerivedNet(genotype=default_genotype(3), in_channels=4,
                      num_classes=3, base_channels=16, depth=3, n_nodes=3,
                      gn_groups=8, norm="group", remat=False,
                      dtype_name=dtype, packed=packed,
                      unpack_head=unpack_head)


def _batch(patch=128, b=1, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, patch, patch, patch, 4)).astype(np.float32))
    wt = (x[..., 1] > 0.5).astype(jnp.float32)
    y = jnp.stack([wt, wt, wt], axis=-1)
    return x, y


def mode_stepn():
    patch = int(os.environ.get("PATCH", "128"))
    net = _bench_net()
    tx = make_optimizer(3e-4, 1e-4)
    aug = dict(flip_prob=0.5, intensity_shift=0.1, intensity_scale=0.1)
    x, y = _batch(patch)

    def init_state():
        params = net.init(jax.random.PRNGKey(0), jnp.zeros_like(x))
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.asarray(0, jnp.int32),
                          rng=jax.random.PRNGKey(1))

    step1 = make_train_step(net.apply, tx, augment=aug)
    dt1, _ = time_step_chain(step1, init_state(), x, y, iters=16, warmup=3)
    print(json.dumps({"mode": "stepn", "n": 1,
                      "ms_per_step": round(dt1 * 1e3, 2)}), flush=True)

    for n in (2, 4, 8):
        stepn = make_train_step_n(net.apply, tx, augment=aug)
        xs = jnp.stack([x] * n)
        ys = jnp.stack([y] * n)
        calls = max(2, 16 // n)
        dtn, _ = time_step_chain(stepn, init_state(), xs, ys,
                                 iters=calls, warmup=2)
        print(json.dumps({"mode": "stepn", "n": n,
                          "ms_per_step": round(dtn * 1e3 / n, 2),
                          "ms_per_call": round(dtn * 1e3, 2)}), flush=True)


def mode_infer16():
    from nas_3d_unet_tpu.infer.sliding import SlidingWindowPredictor

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((160, 192, 152, 4)).astype(np.float32)
    vol_dev = jax.device_put(vol)
    x0 = np.zeros((1, 128, 128, 128, 4), np.float32)

    net32 = _bench_net("float32", unpack_head=True)
    params = net32.init(jax.random.PRNGKey(0), x0)
    out = {}
    for name, dtype in (("f32", "float32"), ("bf16", "bfloat16")):
        net = _bench_net(dtype, unpack_head=True)
        pred = SlidingWindowPredictor(net.apply, params, (128, 128, 128),
                                      overlap=0.5, batch_size=1, num_classes=3)
        dt, probs = time_fn(pred.predict_volume, vol_dev, iters=4, warmup=1)
        out[name] = np.asarray(probs)
        print(json.dumps({"mode": "infer16", "body": name,
                          "s_per_patient": round(dt, 4)}), flush=True)
    agree = float(np.mean((out["f32"] > 0.5) == (out["bf16"] > 0.5)))
    print(json.dumps({"mode": "infer16", "threshold_agreement": round(agree, 6),
                      "max_abs_diff": round(float(np.max(np.abs(out["f32"] - out["bf16"]))), 4)}),
          flush=True)


def mode_labels():
    """Wall s/patient: probs path (75 MB fp32 readback) vs device-decode
    label path (4.7 MB uint8) for both body dtypes."""
    from nas_3d_unet_tpu.infer.sliding import SlidingWindowPredictor

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((160, 192, 152, 4)).astype(np.float32)
    vol_dev = jax.device_put(vol)
    x0 = np.zeros((1, 128, 128, 128, 4), np.float32)

    params = _bench_net("float32", unpack_head=True).init(jax.random.PRNGKey(0), x0)
    for name, dtype in (("f32", "float32"), ("bf16", "bfloat16")):
        net = _bench_net(dtype, unpack_head=True)
        pred = SlidingWindowPredictor(net.apply, params, (128, 128, 128),
                                      overlap=0.5, batch_size=1, num_classes=3)
        dt_p, _ = time_fn(pred.predict_volume, vol_dev, iters=4, warmup=1)

        def labels_host(v):
            return np.asarray(pred.predict_labels(v))   # includes the readback

        dt_l, lab = time_fn(labels_host, vol_dev, iters=4, warmup=1)
        print(json.dumps({"mode": "labels", "body": name,
                          "probs_s_per_patient": round(dt_p, 4),
                          "labels_s_per_patient": round(dt_l, 4),
                          "label_hist": {int(k): int(c) for k, c in
                                         zip(*np.unique(lab, return_counts=True))}}),
              flush=True)


if __name__ == "__main__":
    {"stepn": mode_stepn, "infer16": mode_infer16, "labels": mode_labels}[sys.argv[1]]()
