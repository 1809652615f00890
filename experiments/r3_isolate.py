"""Round-3 isolation: where do the packed step's 117 ms actually go?

Measures, at the real packed level shapes (all levels run rc=128 lanes),
the marginal cost of:
  fwd conv, dx (input grad), dW (weight grad), GN fwd, GN fwd+bwd,
for the shipped 2D-decomposed packed conv — fenced, chained inside one jit
(axon dispatch overhead is ~1-4 ms; see PERF_NOTES "Bandwidth calibration").

Roofline context (v5e): bf16 MXU ~197 TF/s, HBM ~1 TB/s (measured 1019 GB/s).
Packed dW contraction does kp·r²·(kd·kh)·C²·V/r MACs = ~5x the logical-dW
FLOPs but at full 128-lane MXU tiles.
"""

import json
import os
import sys
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nas_3d_unet_tpu.ops.packed import (packed_conv, packed_group_norm,
                                        standard_layout)
from nas_3d_unet_tpu.utils.timing import time_fn

N_CHAIN = 6


def bench_conv(shape_bdhwc, r, cin, cout, dtype=jnp.bfloat16, stride=1,
               mode="d2"):
    b, d, h, wp, rc = shape_bdhwc
    assert rc == r * cin
    lin = standard_layout(r, cin)
    r_out = r if stride == 1 else max(1, r // 2)
    lout = standard_layout(r_out, cout)
    w_in = wp * r
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape_bdhwc).astype(np.float32), dtype)
    ws = [jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.05,
                      dtype) for _ in range(N_CHAIN)]

    conv = partial(packed_conv, lin=lin, lout=lout, w_in=w_in,
                   kernel=(3, 3, 3), stride=stride, conv_mode=mode)

    @jax.jit
    def fwd_chain(x, ws):
        y = x
        for w in ws:
            y = conv(y, w)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def fwd_fan(x, ws):
        # square the outputs so the gradient's dy is a REAL tensor — with a
        # plain sum, dy == ones and XLA constant-folds the dW contraction
        # into a window-sum (observed: gw_fan FASTER than fwd_fan)
        acc = jnp.float32(0)
        for w in ws:
            y = conv(x, w)
            acc += jnp.sum(jnp.square(y.astype(jnp.float32)))
        return acc

    @jax.jit
    def gx_chain(x, ws):
        return jax.grad(lambda x: fwd_chain.__wrapped__(x, ws))(x)

    @jax.jit
    def gw_fan(x, ws):
        return jax.grad(lambda ws: fwd_fan.__wrapped__(x, ws))(ws)

    @jax.jit
    def gboth_chain(x, ws):
        return jax.grad(lambda a: fwd_chain.__wrapped__(a[0], a[1]))((x, ws))

    out = {}
    t, _ = time_fn(fwd_chain, x, ws, iters=8, warmup=2)
    out["fwd_chain"] = t
    t, _ = time_fn(fwd_fan, x, ws, iters=8, warmup=2)
    out["fwd_fan"] = t
    t, _ = time_fn(gx_chain, x, ws, iters=8, warmup=2)
    out["gx_chain"] = t
    t, _ = time_fn(gw_fan, x, ws, iters=8, warmup=2)
    out["gw_fan"] = t
    t, _ = time_fn(gboth_chain, x, ws, iters=8, warmup=2)
    out["gboth_chain"] = t

    n = N_CHAIN
    out_ms = {k: round(v * 1e3, 2) for k, v in out.items()}
    marg = {
        "fwd": (out["fwd_chain"]) / n,
        "dx": (out["gx_chain"] - out["fwd_chain"]) / n,
        "dw": (out["gw_fan"] - out["fwd_fan"]) / n,
        "dx_dw": (out["gboth_chain"] - out["fwd_chain"]) / n,
    }
    return {"chain_ms": out_ms,
            "marginal_ms_per_conv": {k: round(v * 1e3, 3) for k, v in marg.items()}}


def bench_gemmroof(dtype=jnp.bfloat16):
    """MXU/bandwidth ceiling for the shift-GEMM packed-conv formulation.

    The packed L0 conv is exactly 18 taps of (V,128)@(128,128) on shifted
    views (the one-hot construction folds all lane mixing into the tap
    matrices).  A Pallas kernel would read x ONCE (tiles in VMEM) and run
    the 18 matmuls per tile.  Ceilings measured here:
      g_sum18:   y = Σ_t x @ A_t   (no shifts) — XLA reads x per dot: the
                 bandwidth-limited version of the kernel's inner loop
      g_im2col:  one (V,2304)@(2304,128) GEMM — classic im2col ceiling
      g_one:     single (V,128)@(128,128) tap — per-tap MXU efficiency
    """
    V = 128 * 128 * 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((V, 128)).astype(np.float32), dtype)
    ats = jnp.asarray(rng.standard_normal((18, 128, 128)).astype(np.float32) * .05,
                      dtype)
    big = jnp.asarray(rng.standard_normal((2304, 128)).astype(np.float32) * .05,
                      dtype)
    xw = jnp.asarray(rng.standard_normal((V, 2304)).astype(np.float32), dtype)

    @jax.jit
    def g_sum18(x, ats):
        acc = None
        for t in range(18):
            y = jax.lax.dot(x, ats[t], precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return acc.astype(jnp.bfloat16)

    @jax.jit
    def g_im2col(xw, big):
        return jax.lax.dot(xw, big,
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def g_one(x, a):
        return jax.lax.dot(x, a,
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def g_chain36(x, ats):
        # dependent chain: per-step traffic is the minimum (read+write one
        # (V,128) bf16) — XLA's efficiency at the tap-GEMM shape itself
        y = x
        for t in range(36):
            y = jax.lax.dot(y, ats[t % 18],
                            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return y

    out = {}
    t, _ = time_fn(g_chain36, x, ats, iters=8, warmup=2)
    out["g_chain36_ms"] = round(t * 1e3, 3)
    out["g_chain_ms_per_tap"] = round(t * 1e3 / 36, 4)
    t, _ = time_fn(g_sum18, x, ats, iters=8, warmup=2)
    out["g_sum18_ms"] = round(t * 1e3, 3)
    t, _ = time_fn(g_im2col, xw, big, iters=8, warmup=2)
    out["g_im2col_ms"] = round(t * 1e3, 3)
    t, _ = time_fn(g_one, x, ats[0], iters=8, warmup=2)
    out["g_one_ms"] = round(t * 1e3, 3)
    return out


def bench_gn(shape_bdhwc, r, c, groups=8, dtype=jnp.bfloat16):
    lay = standard_layout(r, c)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape_bdhwc).astype(np.float32), dtype)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    def gn1(x):
        return packed_group_norm(x, scale, bias, groups, lay, relu=True)

    @jax.jit
    def fwd(x):
        y = x
        for _ in range(N_CHAIN):
            y = gn1(y)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def bwd(x):
        return jax.grad(lambda x: fwd.__wrapped__(x))(x)

    tf_, _ = time_fn(fwd, x, iters=8, warmup=2)
    tb, _ = time_fn(bwd, x, iters=8, warmup=2)
    return {"fwd_ms_per_gn": round(tf_ / N_CHAIN * 1e3, 3),
            "fwdbwd_ms_per_gn": round(tb / N_CHAIN * 1e3, 3)}


def main():
    which = os.environ.get("WHICH", "modes,gn0")
    results = {}
    if "modes" in which:   # conv lowering shoot-out at level 0
        for mode in os.environ.get("MODES", "d2,wcat,3d").split(","):
            results[f"conv_L0_{mode}"] = bench_conv(
                (1, 128, 128, 16, 128), 8, 16, 16, mode=mode)
    if "conv0" in which:   # level 0: r=8, c=16
        results["conv_L0_r8c16"] = bench_conv((1, 128, 128, 16, 128), 8, 16, 16)
    if "conv1" in which:   # level 1: r=4, c=32
        results["conv_L1_r4c32"] = bench_conv((1, 64, 64, 16, 128), 4, 32, 32)
    if "conv0w" in which:  # level-0 wide: cell concat input 3c -> c
        results["conv_L0_r8c48_16"] = bench_conv((1, 128, 128, 16, 384), 8, 48, 16)
    if "gn0" in which:
        results["gn_L0_r8c16"] = bench_gn((1, 128, 128, 16, 128), 8, 16)
    if "gemmroof" in which:
        results["gemmroof"] = bench_gemmroof()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
