"""Diagnose the pgemm kernel's gap to its MXU floor (0.79 ms at L0).

Self-contained pallas variants on the L0 plane geometry (nb=128 planes,
M=2048 rows, rc=128), timing the KERNEL ONLY (operands pre-built, reused
across the chain so XLA CSEs the prep):

  v_full   — shipped v3: 12 dots/plane (9 center K=128 + 3 edge K=32)
  v_nodot  — DMA + write only (no compute): per-step overhead floor
  v_c6     — 6 center dots only (FLOPs 2/3): is time ∝ dots or FLOPs?
  v_fold   — one dot/plane, K folded to 1536 via scratch concat
  v_mt     — 12 dots but M-tiled x4 (y tiles small enough for vregs)
"""

import functools
import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nas_3d_unet_tpu.utils.timing import time_fn

NB, HP, WP, RC, KE = 128, 130, 16, 128, 32
H = 128
M = H * WP
N_CHAIN = 6


def specs(ke2):
    def center(delta):
        return lambda bd: (jnp.clip(bd + delta, 0, NB - 1), 0, 0)

    ins = [pl.BlockSpec((1, HP * WP, RC), center(d), memory_space=pltpu.VMEM)
           for d in range(3)]
    ins += [pl.BlockSpec((1, HP * WP, ke2), center(d), memory_space=pltpu.VMEM)
            for d in range(3)]
    ins += [pl.BlockSpec((3, 3, RC, RC), lambda bd: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ke2, RC), lambda bd: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)]
    return ins


def k_full(x0, x1, x2, e0, e1, e2, ac, ae, o):
    xs, es = (x0, x1, x2), (e0, e1, e2)
    y = None
    for kh in range(3):
        a0 = kh * WP
        for k in range(3):
            t = jnp.dot(xs[k][0, a0:a0 + M], ac[k, kh],
                        preferred_element_type=jnp.float32)
            y = t if y is None else y + t
            y = y + jnp.dot(es[k][0, a0:a0 + M], ae[k, kh],
                            preferred_element_type=jnp.float32)
    o[0] = y.astype(o.dtype)


def k_c6(x0, x1, x2, e0, e1, e2, ac, ae, o):
    xs = (x0, x1, x2)
    y = None
    for kh in range(2):
        a0 = kh * WP
        for k in range(3):
            t = jnp.dot(xs[k][0, a0:a0 + M], ac[k, kh],
                        preferred_element_type=jnp.float32)
            y = t if y is None else y + t
    o[0] = y.astype(o.dtype)


def k_nodot(x0, x1, x2, e0, e1, e2, ac, ae, o):
    o[0] = x1[0, WP:WP + M].astype(o.dtype)


def k_fold(x0, x1, x2, e0, e1, e2, ac, ae, o, xcat):
    xs, es = (x0, x1, x2), (e0, e1, e2)
    col = 0
    for kh in range(3):
        a0 = kh * WP
        for k in range(3):
            xcat[:, col:col + RC] = xs[k][0, a0:a0 + M]
            col += RC
    for kh in range(3):
        a0 = kh * WP
        for k in range(3):
            xcat[:, col:col + KE] = es[k][0, a0:a0 + M]
            col += KE
    # zero-pad cols [col:1536) once at trace time? write zeros every step
    xcat[:, col:] = jnp.zeros((M, 1536 - col), xcat.dtype)
    o[0] = jnp.dot(xcat[:, :], ac2_global,
                   preferred_element_type=jnp.float32).astype(o.dtype)


def k_mt(x0, x1, x2, e0, e1, e2, ac, ae, o):
    xs, es = (x0, x1, x2), (e0, e1, e2)
    for mt in range(4):
        lo = mt * (M // 4)
        y = None
        for kh in range(3):
            a0 = kh * WP + lo
            for k in range(3):
                t = jnp.dot(xs[k][0, a0:a0 + M // 4], ac[k, kh],
                            preferred_element_type=jnp.float32)
                y = t if y is None else y + t
                y = y + jnp.dot(es[k][0, a0:a0 + M // 4], ae[k, kh],
                                preferred_element_type=jnp.float32)
        o[0, lo:lo + M // 4] = y.astype(o.dtype)


ac2_global = None


def run(kernel, name, scratch=False, sem="arbitrary"):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NB, HP * WP, RC)), jnp.bfloat16)
    xe = jnp.asarray(rng.standard_normal((NB, HP * WP, KE)), jnp.bfloat16)
    ac = jnp.asarray(rng.standard_normal((3, 3, RC, RC)) * .05, jnp.bfloat16)
    ae = jnp.asarray(rng.standard_normal((3, 3, KE, RC)) * .05, jnp.bfloat16)

    call = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=specs(KE),
        out_specs=pl.BlockSpec((1, M, RC), lambda bd: (bd, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, M, RC), jnp.bfloat16),
        scratch_shapes=([pltpu.VMEM((M, 1536), jnp.bfloat16)] if scratch
                        else []),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(sem,)),
    )

    @jax.jit
    def chain(x, xe, ac, ae):
        y = x
        acc = jnp.float32(0)
        for _ in range(N_CHAIN):
            y = call(y, y, y, xe, xe, xe, ac, ae)
            acc += jnp.sum(y[0, 0].astype(jnp.float32))
        return acc

    try:
        t, _ = time_fn(chain, x, xe, ac, ae, iters=8, warmup=2)
        print(json.dumps({name: round(t / N_CHAIN * 1e3, 3)}))
    except Exception as e:  # noqa
        print(name, "FAILED:", str(e)[:300])


def main():
    global ac2_global
    rng = np.random.default_rng(1)
    ac2_global = jnp.asarray(rng.standard_normal((1536, RC)) * .05,
                             jnp.bfloat16)
    which = os.environ.get("V", "nodot,c6,full,mt,fold,fullpar").split(",")
    if "nodot" in which:
        run(k_nodot, "nodot")
    if "c6" in which:
        run(k_c6, "c6")
    if "full" in which:
        run(k_full, "full")
    if "fullpar" in which:
        run(k_full, "full_parallel", sem="parallel")
    if "mt" in which:
        run(k_mt, "mt4")
    if "fold" in which:
        run(k_fold, "fold1536", scratch=True)


if __name__ == "__main__":
    main()
