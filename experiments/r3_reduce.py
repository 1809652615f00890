"""Round-3: full-volume → (B, rC) reduction strategies (the GN-stats wall).

GN fwd measured 1.18 ms vs a ~0.2 ms bandwidth roofline at the level-0
packed shape; round-1 already found tiny-output reductions ~45× off
roofline.  Compare XLA reduce vs MXU ones-matmul formulations, chained 8×
inside one jit, fenced.
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
from nas_3d_unet_tpu.utils.timing import time_fn

SHAPE = (1, 128, 128, 16, 128)
N = 8


def chain(f):
    """Chain N dependent evaluations (x perturbed by the prior result's
    first element so XLA cannot CSE or dead-code any iteration)."""
    def run(x):
        acc = jnp.float32(0)
        for _ in range(N):
            s = f(x)
            acc = acc + jnp.sum(s)
            x = x + (acc * 1e-20).astype(x.dtype)
        return acc
    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32), jnp.bfloat16)
    b, d, h, wp, rc = SHAPE
    v = d * h * wp
    ones = jnp.ones((v,), jnp.bfloat16)

    def red_sum(x):
        return jnp.sum(x, axis=(1, 2, 3), dtype=jnp.float32)

    def red_sum2d(x):
        return jnp.sum(x.reshape(b, v, rc), axis=1, dtype=jnp.float32)

    def red_dot(x):
        x2 = x.reshape(b, v, rc)
        return jax.lax.dot_general(ones, x2, (((0,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def red_sq_sum(x):
        return jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2, 3))

    def red_sq_dot(x):
        # square in bf16? no — squares via f32 elementwise feeding a dot
        # don't fuse; use x (*) x through dot batch trick is not expressible.
        # Try: upcast-square then 2D f32 sum (baseline for s2).
        x2 = jnp.square(x.astype(jnp.float32)).reshape(b, v, rc)
        return jnp.sum(x2, axis=1)

    def red_both_dot(x):
        # one dot computing s1 AND s2: contract [1 | x] rows? s2 needs x*x;
        # stack x and x*x along channels (bf16 mul), one ones-dot
        x2 = x.reshape(b, v, rc)
        xx = (x2 * x2)  # bf16 square (precision loss! measurement only)
        cat = jnp.concatenate([x2, xx], axis=-1)
        return jax.lax.dot_general(ones, cat, (((0,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def normalize_only(x):
        a = jnp.float32(1.001)
        return jnp.sum((x * a.astype(x.dtype)).astype(jnp.float32)[0, 0, 0])

    out = {}
    for name, f in [("sum_4d", red_sum), ("sum_2d", red_sum2d),
                    ("dot_ones", red_dot), ("sq_sum", red_sq_sum),
                    ("sq_sum2d", red_sq_dot), ("both_dot_bf16sq", red_both_dot),
                    ("normalize_pass", normalize_only)]:
        t, _ = time_fn(chain(f), x, iters=8, warmup=2)
        out[name] = round(t / N * 1e3, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
