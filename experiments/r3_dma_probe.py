"""Pallas DMA bandwidth probe: can a copy kernel sustain HBM peak?

The pgemm kernel family measures DMA-bound at ~150-300 GB/s effective
(nodot 1.23 ms for 323 MB).  This probe times pure copy pallas_calls at
several block sizes against jnp copy (XLA) on the same 64 MB array.
If pallas copies cap far below the measured 1019 GB/s XLA copy rate,
hand kernels on this jaxlib cannot win DMA-bound ops, full stop.
"""
import json, os, sys
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

ROWS, LANES = 128 * 2048, 128   # 64 MB bf16
x = jnp.asarray(np.random.default_rng(0).standard_normal((ROWS, LANES)), jnp.bfloat16)

def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]

def run(rows_per_block, sem):
    call = pl.pallas_call(
        copy_kernel, grid=(ROWS // rows_per_block,),
        in_specs=[pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(sem,)))
    @jax.jit
    def chain(x):
        y = x
        for _ in range(16):   # amortize the ~4 ms axon dispatch overhead
            y = call(y)
        return jnp.sum(y[0].astype(jnp.float32))
    t, _ = time_fn(chain, x, iters=8, warmup=2)
    per_copy = t / 16
    gbs = 2 * x.size * 2 / per_copy / 1e9   # read+write bytes
    mb = rows_per_block * LANES * 2 / 2**20
    print(json.dumps({"block_mb": round(mb, 2), "sem": sem,
                      "ms": round(per_copy * 1e3, 3), "GB_s": round(gbs, 1)}))

@jax.jit
def xla_chain(x):
    y = x
    for _ in range(16):
        y = y + jnp.bfloat16(1)
    return jnp.sum(y[0].astype(jnp.float32))

t, _ = time_fn(xla_chain, x, iters=8, warmup=2)
print(json.dumps({"xla_addchain_ms": round(t / 16 * 1e3, 3),
                  "GB_s": round(2 * x.size * 2 / (t / 16) / 1e9, 1)}))
for rpb in (2048, 4096, 8192):
    for sem in ("arbitrary", "parallel"):
        run(rpb, sem)
