"""Single-pass per-lane reduction kernels for packed GroupNorm stats.

The packed GN (ops/packed.py _gn_core) needs, per full-volume tensor:
  forward:  s1 = Σ x,  s2 = Σ x²        (B, rC) fp32
  backward: r1 = Σ dy, r2 = Σ dy·x      (B, rC) fp32

XLA lowers these as separate reduce fusions, each reading the volume —
measured ~0.7 ms per pair-member at the level-0 shape vs a 64 µs
single-read roofline (the round-1 "tiny-output reduction" wall).  These
kernels read the volume ONCE and emit both sums per pass: per-tile partial
sums via an MXU ones-row dot (rows reduce on the MXU, lanes preserved),
then a tiny XLA reduction over tiles.

Stats outputs are tiny, so the pallas_call boundary costs no fusion
opportunities downstream (the round-1 lesson about big-output Pallas
kernels does not apply).  Lanes L may be any multiple of 128 (packed
tensors run rC ∈ {128, 256, 384}).  Shapes that don't tile fall back to
XLA in the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128
_TARGET_ELEMS = 2048 * 128    # per-tile VMEM budget (fp32 working set ~1 MB)


def _pick_tile(rows: int, lanes: int) -> int:
    t = max(8, min(rows, _TARGET_ELEMS // lanes))
    while rows % t:
        t -= 1
    return t


def _moments_kernel(x_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)                  # (T, L)
    ones = jnp.ones((1, x.shape[0]), jnp.float32)
    out_ref[0, 0, 0] = jnp.dot(ones, x, preferred_element_type=jnp.float32)[0]
    out_ref[0, 0, 1] = jnp.dot(ones, x * x, preferred_element_type=jnp.float32)[0]


def _weighted_kernel(g_ref, x_ref, out_ref):
    g = g_ref[0].astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32)
    ones = jnp.ones((1, g.shape[0]), jnp.float32)
    out_ref[0, 0, 0] = jnp.dot(ones, g, preferred_element_type=jnp.float32)[0]
    out_ref[0, 0, 1] = jnp.dot(ones, g * x, preferred_element_type=jnp.float32)[0]


def stats_viable(shape) -> bool:
    """(B, ..., L): lanes a multiple of 128 and at least 8 rows."""
    lanes = shape[-1]
    rows = 1
    for s in shape[1:-1]:
        rows *= s
    return lanes % LANES == 0 and rows >= 8


def moments(x: Array, interpret: bool = False) -> tuple[Array, Array]:
    """x (B, ..., L) → (Σx, Σx²) over all non-batch, non-lane dims: (B, L) fp32.

    One volume read for both sums."""
    b, lanes = x.shape[0], x.shape[-1]
    x2 = x.reshape(b, -1, lanes)
    rows = x2.shape[1]
    t = _pick_tile(rows, lanes)
    parts = pl.pallas_call(
        _moments_kernel,
        grid=(b, rows // t),
        in_specs=[pl.BlockSpec((1, t, lanes), lambda bb, tt: (bb, tt, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 2, lanes), lambda bb, tt: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows // t, 2, lanes), jnp.float32),
        interpret=interpret,
    )(x2)
    sums = parts.sum(axis=1)                          # (B, 2, L) — tiny
    return sums[:, 0], sums[:, 1]


def weighted_sums(g: Array, x: Array,
                  interpret: bool = False) -> tuple[Array, Array]:
    """(Σ g, Σ g·x) over non-batch/lane dims: (B, L) fp32, one pass."""
    b, lanes = x.shape[0], x.shape[-1]
    g2 = g.reshape(b, -1, lanes)
    x2 = x.reshape(b, -1, lanes)
    rows = x2.shape[1]
    t = _pick_tile(rows, lanes)
    spec = pl.BlockSpec((1, t, lanes), lambda bb, tt: (bb, tt, 0),
                        memory_space=pltpu.VMEM)
    parts = pl.pallas_call(
        _weighted_kernel,
        grid=(b, rows // t),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((1, 1, 2, lanes), lambda bb, tt: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows // t, 2, lanes), jnp.float32),
        interpret=interpret,
    )(g2, x2)
    sums = parts.sum(axis=1)
    return sums[:, 0], sums[:, 1]
