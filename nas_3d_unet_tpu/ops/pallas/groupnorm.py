"""Fused GroupNorm (+ReLU) with a minimal-pass custom backward.

Motivation (see PERF_NOTES.md): the autodiff'd flax GroupNorm accounts for
~19% of the train step at 128³; its backward materializes several separate
full-volume reduction fusions plus relayout copies.  This implementation
does the minimum possible memory passes:

  forward:   K1 per-tile Σx, Σx² → tiny XLA glue → K2 normalize(+ReLU)
  backward:  K3 per-tile Σg, Σg·x → tiny XLA glue → K4 dx = A·g + B·x + C
             (dγ, dβ fall out of K3's sums — no extra pass)

Lane packing: at C < 128 a (V, C) layout would waste 128/C of every VPU op
(Mosaic pads lanes to 128).  Instead x is viewed as (B, V/F, F·C) with
F = 128/C voxels fused per 128-lane row — contiguous reshape, zero cost —
and per-channel reductions become two tiny MXU matmuls per tile
(ones-row @ tile, then lane→channel one-hot).  Requires C | 128 and
F | V; anything else falls back to the XLA reference (`group_norm_reference`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128


def group_norm_reference(x: Array, gamma: Array, beta: Array, groups: int,
                         eps: float = 1e-6, relu: bool = False) -> Array:
    """Plain-XLA GroupNorm matching flax.linen.GroupNorm semantics."""
    b = x.shape[0]
    c = x.shape[-1]
    xr = x.reshape(b, -1, groups, c // groups).astype(jnp.float32)
    mean = xr.mean(axis=(1, 3), keepdims=True)
    var = xr.var(axis=(1, 3), keepdims=True)
    xn = (xr - mean) * jax.lax.rsqrt(var + eps)
    y = xn.reshape(b, -1, c) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    y = y.reshape(x.shape).astype(x.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def _sum_kernel(x_ref, out_ref):
    """Per-tile per-lane Σx and Σx² (rows reduced on the MXU)."""
    x = x_ref[0].astype(jnp.float32)                  # (T, 128)
    ones = jnp.ones((1, x.shape[0]), jnp.float32)
    out_ref[0, 0, 0] = jnp.dot(ones, x, preferred_element_type=jnp.float32)[0]
    out_ref[0, 0, 1] = jnp.dot(ones, x * x, preferred_element_type=jnp.float32)[0]


def _gsum_kernel(g_ref, x_ref, y_ref, out_ref, *, relu):
    """Per-tile per-lane Σg and Σg·x (g masked by y>0 when ReLU was fused)."""
    g = g_ref[0].astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32)
    if relu:
        g = jnp.where(y_ref[0].astype(jnp.float32) > 0, g, 0.0)
    ones = jnp.ones((1, g.shape[0]), jnp.float32)
    out_ref[0, 0, 0] = jnp.dot(ones, g, preferred_element_type=jnp.float32)[0]
    out_ref[0, 0, 1] = jnp.dot(ones, g * x, preferred_element_type=jnp.float32)[0]


def _affine_kernel(x_ref, s_ref, t_ref, out_ref, *, relu, out_dtype):
    """y = x·s + t per lane (s, t per-batch lane vectors), optional ReLU."""
    y = x_ref[0].astype(jnp.float32) * s_ref[0, 0] + t_ref[0, 0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_dtype)


def _dx_kernel(g_ref, x_ref, y_ref, a_ref, b_ref, c_ref, out_ref, *, relu, out_dtype):
    """dx = A·g + B·x + C per lane (A, B, C per-batch lane vectors)."""
    g = g_ref[0].astype(jnp.float32)
    if relu:
        g = jnp.where(y_ref[0].astype(jnp.float32) > 0, g, 0.0)
    dx = a_ref[0, 0] * g + b_ref[0, 0] * x_ref[0].astype(jnp.float32) + c_ref[0, 0]
    out_ref[0] = dx.astype(out_dtype)


def _pick_tile(rows: int, target: int = 2048) -> int:
    t = min(rows, target)
    while rows % t:
        t -= 1
    return t


def _lane_sums(xf: Array, tile: int) -> Array:
    """(B, R, 128) → per-lane (B, 2, 128) [Σx, Σx²] via K1 + XLA tile-reduce."""
    b, rows, _ = xf.shape
    parts = pl.pallas_call(
        _sum_kernel,
        grid=(b, rows // tile),
        in_specs=[pl.BlockSpec((1, tile, LANES), lambda bb, tt: (bb, tt, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 2, LANES), lambda bb, tt: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows // tile, 2, LANES), jnp.float32),
    )(xf)
    return parts.sum(axis=1)


def _grad_lane_sums(gf: Array, xf: Array, yf: Array, tile: int, relu: bool) -> Array:
    b, rows, _ = gf.shape
    spec = lambda: pl.BlockSpec((1, tile, LANES), lambda bb, tt: (bb, tt, 0),
                                memory_space=pltpu.VMEM)
    parts = pl.pallas_call(
        functools.partial(_gsum_kernel, relu=relu),
        grid=(b, rows // tile),
        in_specs=[spec(), spec(), spec()],
        out_specs=pl.BlockSpec((1, 1, 2, LANES), lambda bb, tt: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows // tile, 2, LANES), jnp.float32),
    )(gf, xf, yf)
    return parts.sum(axis=1)


def _lane_affine(xf: Array, s: Array, t: Array, tile: int, relu: bool,
                 out_dtype) -> Array:
    b, rows, _ = xf.shape
    return pl.pallas_call(
        functools.partial(_affine_kernel, relu=relu, out_dtype=out_dtype),
        grid=(b, rows // tile),
        in_specs=[
            pl.BlockSpec((1, tile, LANES), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, LANES), lambda bb, tt: (bb, tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, out_dtype),
    )(xf, s[:, None, :], t[:, None, :])


def _lane_dx(gf: Array, xf: Array, yf: Array, a: Array, bc: Array, cc: Array,
             tile: int, relu: bool, out_dtype) -> Array:
    b, rows, _ = gf.shape
    big = lambda: pl.BlockSpec((1, tile, LANES), lambda bb, tt: (bb, tt, 0),
                               memory_space=pltpu.VMEM)
    small = lambda: pl.BlockSpec((1, 1, LANES), lambda bb, tt: (bb, 0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dx_kernel, relu=relu, out_dtype=out_dtype),
        grid=(b, rows // tile),
        in_specs=[big(), big(), big(), small(), small(), small()],
        out_specs=big(),
        out_shape=jax.ShapeDtypeStruct(gf.shape, out_dtype),
    )(gf, xf, yf, a[:, None, :], bc[:, None, :], cc[:, None, :])


def _fusable(x_shape, groups: int) -> Optional[Tuple[int, int, int]]:
    """(voxels, fuse_factor, rows) if the lane-fused layout applies."""
    c = x_shape[-1]
    if c > LANES or LANES % c:
        return None
    if groups <= 0 or c % groups:
        return None
    v = 1
    for s in x_shape[1:-1]:
        v *= s
    f = LANES // c
    if v % f:
        return None
    return v, f, v // f


def _channel_tables(b: int, c: int, f: int):
    """Lane→channel one-hot (128, C) and channel→lane tiler (C,) → (128,)."""
    lane_channel = jnp.tile(jnp.arange(c), f)                     # (128,)
    onehot = jax.nn.one_hot(lane_channel, c, dtype=jnp.float32)   # (128, C)
    return lane_channel, onehot


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm(x: Array, gamma: Array, beta: Array, groups: int,
               eps: float = 1e-6, relu: bool = False) -> Array:
    """Fused GroupNorm(+ReLU); falls back to XLA when the layout can't fuse."""
    y, _ = _gn_fwd(x, gamma, beta, groups, eps, relu)
    return y


def _gn_fwd(x, gamma, beta, groups, eps, relu):
    shape = _fusable(x.shape, groups)
    if shape is None:
        y = group_norm_reference(x, gamma, beta, groups, eps, relu)
        return y, (x, gamma, beta, None, None, None)

    b = x.shape[0]
    c = x.shape[-1]
    v, f, rows = shape
    tile = _pick_tile(rows)
    xf = x.reshape(b, rows, LANES)

    lane_channel, onehot = _channel_tables(b, c, f)
    sums = _lane_sums(xf, tile)                        # (B, 2, 128)
    ch = jnp.einsum("bkl,lc->bkc", sums, onehot)       # (B, 2, C)
    grp = ch.reshape(b, 2, groups, c // groups).sum(-1)  # (B, 2, G)
    n = jnp.float32(v * (c // groups))
    mean = grp[:, 0] / n                               # (B, G)
    var = grp[:, 1] / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)

    # per-lane affine: s = γ·rstd, t = β − γ·rstd·μ  (group stats → lanes)
    ch_group = lane_channel // (c // groups)           # (128,) lane → group
    g_lane = gamma[lane_channel].astype(jnp.float32)
    b_lane = beta[lane_channel].astype(jnp.float32)
    s = g_lane[None, :] * rstd[:, ch_group]            # (B, 128)
    t = b_lane[None, :] - s * mean[:, ch_group]
    y = _lane_affine(xf, s, t, tile, relu, x.dtype).reshape(x.shape)
    return y, (x, gamma, beta, y if relu else None, mean, rstd)


def _gn_bwd(groups, eps, relu, res, g):
    x, gamma, beta, y, mean, rstd = res
    if mean is None:  # fell back to reference — use its VJP
        def ref(xx, gg, bb):
            return group_norm_reference(xx, gg, bb, groups, eps, relu)
        _, vjp = jax.vjp(ref, x, gamma, beta)
        return vjp(g)

    b = x.shape[0]
    c = x.shape[-1]
    v, f, rows = _fusable(x.shape, groups)
    tile = _pick_tile(rows)
    cg = c // groups
    n = jnp.float32(v * cg)

    xf = x.reshape(b, rows, LANES)
    gf = g.reshape(b, rows, LANES).astype(x.dtype)
    yf = (y if y is not None else x).reshape(b, rows, LANES)

    lane_channel, onehot = _channel_tables(b, c, f)
    ch_group = lane_channel // cg

    sums = _grad_lane_sums(gf, xf, yf, tile, relu)     # (B, 2, 128): Σg, Σg·x
    ch = jnp.einsum("bkl,lc->bkc", sums, onehot)       # (B, 2, C)
    sum_g_c, sum_gx_c = ch[:, 0], ch[:, 1]             # (B, C)

    # parameter grads (x̂ = (x − μ)·rstd):
    mean_c = mean[:, jnp.arange(c) // cg]              # (B, C)
    rstd_c = rstd[:, jnp.arange(c) // cg]
    dgamma = jnp.sum((sum_gx_c - mean_c * sum_g_c) * rstd_c, axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(sum_g_c, axis=0).astype(beta.dtype)

    # With ĝ = γ_c·g (γ varies per channel WITHIN a group, so it stays
    # inside the group means):  dx = rstd·(ĝ − S1/n − x̂·S2/n)
    # where S1 = Σ_group ĝ, S2 = Σ_group ĝ·x̂ = (Σĝ·x − μ·S1)·rstd.
    gamma_c = gamma.astype(jnp.float32)[None, :]        # (1, C)
    s1 = (gamma_c * sum_g_c).reshape(b, groups, cg).sum(-1)    # (B, G)
    sum_ghat_x = (gamma_c * sum_gx_c).reshape(b, groups, cg).sum(-1)
    s2 = (sum_ghat_x - mean * s1) * rstd                       # (B, G)
    g_lane = gamma[lane_channel].astype(jnp.float32)
    rl = rstd[:, ch_group]                              # (B, 128)
    a_coef = g_lane[None, :] * rl
    b_coef = -rl * rl * (s2 / n)[:, ch_group]
    c_coef = -rl * (s1 / n)[:, ch_group] + rl * rl * mean[:, ch_group] * (s2 / n)[:, ch_group]

    dx = _lane_dx(gf, xf, yf, a_coef, b_coef, c_coef, tile, relu, x.dtype)
    return dx.reshape(x.shape), dgamma, dbeta


def _gn_fwd_rule(x, gamma, beta, groups, eps, relu):
    return _gn_fwd(x, gamma, beta, groups, eps, relu)


group_norm.defvjp(_gn_fwd_rule, _gn_bwd)
