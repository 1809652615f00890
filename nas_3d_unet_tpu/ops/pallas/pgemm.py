"""Shift-GEMM Pallas kernel for stride-1 packed 3³ convs.

The lane-packed conv (ops/packed.py) is structurally a sum of shifted
GEMMs: the one-hot kernel construction folds ALL lane mixing into per-tap
(rC_in × rC_out) matrices, so

    y[d, h, wp] = Σ_{kd,kh,o}  x[d+Δd, h+Δh, wp+o] @ A[kd, kh, o]

with o ∈ {−1, 0, +1} packed-W block offsets.  The shipped XLA lowering
(d2: per-kd-tap 2D convs) measures 2.08 ms/conv at the level-0 shape
against a 1.18 ms dense-MXU floor (27 K=128 tap units) — and the edge taps
(o = ±1) are ~dil/r sparse, which XLA's dense conv cannot exploit
(round-3 profile, PERF_NOTES.md).  Design (v2 — v1 with a (B·D, kd)
revisit grid + fp32 scratch measured only parity, 2.2 ms: 384 tiny grid
steps and 18 MB/plane of scratch read-modify-write traffic):

  * ONE grid step per output plane; the three kd taps are three block
    views (index maps bd, bd+dil, bd+2dil) of a D/H-pre-padded input, so
    every in-kernel read is an in-bounds slice on the UNTILED H axis — no
    masks, no halo arithmetic, no revisit scratch;
  * per kh, ONE matmul: the operand lane-concatenates the three kd center
    planes (3·rC) with a pre-merged edge operand (the o = ±1 taps' live
    lanes of all three kd planes — their row supports are the first and
    last `dil` W-slots of the block, disjoint and contiguous — padded to
    a 128-lane segment).  K = 3·rC + 128·⌈3·K_e/128⌉: 12 MXU tap units at
    level 0 instead of 27 dense (0.53 ms floor), and the three kh partial
    products sum in registers (input-side shifts keep them aligned);
  * output written once per plane — no fp32 accumulator in VMEM, no
    read-modify-write.

The backward reuses this kernel: dx of a stride-1 symmetric-SAME conv is
the same conv with the flip-transposed logical kernel, whose packed taps
have the same sparse edge structure.  dW stays on XLA's conv-grad path
(measured at ~78% of MXU peak — PERF_NOTES "packed-dW question, closed").

Reference mapping: accelerates the cuDNN-delegated conv cells of the
reference's prim_ops (SURVEY.md §2a "Pallas conv kernels … that WIN").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _edge_slots(kernel_w: int, dilation: int, r: int, pad_lo: int):
    """Live W-slot ranges of the o = ±1 packed-W taps (numpy, trace time).

    For output slot do and logical tap kw, the read position is
    t = do + dilation·kw − pad_lo; o = ⌊t/r⌋.  Returns (n_next, n_prev):
    o=+1 lives in slots [0, n_next), o=−1 in slots [r−n_prev, r)."""
    nxt, prv = set(), set()
    for kw in range(kernel_w):
        for do in range(r):
            t = do + dilation * kw - pad_lo
            if t // r == 1:
                nxt.add(t - r)
            elif t // r == -1:
                prv.add(t + r)
    n_next = (max(nxt) + 1) if nxt else 0
    n_prev = (r - min(prv)) if prv else 0
    assert nxt == set(range(n_next)), (nxt, "o=+1 slots not contiguous-from-0")
    assert prv == set(range(r - n_prev, r)), (prv, "o=-1 slots not suffix")
    return n_next, n_prev


def _kernel(xa_ref, xb_ref, ea_ref, eb_ref, ac_ref, ae_ref, o_ref, *rest,
            p_n: int, h_n: int, wp_n: int, dil: int, kh: int, rc_out: int,
            n_valid: int, stats: bool):
    m = h_n * wp_n

    def seg(ref_a, ref_b, q, a0):
        # plane q of this step's [P | 2*dil-halo] window, H rows a0..a0+h
        if q < p_n:
            v = ref_a[0, q, a0:a0 + h_n]
        else:
            v = ref_b[0, q - p_n, a0:a0 + h_n]
        return v.reshape(m, v.shape[-1])

    s1 = s2 = None
    for p in range(p_n):
        y = None
        for k in range(3):
            q = p + k * dil
            for kh_i in range(kh):
                a0 = kh_i * dil   # padded-H slice: out h reads rows h+a0
                t = jnp.dot(seg(xa_ref, xb_ref, q, a0), ac_ref[k, kh_i],
                            preferred_element_type=jnp.float32)
                y = t if y is None else y + t
                y = y + jnp.dot(seg(ea_ref, eb_ref, q, a0), ae_ref[k, kh_i],
                                preferred_element_type=jnp.float32)
        yb = y.astype(o_ref.dtype)
        o_ref[0, p] = yb.reshape(h_n, wp_n, rc_out)
        if stats:
            # GroupNorm raw moments of the ROUNDED output (matches the XLA
            # converting-reduce path bit-for-bit in what it sums), masked to
            # the valid planes (d_n may be padded up to a multiple of P)
            i = pl.program_id(1)
            yf = yb.astype(jnp.float32)
            valid = (i * p_n + p < n_valid)
            yf = jnp.where(valid, yf, 0.0)
            p1 = jnp.sum(yf, axis=0)
            p2 = jnp.sum(yf * yf, axis=0)
            s1 = p1 if s1 is None else s1 + p1
            s2 = p2 if s2 is None else s2 + p2
    if stats:
        s_ref = rest[0]
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            s_ref[0, 0] = s1
            s_ref[0, 1] = s2

        @pl.when(i > 0)
        def _acc():
            s_ref[0, 0] += s1
            s_ref[0, 1] += s2


_VMEM_BUDGET = 13 * 2 ** 20
_VMEM_HARD = 15 * 2 ** 20


def _pick_p(d_n: int, dil: int, hp: int, wp_n: int, rc: int, ke2: int,
            h_n: int, itemsize: int, rc_out: int) -> int:
    """Largest P (output planes per grid step) fitting the VMEM budget.

    Mosaic double-buffers every non-invariant ref, so the working set is
    2·(P+2dil)·(plane + edge-plane) + 2·P·out-plane.  More planes per step
    amortise the 2·dil halo re-read AND cut grid steps (the per-plane grid
    was measured DMA-bound: nodot 1.23 of full 1.53 ms — r3_pg_variants)."""
    if env_p := _env_p():
        return env_p
    for p in (8, 4, 2):
        if p % (2 * dil) == 0 and _vmem_est(
                p, dil, hp, wp_n, rc, ke2, h_n, itemsize,
                rc_out) <= _VMEM_BUDGET:
            return p
    return 2 * dil


def _vmem_est(p: int, dil: int, hp: int, wp_n: int, rc: int, ke2: int,
              h_n: int, itemsize: int, rc_out: int) -> int:
    # VMEM stores lane-padded tiles: the minor dim rounds up to 128 lanes
    # (the stem's rc_in=32 operand occupies 4x its logical bytes)
    lp = lambda n: -(-n // 128) * 128
    pb = hp * wp_n * lp(rc) * itemsize
    pe = hp * wp_n * lp(ke2) * itemsize
    po = h_n * wp_n * lp(rc_out) * itemsize
    acc = h_n * wp_n * lp(rc_out) * 4  # fp32 accumulator, unrolled per plane
    return 2 * ((p + 2 * dil) * (pb + pe) + p * po) + p * acc


def pg_vmem_feasible(*, dil: int, hp: int, wp_n: int, rc: int, ke2: int,
                     h_n: int, itemsize: int, rc_out: int) -> bool:
    """Can even the minimal plane-block count fit scoped VMEM?"""
    return _vmem_est(2 * dil, dil, hp, wp_n, rc, ke2, h_n, itemsize,
                     rc_out) <= _VMEM_HARD


def _env_p() -> int:
    import os
    return int(os.environ.get("NAS3D_PG_P", "0"))


def conv_pgemm(xp: Array, wp: Array, *, dilation: int,
               r: int, c_in: int, kernel_w: int, pad_w_lo: int,
               with_stats: bool = False, interpret: bool = False):
    """Stride-1 packed conv as a shift-GEMM Pallas kernel.

    xp: (B, D, H, Wp, rC_in) packed activations (standard layout).
    wp: (3, KH, 3, rC_in, rC_out) packed kernel (kp=3: o in {-1,0,+1}).
    Returns (B, D, H, Wp, rC_out) in xp.dtype.  Exact up to tap-summation
    order vs the d2 lowering (all taps accumulate in fp32 here; d2 rounds
    to the I/O dtype per kd tap).

    Each grid step computes P output planes from two block views of the
    SAME padded array: A = the P home planes, B = the next 2·dil halo
    planes (block index (i·P+P)/(2·dil), integral because 2·dil | P).
    Relative to the per-plane v1 grid this cuts HBM traffic from 3× to
    (P+2·dil)/P × the input and the step count by P.
    """
    b, d_n, h_n, wp_n, rc_in = xp.shape
    kd, kh, kp, _, rc_out = wp.shape
    assert kd == 3 and kp == 3, (kd, kp)
    dil = dilation
    c = c_in
    n_next, n_prev = _edge_slots(kernel_w, dil, r, pad_w_lo)
    assert n_next and n_prev, (n_next, n_prev)
    ke2 = (n_next + n_prev) * c
    hp = h_n + 2 * dil

    p_n = _pick_p(d_n, dil, hp, wp_n, rc_in, ke2, h_n, xp.dtype.itemsize,
                  rc_out)
    d_cm = -(-d_n // p_n) * p_n          # padded plane count (P | d_cm)
    # total plane axis: d_cm home + 2*dil halo, rounded to P for blocking
    t_pl = -(-(d_cm + 2 * dil) // p_n) * p_n

    # ---- XLA-side prep: exactly two padded copies ----
    x_pp = jnp.pad(xp, ((0, 0), (dil, t_pl - d_n - dil), (dil, dil),
                        (0, 0), (0, 0)))

    # edge operand: live lanes of the +-1-Wp-shifted volume (disjoint
    # contiguous slot ranges), same D/H padding
    dpad = ((0, 0), (dil, t_pl - d_n - dil), (dil, dil))
    xe_n = jnp.pad(xp[:, :, :, 1:, :n_next * c], dpad + ((0, 1), (0, 0)))
    xe_p = jnp.pad(xp[:, :, :, :-1, (r - n_prev) * c:],
                   dpad + ((1, 0), (0, 0)))
    xe = jnp.concatenate([xe_n, xe_p], axis=-1)

    # per-kd tap matrices: centers (o=0 is packed index 1) and the merged
    # edge rows in the operand's lane order [next-lanes | prev-lanes]
    ac = wp[:, :, 1]                                 # (3, KH, rc_in, rc_out)
    ae = jnp.concatenate([wp[:, :, 2, :n_next * c],
                          wp[:, :, 0, (r - n_prev) * c:]], axis=2)

    kern = functools.partial(_kernel, p_n=p_n, h_n=h_n, wp_n=wp_n, dil=dil,
                             kh=kh, rc_out=rc_out, n_valid=d_n,
                             stats=with_stats)

    h2 = 2 * dil
    b_idx = p_n // h2

    def home(ib, i):
        return (ib, i, 0, 0, 0)

    def halo(ib, i):
        return (ib, i * b_idx + b_idx, 0, 0, 0)

    out_specs = [pl.BlockSpec((1, p_n, h_n, wp_n, rc_out),
                              lambda ib, i: (ib, i, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((b, d_cm, h_n, wp_n, rc_out),
                                       xp.dtype)]
    if with_stats:
        # raw GN moments (Σy, Σy²) accumulated across grid steps in a
        # constant-index revisit block (fp32, fused into the conv op)
        out_specs.append(pl.BlockSpec((1, 2, rc_out),
                                      lambda ib, i: (ib, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((b, 2, rc_out), jnp.float32))

    flops = 2 * b * d_cm * h_n * wp_n * (3 * rc_in + 3 * ke2) * rc_out * kh
    res = pl.pallas_call(
        kern,
        grid=(b, d_cm // p_n),
        in_specs=[
            pl.BlockSpec((1, p_n, hp, wp_n, rc_in), home,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2, hp, wp_n, rc_in), halo,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_n, hp, wp_n, ke2), home,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2, hp, wp_n, ke2), halo,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kh, rc_in, rc_out), lambda ib, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kh, ke2, rc_out), lambda ib, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_stats else out_specs[0],
        out_shape=out_shapes if with_stats else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(((1 + h2 / p_n) * (x_pp.size + xe.size)
                                + b * d_cm * h_n * wp_n * rc_out)
                               * xp.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(x_pp, x_pp, xe, xe, ac, ae)
    if with_stats:
        y, s = res
        return y[:, :d_n], s[:, 0], s[:, 1]
    return res[:, :d_n]


def _gemm_kernel(x_ref, w_ref, o_ref, s_ref, *, n_rows: int, rows_pb: int):
    y = jnp.dot(x_ref[0], w_ref[...], preferred_element_type=jnp.float32)
    yb = y.astype(o_ref.dtype)
    o_ref[0] = yb
    i = pl.program_id(1)
    yf = yb.astype(jnp.float32)
    if n_rows % rows_pb:
        # mask the tail block's padding rows out of the moments
        row = i * rows_pb + jax.lax.broadcasted_iota(jnp.int32, yf.shape, 0)
        yf = jnp.where(row < n_rows, yf, 0.0)
    p1 = jnp.sum(yf, axis=0)
    p2 = jnp.sum(yf * yf, axis=0)

    @pl.when(i == 0)
    def _init():
        s_ref[0, 0] = p1
        s_ref[0, 1] = p2

    @pl.when(i > 0)
    def _acc():
        s_ref[0, 0] += p1
        s_ref[0, 1] += p2


def gemm_stats(x3: Array, w2: Array, *, rows_pb: int = 2048,
               interpret: bool = False):
    """y = x3 @ w2 as a Pallas GEMM that ALSO emits GroupNorm raw moments
    of the rounded output: (y, Σy, Σy²), sums (B, N) fp32 over each
    batch's rows.

    x3: (B, V, K); w2: (K, N) — the packed 1³ conv (pure lane mix)
    collapsed over voxels.  One op replaces dot_general + the stats
    reduce: on this rig a dependent full-volume op costs ~0.5 ms
    regardless of size (PERF_NOTES "dependent-op latency floor"), so
    fusing the reduce into the GEMM's epilogue is worth more than its
    bytes."""
    b, m, k = x3.shape
    k2, n = w2.shape
    assert k == k2
    m_cm = -(-m // rows_pb) * rows_pb
    if m_cm != m:
        x3 = jnp.pad(x3, ((0, 0), (0, m_cm - m), (0, 0)))
    kern = functools.partial(_gemm_kernel, n_rows=m, rows_pb=rows_pb)
    y, s = pl.pallas_call(
        kern,
        grid=(b, m_cm // rows_pb),
        in_specs=[
            pl.BlockSpec((1, rows_pb, k), lambda ib, i: (ib, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda ib, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows_pb, n), lambda ib, i: (ib, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n), lambda ib, i: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, m_cm, n), x3.dtype),
                   jax.ShapeDtypeStruct((b, 2, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m_cm * k * n,
            bytes_accessed=(x3.size + b * m_cm * n) * x3.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x3, w2)
    return y[:, :m], s[:, 0], s[:, 1]


def pgemm_viable(*, stride: int, sp: int, r_in: int, r_out: int,
                 kd: int, kh: int, kp: int, o_min: int,
                 wp_n: int, dtype) -> bool:
    """Static dispatch gate for the shift-GEMM kernel.

    Requires: stride-1 same-r conv (r ≥ 2), kd=3 with kp=3 and
    o ∈ {−1,0,+1} (the k=3 SAME geometry at every packed level), Wp a
    whole number of sublane tiles so the in-kernel (H,Wp)→rows collapse is
    layout-free."""
    sublane = 16 if dtype == jnp.bfloat16 else 8
    return (stride == 1 and sp == 1 and r_in == r_out and r_in >= 2
            and kd == 3 and kh == 3 and kp == 3 and o_min == -1
            and wp_n % sublane == 0 and wp_n >= sublane)
