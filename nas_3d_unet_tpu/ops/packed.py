"""Lane-packed execution: W-major channel packing for small-C 3D conv nets.

Motivation (measured, v5e, round 2): at 128³ with C=16 channels-last, XLA's
3³ conv runs ~30× off both the MXU and HBM rooflines — Cout=16 fills 16 of
the MXU's 128 lanes, and the T(8,128) tiled layout plus the relayout copies
XLA inserts around its internal conv layouts dominate the train step
(PERF_NOTES.md "Train-step device profile").

The fix is representational, not a kernel: pack r consecutive W-voxels into
the channel dimension,

    (B, D, H, W, C)  →  (B, D, H, W/r, r·C)        r = packing factor

which is a FREE reshape in row-major (W-major over C), and execute every op
directly on the packed representation:

  * 3³/1³ (dilated/strided) convs become dense packed convs whose kernels
    are exact scatters of the logical kernels along the packed-W axis: a tap
    at original offset (kw, δ_out) lands in packed-block offset
    ⌊t/r⌋, slot t mod r, t = stride·δ_out + dilation·kw − pad.  The packed
    conv does r× the logical FLOPs but those extra FLOPs ride otherwise-idle
    MXU lanes (same MXU cycles), while HBM traffic drops ~r×.
  * k2s2 transpose conv: lhs-dilated conv over (D, H) with the W-axis
    upsample folded into channels, then a free reshape splits W back out.
  * GroupNorm: statistics are sums over (D, H, Wp) plus a fold of the r
    sub-positions — tiny-vector math; the normalize pass is elementwise with
    r-tiled scale/bias.  No reshape of the volume is needed.
  * identity / none / ReLU / weighted sums: unchanged elementwise.

Parameters stay in their LOGICAL shapes (the scatter runs inside the jitted
step and is differentiable — its transpose is a gather), so checkpoints and
param trees are identical across the packed flag.

With base_channels=16, depth 3, r_l = 128/C_l gives every level tensors of
shape (B, D_l, H_l, 16, {128, 384}) — full 128-lane tiles everywhere, at
every level of the U-shape.

Reference: this replaces the cuDNN delegation of the reference's prim_ops
(SURVEY.md §2 "Primitive ops", §2a) with a TPU-native execution layout.
"""

from __future__ import annotations

import functools
import os as _os
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Layouts
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PackedLayout:
    """Describes how logical (W-slot δ, channel c) pairs map to packed
    channel positions.  `idx[δ, c]` = packed channel index.  Static
    (trace-time) metadata — never traced."""

    r: int
    c: int                      # logical channel count
    idx: Tuple[Tuple[int, ...], ...]  # (r, c) -> packed position

    @property
    def packed_channels(self) -> int:
        return self.r * self.c

    def index(self) -> np.ndarray:
        return np.asarray(self.idx, dtype=np.int64)


def standard_layout(r: int, c: int) -> PackedLayout:
    """The layout produced by `pack`: packed position = δ·c + ch."""
    idx = np.arange(r * c).reshape(r, c)
    return PackedLayout(r=r, c=c, idx=tuple(map(tuple, idx.tolist())))


def concat_layouts(layouts: Sequence[PackedLayout]) -> PackedLayout:
    """Layout of jnp.concatenate([packed tensors], axis=-1).

    All inputs must share r.  Logical channels concatenate in order; the
    packed positions of part i are offset by the total packed width before
    it (packed concat ≠ pack of logical concat, which is why consumers use
    layout-aware weight scatters instead of re-packing)."""
    r = layouts[0].r
    assert all(l.r == r for l in layouts)
    parts = []
    off = 0
    for l in layouts:
        parts.append(l.index() + off)
        off += l.packed_channels
    idx = np.concatenate(parts, axis=1)           # (r, sum_c)
    return PackedLayout(r=r, c=idx.shape[1], idx=tuple(map(tuple, idx.tolist())))


def pack(x: Array, r: int) -> Array:
    """(B, D, H, W, C) → (B, D, H, W/r, r·C).  Free reshape (row-major)."""
    b, d, h, w, c = x.shape
    assert w % r == 0, f"W={w} not divisible by packing factor r={r}"
    return x.reshape(b, d, h, w // r, r * c)


def unpack(x: Array, r: int) -> Array:
    """(B, D, H, Wp, r·C) → (B, D, H, Wp·r, C).  Free reshape.  Only valid
    for the standard layout."""
    b, d, h, wp, rc = x.shape
    assert rc % r == 0
    return x.reshape(b, d, h, wp * r, rc // r)


# ---------------------------------------------------------------------------
# Padding helper (explicit lax-SAME arithmetic so semantics never drift)
# ---------------------------------------------------------------------------


def same_pad(in_size: int, kernel: int, stride: int, dilation: int) -> Tuple[int, int]:
    """lax 'SAME' padding (lo, hi) for one spatial dim."""
    out = -(-in_size // stride)                    # ceil
    k_eff = dilation * (kernel - 1) + 1
    total = max(0, (out - 1) * stride + k_eff - in_size)
    return total // 2, total - total // 2


# ---------------------------------------------------------------------------
# General packed conv (kernels 1..3 per axis, stride 1/2, dilation 1/2)
# ---------------------------------------------------------------------------


def _w_tap_plan(kernel_w: int, stride: int, dilation: int,
                lin: PackedLayout, lout: PackedLayout,
                w_in: int) -> Tuple[int, int, int, Tuple[int, int]]:
    """Packed-W geometry of a conv: every logical W-tap kw reaching output
    slot δo reads input W offset t = stride·δo + dilation·kw − pad_lo, i.e.
    packed-block offset o = ⌊t/r_in⌋, slot δi = t mod r_in.

    Returns (o_min, kp, sp, (pad_lo_p, pad_hi_p)): the minimum block
    offset, the packed kernel width, the packed-W conv stride, and the
    explicit packed-W padding."""
    r_in, r_out = lin.r, lout.r
    pad_lo, _ = same_pad(w_in, kernel_w, stride, dilation)
    sp_num = stride * r_out
    assert sp_num % r_in == 0, (stride, r_out, r_in)
    sp = sp_num // r_in

    offs = [(stride * do + dilation * kw - pad_lo) // r_in
            for kw in range(kernel_w) for do in range(r_out)]
    o_min, o_max = min(offs), max(offs)

    w_out = -(-w_in // stride)
    wp_in = w_in // r_in
    wp_out = w_out // r_out
    pad_lo_p = -o_min
    pad_hi_p = max(0, sp * (wp_out - 1) + o_max - (wp_in - 1))
    kp = o_max - o_min + 1
    return o_min, kp, sp, (pad_lo_p, pad_hi_p)


def packed_kernel_weights(w: Array, lin: PackedLayout, lout: PackedLayout,
                          *, w_in: int, kernel: Tuple[int, int, int],
                          stride: int = 1, dilation: int = 1):
    """Build the dense packed kernel for a logical conv kernel `w`.

    Returns (wp, o_min, kp, sp, (plo, phi)): the packed kernel
    (kd, kh, kp, r_in·Cin, r_out·Cout), the minimum W-block offset, packed
    kernel width, packed-W stride, and explicit packed-W padding.  One dense
    einsum against a trace-time one-hot constant — NOT a scatter (see
    packed_conv)."""
    kd, kh, kw_sz = kernel
    cin, cout = lin.c, lout.c
    r_in, r_out = lin.r, lout.r
    assert w.shape == (kd, kh, kw_sz, cin, cout), (w.shape, kernel, cin, cout)

    o_min, kp, sp, (plo, phi) = _w_tap_plan(
        kw_sz, stride, dilation, lin, lout, w_in)

    idx_in = lin.index()                            # (r_in, cin)
    pad_lo_w, _ = same_pad(w_in, kw_sz, stride, dilation)
    sel = np.zeros((kw_sz, kp, r_in * cin, r_out, cin), np.float32)
    for kw in range(kw_sz):
        for do in range(r_out):
            u = stride * do + dilation * kw - pad_lo_w - o_min * r_in
            kwp, di = u // r_in, u % r_in
            for ci in range(cin):
                sel[kw, kwp, idx_in[di, ci], do, ci] = 1.0

    selj = jnp.asarray(sel, w.dtype)
    wp = jnp.einsum("wkpoc,dhwce->dhkpoe", selj, w)  # (kd,kh,KP,rCin,r_out,Cout)
    wp = wp.reshape(kd, kh, kp, r_in * cin, r_out * cout)
    return wp, o_min, kp, sp, (plo, phi)


def packed_conv(xp: Array, w: Array, lin: PackedLayout, lout: PackedLayout,
                *, w_in: int, kernel: Tuple[int, int, int] = (3, 3, 3),
                stride: int = 1, dilation: int = 1,
                precision=None, decompose_d: bool = True,
                conv_mode: str | None = None) -> Array:
    """Packed 3D conv, exact vs lax SAME conv on the unpacked tensors.

    `w`: logical kernel (kd, kh, kw, Cin, Cout).  `w_in`: the ORIGINAL
    (unpacked) W size of xp.  Output is in the standard layout of lout
    (caller constructs lout = standard_layout(r_out, Cout)).
    D/H use ordinary lax SAME padding with the given stride/dilation.

    `decompose_d` (default): run the kd depth taps as 2D convs over the
    (B·D, H, Wp) plane batch with shifted-plane accumulation instead of one
    3D conv — measured 2.6× faster forward and 4.8× faster fwd+bwd on v5e
    (XLA's TPU 2D conv kernels and especially their gradients are far better
    tuned than the 3D path; exp_conv_alt, round 2).  Exact: same taps, same
    fp32 accumulation per output, only the kd-sum order changes.
    """
    kd, kh, kw_sz = kernel
    # Build the packed kernel as ONE dense einsum against a tiny trace-time
    # one-hot constant — NOT a scatter.  (Round-2 profile: .at[].set with
    # explicit index arrays lowered to scatter HLO + s32 index constants
    # whose host→device copies and materialization fusions were ~70% of the
    # packed step's device time; the convs themselves were ~3%.)
    # sel[kw, kwp, p, δo, ci] = 1 iff packed input position p holds logical
    # channel ci at W-slot δi, and that slot at packed-kernel position kwp
    # feeds output slot δo through logical W-tap kw:
    #   kwp·r_in + δi == stride·δo + dilation·kw − pad_lo − o_min·r_in
    wp, o_min, kp, sp, (plo, phi) = packed_kernel_weights(
        w, lin, lout, w_in=w_in, kernel=kernel, stride=stride,
        dilation=dilation)

    d_in, h_in = xp.shape[1], xp.shape[2]
    pad_d = same_pad(d_in, kd, stride, dilation)
    pad_h = same_pad(h_in, kh, stride, dilation)

    if (kd == 1 and kh == 1 and kp == 1 and sp == 1 and stride == 1
            and (plo, phi) == (0, 0)):
        # pure channel mix (1³ conv, same packing): lower as dot_general.
        # XLA's conv-grad path left ~4× on the table for these — the dW of a
        # dot is a plain (rCin × rCout) matmul contraction over voxels,
        # full MXU tiles (round-3 profile: [1,1,1,384,X] dW fusions at
        # 1.5 ms vs a 0.35 ms roofline).  fp32 accumulation matches the
        # conv path's internal accumulation for bf16 inputs.
        w2 = wp.reshape(wp.shape[3], wp.shape[4])
        y = jax.lax.dot_general(xp, w2, (((4,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision)
        return y.astype(xp.dtype)

    mode = conv_mode if conv_mode is not None else _CONV_MODE
    if mode == "auto":
        mode = "d2" if decompose_d else "3d"
    if mode == "pg":
        from .pallas.pgemm import pgemm_viable

        interp = _os.environ.get("NAS3D_PG_INTERPRET", "0") == "1"
        on_tpu = jax.default_backend() not in ("cpu",)
        if ((on_tpu or interp)
                and pgemm_viable(stride=stride, sp=sp, r_in=lin.r,
                                 r_out=lout.r, kd=kd, kh=kh, kp=kp,
                                 o_min=o_min, wp_n=xp.shape[3],
                                 dtype=xp.dtype)
                and lin.idx == standard_layout(lin.r, lin.c).idx
                and lout.idx == standard_layout(lout.r, lout.c).idx):
            return _pg_fn(lin, lout, w_in, kernel, dilation,
                          interp and not on_tpu)(xp, w)
        mode = "d2"   # fallback: stride-2 / degenerate-r / non-std layouts
    if mode == "wcat":
        return _conv_wcat(xp, wp, kd=kd, kh=kh, kp=kp, stride=stride,
                          dilation=dilation, sp=sp, pad_d=pad_d, pad_h=pad_h,
                          pad_w=(plo, phi), precision=precision)
    if mode == "d2c" and kd > 1 and stride == 1:
        return _conv_d_combined(xp, wp, kd=kd, dilation=dilation, sp=sp,
                                pad_d=pad_d, pad_h=pad_h, pad_w=(plo, phi),
                                precision=precision)
    if mode in ("d2", "d2c") and kd > 1:
        return _conv_d_decomposed(xp, wp, kd=kd, stride=stride,
                                  dilation=dilation, sp=sp,
                                  pad_d=pad_d, pad_h=pad_h, pad_w=(plo, phi),
                                  precision=precision)

    dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        xp, wp, window_strides=(stride, stride, sp),
        padding=[pad_d, pad_h, (plo, phi)],
        rhs_dilation=(dilation, dilation, 1),
        dimension_numbers=dn, precision=precision)


# Global lowering mode for packed convs (experiments flip it; the shipped
# default is whatever measured fastest end-to-end — PERF_NOTES.md):
#   "d2"   — per-kd-tap 2D convs over the (B·D) plane batch + shifted adds
#   "wcat" — fold the kp W-block taps into channels; ONE (kd, kh, 1) conv
#   "3d"   — single dense 3D conv (kd, kh, kp)
_CONV_MODE = _os.environ.get("NAS3D_CONV_MODE", "auto")


def set_conv_mode(mode: str) -> None:
    global _CONV_MODE
    assert mode in ("auto", "d2", "d2c", "wcat", "3d", "pg"), mode
    _CONV_MODE = mode


@functools.lru_cache(maxsize=None)
def _pg_fn(lin: PackedLayout, lout: PackedLayout, w_in: int,
           kernel: Tuple[int, int, int], dilation: int, interpret: bool):
    """custom-VJP shift-GEMM conv (ops/pallas/pgemm.py) for one geometry.

    fwd: the Pallas kernel.  bwd: dx reuses the SAME kernel — for a
    stride-1 symmetric-SAME conv, dx = conv(dy, flip-transposed w), whose
    packed taps have the same sparse-edge structure; dW goes through
    jax.linear_transpose of the d2 lowering, i.e. exactly the XLA conv-grad
    contraction the autodiff path uses (measured ~78% of MXU peak —
    PERF_NOTES "packed-dW question").  Exactness vs d2: same taps; the
    kernel accumulates ALL taps in one fp32 scratch (d2 rounds to bf16 per
    kd tap), so agreement is to tap-summation order."""
    from .pallas.pgemm import conv_pgemm

    kd, kh, kw_sz = kernel

    def fwd_impl(xp, w, lin_, lout_):
        wp, o_min, kp, sp, (plo, phi) = packed_kernel_weights(
            w, lin_, lout_, w_in=w_in, kernel=kernel, stride=1,
            dilation=dilation)
        pad_w_lo = same_pad(w_in, kw_sz, 1, dilation)[0]
        return conv_pgemm(xp, wp, dilation=dilation, r=lin_.r, c_in=lin_.c,
                          kernel_w=kw_sz, pad_w_lo=pad_w_lo,
                          interpret=interpret)

    @jax.custom_vjp
    def f(xp, w):
        return fwd_impl(xp, w, lin, lout)

    def f_fwd(xp, w):
        return fwd_impl(xp, w, lin, lout), (xp, w)

    def f_bwd(res, dy):
        xp, w = res
        wt = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)
        lin_t = standard_layout(lout.r, lout.c)
        lout_t = standard_layout(lin.r, lin.c)
        dx = fwd_impl(dy, wt, lin_t, lout_t).astype(xp.dtype)

        def ref(ww):
            return packed_conv(xp, ww, lin, lout, w_in=w_in, kernel=kernel,
                               stride=1, dilation=dilation, conv_mode="d2")

        (dw,) = jax.linear_transpose(ref, w)(dy)
        return dx, dw

    f.defvjp(f_fwd, f_bwd)
    return f


def conv_stats_fused_viable(lin: PackedLayout, lout: PackedLayout,
                            wp_n: int, dtype, kernel, stride: int,
                            dilation: int, h_n: int = 0,
                            w_in: int = 0) -> bool:
    """Static gate for the fused conv+GN-stats Pallas path.

    True when the shift-GEMM kernel covers the geometry (stride-1 same-r 3³
    with dilation 1/2 always yields kp=3, o_min=−1 for r ≥ 2) AND we are on
    a real TPU backend (or the interpret-mode test env).  Callers keep the
    ordinary conv + packed_group_norm path when False — zero graph change.
    Env kill-switch: NAS3D_FUSED_CONVGN=0."""
    if _os.environ.get("NAS3D_FUSED_CONVGN", "1") == "0":
        return False
    interp = _os.environ.get("NAS3D_PG_INTERPRET", "0") == "1"
    if jax.default_backend() == "cpu" and not interp:
        return False
    if (lin.idx != standard_layout(lin.r, lin.c).idx
            or lout.idx != standard_layout(lout.r, lout.c).idx):
        return False
    if tuple(kernel) == (1, 1, 1):
        # pure lane mix: a Pallas GEMM with a stats epilogue (any r)
        return stride == 1 and lin.r == lout.r
    if tuple(kernel) != (3, 3, 3) or dilation not in (1, 2):
        return False
    from .pallas.pgemm import _edge_slots, pg_vmem_feasible, pgemm_viable

    if not pgemm_viable(stride=stride, sp=1, r_in=lin.r, r_out=lout.r,
                        kd=3, kh=3, kp=3, o_min=-1, wp_n=wp_n, dtype=dtype):
        return False
    if h_n and w_in:
        # wide merged convs (rC_out = k·r·C) can exceed scoped VMEM even at
        # the minimal plane-block count — gate on the estimate
        pad_lo = same_pad(w_in, kernel[2], 1, dilation)[0]
        n_next, n_prev = _edge_slots(kernel[2], dilation, lin.r, pad_lo)
        return pg_vmem_feasible(
            dil=dilation, hp=h_n + 2 * dilation, wp_n=wp_n,
            rc=lin.r * lin.c, ke2=(n_next + n_prev) * lin.c, h_n=h_n,
            itemsize=jnp.dtype(dtype).itemsize, rc_out=lout.r * lout.c)
    return True


def packed_conv_stats(xp: Array, w: Array, lin: PackedLayout,
                      lout: PackedLayout, *, w_in: int,
                      kernel: Tuple[int, int, int] = (3, 3, 3),
                      stride: int = 1, dilation: int = 1):
    """Packed conv that ALSO returns the GroupNorm raw moments of its
    output: (y, Σy, Σy²) with the sums (B, rC) fp32 over (D, H, Wp).

    On the fused path (conv_stats_fused_viable) the moments come out of the
    SAME Pallas op as y — removing one full-volume dependent op (the stats
    reduce) per ConvNormAct, which on this rig costs ~0.5 ms regardless of
    size (PERF_NOTES "dependent-op latency floor").  The moments sum the
    ROUNDED y exactly like the XLA converting-reduce they replace.

    Gradient contract: stats cotangents are IGNORED — the intended consumer
    is packed_group_norm_from_stats, whose custom VJP returns the complete
    analytic GN gradient through dy (stats paths folded in); wrap the stats
    in stop_gradient if routing them anywhere else."""
    assert conv_stats_fused_viable(lin, lout, xp.shape[3], xp.dtype, kernel,
                                   stride, dilation)
    interp = (_os.environ.get("NAS3D_PG_INTERPRET", "0") == "1"
              and jax.default_backend() == "cpu")
    if tuple(kernel) == (1, 1, 1):
        return _gemm_stats_fn(lin, lout, w_in, interp)(xp, w)
    return _pg_stats_fn(lin, lout, w_in, tuple(kernel), dilation,
                        interp)(xp, w)


@functools.lru_cache(maxsize=None)
def _gemm_stats_fn(lin: PackedLayout, lout: PackedLayout, w_in: int,
                   interpret: bool):
    """custom-VJP fused 1³-conv+stats: one Pallas GEMM emits y and its GN
    raw moments.  bwd: dx/dW are plain MXU matmul contractions (exactly the
    dot_general-lowering gradients packed_conv's 1³ path produces)."""
    from .pallas.pgemm import gemm_stats

    def w2_of(w):
        wp, _o, _kp, _sp, _pads = packed_kernel_weights(
            w, lin, lout, w_in=w_in, kernel=(1, 1, 1), stride=1, dilation=1)
        return wp.reshape(wp.shape[3], wp.shape[4])

    @jax.custom_vjp
    def f(xp, w):
        b = xp.shape[0]
        x3 = xp.reshape(b, -1, xp.shape[-1])
        y, s1, s2 = gemm_stats(x3, w2_of(w).astype(xp.dtype),
                               interpret=interpret)
        return y.reshape(xp.shape[:-1] + (s1.shape[-1],)), s1, s2

    def f_fwd(xp, w):
        return f(xp, w), (xp, w)

    def f_bwd(res, cts):
        dy, _ds1, _ds2 = cts   # stats cotangents dropped by contract
        xp, w = res

        def ref(xx, ww):
            w2 = w2_of(ww).astype(xp.dtype)
            return jax.lax.dot_general(
                xx, w2, (((4,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(xp.dtype)

        _, vjp = jax.vjp(ref, xp, w)
        return vjp(dy)

    f.defvjp(f_fwd, f_bwd)
    return f


@functools.lru_cache(maxsize=None)
def _pg_stats_fn(lin: PackedLayout, lout: PackedLayout, w_in: int,
                 kernel: Tuple[int, int, int], dilation: int,
                 interpret: bool):
    """custom-VJP fused conv+stats (see packed_conv_stats; bwd == _pg_fn's,
    stats cotangents dropped by contract)."""
    from .pallas.pgemm import conv_pgemm

    kd, kh, kw_sz = kernel

    def fwd_impl(xp, w, lin_, lout_, with_stats):
        wp, o_min, kp, sp, (plo, phi) = packed_kernel_weights(
            w, lin_, lout_, w_in=w_in, kernel=kernel, stride=1,
            dilation=dilation)
        pad_w_lo = same_pad(w_in, kw_sz, 1, dilation)[0]
        return conv_pgemm(xp, wp, dilation=dilation, r=lin_.r, c_in=lin_.c,
                          kernel_w=kw_sz, pad_w_lo=pad_w_lo,
                          with_stats=with_stats, interpret=interpret)

    @jax.custom_vjp
    def f(xp, w):
        return fwd_impl(xp, w, lin, lout, True)

    def f_fwd(xp, w):
        return fwd_impl(xp, w, lin, lout, True), (xp, w)

    def f_bwd(res, cts):
        dy, _ds1, _ds2 = cts   # stats cotangents dropped by contract
        xp, w = res
        wt = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)
        lin_t = standard_layout(lout.r, lout.c)
        lout_t = standard_layout(lin.r, lin.c)
        dx = fwd_impl(dy, wt, lin_t, lout_t, False).astype(xp.dtype)

        def ref(ww):
            return packed_conv(xp, ww, lin, lout, w_in=w_in, kernel=kernel,
                               stride=1, dilation=dilation, conv_mode="d2")

        (dw,) = jax.linear_transpose(ref, w)(dy)
        return dx, dw

    f.defvjp(f_fwd, f_bwd)
    return f


def _conv_d_combined(xp: Array, wp: Array, *, kd: int, dilation: int,
                     sp: int, pad_d, pad_h, pad_w, precision) -> Array:
    """All kd depth taps in ONE 2D conv (stride-1 depth only).

    _conv_d_decomposed reads the full input once PER TAP (kd×); here the
    taps are folded into output channels — conv2d over the (B·D) plane
    batch with Cout' = kd·rc_out, input read once — then one fused
    shifted-add combines the channel blocks (output-channel slices are
    128-lane aligned: rc_out is a multiple of 128 on every packed level).
    Exact: same taps, same per-output fp32 conv accumulation; only the
    kd-sum order changes (as with d2)."""
    b, d_in, h_in, wp_n, rc_in = xp.shape
    rc_out = wp.shape[-1]
    x2 = xp.reshape(b * d_in, h_in, wp_n, rc_in)
    # (kd, kh, kp, rc_in, rc_out) -> (kh, kp, rc_in, kd·rc_out)
    wk = jnp.moveaxis(wp, 0, 3).reshape(wp.shape[1], wp.shape[2],
                                        rc_in, kd * rc_out)
    dn2 = jax.lax.conv_dimension_numbers(
        x2.shape, wk.shape, ("NHWC", "HWIO", "NHWC"))
    z = jax.lax.conv_general_dilated(
        x2, wk, window_strides=(1, sp), padding=[pad_h, pad_w],
        rhs_dilation=(dilation, 1), dimension_numbers=dn2,
        precision=precision)
    z = z.reshape(b, d_in, z.shape[1], z.shape[2], kd, rc_out)
    acc = None
    for k in range(kd):
        shift = dilation * k - pad_d[0]             # input plane of output 0
        t = z[:, :, :, :, k]
        if shift > 0:
            t = jnp.pad(t[:, shift:], ((0, 0), (0, shift), (0, 0), (0, 0),
                                       (0, 0)))
        elif shift < 0:
            t = jnp.pad(t[:, :shift], ((0, 0), (-shift, 0), (0, 0), (0, 0),
                                       (0, 0)))
        acc = t if acc is None else acc + t
    return acc


def _conv_wcat(xp: Array, wp: Array, *, kd: int, kh: int, kp: int,
               stride: int, dilation: int, sp: int, pad_d, pad_h, pad_w,
               precision) -> Array:
    """Fold the kp packed-W taps into channels: one (kd, kh, 1) conv.

    xcat[..., wp, o·rc+p] = xpad[..., wp·sp + o, p]; the conv then treats
    Wp as a batch-like spatial dim (kernel 1), with D/H taps native.  The
    kernel reshape (kd, kh, kp, rc_in, rc_out) → (kd, kh, 1, kp·rc_in,
    rc_out) matches the o-major concat order.  Exact: same taps, same
    per-output fp32 accumulation; only the tap-summation order changes."""
    b, d, h, wpn, rc = xp.shape
    plo, phi = pad_w
    xpad = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (plo, phi), (0, 0)))
    wp_out = (wpn + plo + phi - kp) // sp + 1
    parts = [xpad[:, :, :, o:o + sp * (wp_out - 1) + 1:sp] for o in range(kp)]
    xcat = parts[0] if kp == 1 else jnp.concatenate(parts, axis=-1)
    wk = wp.reshape(kd, kh, 1, kp * wp.shape[3], wp.shape[4])
    dn = jax.lax.conv_dimension_numbers(xcat.shape, wk.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        xcat, wk, window_strides=(stride, stride, 1),
        padding=[pad_d, pad_h, (0, 0)],
        rhs_dilation=(dilation, dilation, 1),
        dimension_numbers=dn, precision=precision)


def _conv_d_decomposed(xp: Array, wp: Array, *, kd: int, stride: int,
                       dilation: int, sp: int, pad_d, pad_h, pad_w,
                       precision) -> Array:
    """kd depth taps as 2D convs over the (B·D) plane batch.

    Output plane d needs input plane stride·d + dilation·kd − pad_d_lo per
    tap.  Each tap runs ONE 2D conv over the planes of the right parity
    (stride 2 halves the conv work per tap), then a static shift (pad +
    slice along D) aligns planes before summation.
    """
    b, d_in, h_in, wp_n, rc_in = xp.shape
    d_out = -(-d_in // stride)
    rc_out = wp.shape[-1]
    acc = None
    for k in range(kd):
        base = dilation * k - pad_d[0]              # input plane of output 0
        if stride == 1:
            planes = xp
            shift = base
        else:                                       # stride 2: parity planes
            start = base % 2
            planes = xp[:, start::2]
            shift = (base - start) // 2
        nb = planes.shape[1]
        x2 = planes.reshape(b * nb, h_in, wp_n, rc_in)
        dn2 = jax.lax.conv_dimension_numbers(
            x2.shape, wp.shape[1:], ("NHWC", "HWIO", "NHWC"))
        z = jax.lax.conv_general_dilated(
            x2, wp[k], window_strides=(stride, sp),
            padding=[pad_h, pad_w], rhs_dilation=(dilation, 1),
            dimension_numbers=dn2, precision=precision)
        z = z.reshape(b, nb, z.shape[1], z.shape[2], rc_out)
        # align: output plane d reads z[d + shift]; shift is static
        if shift > 0:
            z = z[:, shift:]
        elif shift < 0:
            z = jnp.pad(z, ((0, 0), (-shift, 0), (0, 0), (0, 0), (0, 0)))
        if z.shape[1] < d_out:
            z = jnp.pad(z, ((0, 0), (0, d_out - z.shape[1]),
                            (0, 0), (0, 0), (0, 0)))
        elif z.shape[1] > d_out:
            z = z[:, :d_out]
        acc = z if acc is None else acc + z
    return acc


# ---------------------------------------------------------------------------
# Packed k2s2 transpose conv (exact vs flax nn.ConvTranspose VALID k2s2)
# ---------------------------------------------------------------------------


def packed_transpose2x(xp: Array, w: Array, lin: PackedLayout,
                       lout: PackedLayout, precision=None) -> Array:
    """2× upsampling transpose conv (kernel 2, stride 2, VALID).

    Logical: y[2d+kd, 2h+kh, 2w+kw, co] = Σ_ci w[kd,kh,kw,ci,co]·x[d,h,w,ci].
    Packed: D/H via lhs-dilation-free trick — every input position emits a
    (2,2) D/H block and 2 W-slots, all folded into channels:
        (B, D, H, Wp, r_in·Cin) -conv1³-> (B, D, H, Wp, 2·2·2·r_in·Cout)
    then free reshapes interleave W (channel split) while D/H interleave via
    one transpose-reshape pair (cheap: output is written once).
    """
    cin, cout = lin.c, lout.c
    r_in, r_out = lin.r, lout.r
    assert w.shape == (2, 2, 2, cin, cout), (w.shape, cin, cout)
    # input slot δi covers output slots 2δi + kw, all inside one output
    # block ⇒ the packed W upsample folds entirely into channels
    assert r_out == 2 * r_in, (r_in, r_out)

    idx_in = lin.index()
    # one 1³ conv producing channels [δd, δh, δo·cout] with δo = 2δi+δw.
    # flax ConvTranspose (lax.conv_transpose, transpose_kernel=False) gives
    # y[2i+δ] = w[1−δ]·x[i] per axis, so output offset δ reads kernel 1−δ.
    # Built as a dense einsum against a tiny one-hot constant (scatter HLO
    # is pathologically slow on TPU — see packed_conv).
    # sel[δw, p, δo, ci] = 1 iff packed position p holds (δi, ci) and
    # δo == 2δi + δw.
    sel = np.zeros((2, r_in * cin, r_out, cin), np.float32)
    for di in range(r_in):
        for dw in range(2):
            for ci in range(cin):
                sel[dw, idx_in[di, ci], 2 * di + dw, ci] = 1.0
    wf = w[::-1, ::-1, ::-1]                        # kernel index 1−δ per axis
    wp = jnp.einsum("wpoc,dhwce->pdhoe", jnp.asarray(sel, w.dtype), wf)
    wp = wp.reshape(1, 1, 1, r_in * cin, 4 * r_out * cout)
    dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(xp, wp, (1, 1, 1),
                                     padding=[(0, 0), (0, 0), (0, 0)],
                                     dimension_numbers=dn,
                                     precision=precision)
    b, d, h, wp_n, _ = y.shape
    # channels are [kd, kh, δo·cout]: split kd/kh out and interleave
    y = y.reshape(b, d, h, wp_n, 2, 2, r_out * cout)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6)            # (B, D, kd, H, kh, Wp, r·C)
    return y.reshape(b, 2 * d, 2 * h, wp_n, r_out * cout)


# ---------------------------------------------------------------------------
# Packed GroupNorm (+ optional ReLU) — stats fold the r sub-positions
# ---------------------------------------------------------------------------


# GN stats implementation: "xla" (converting reduces) or "pallas"
# (ops/pallas/stats.py single-pass moments/weighted-sums kernels).  Flag for
# A/B measurement on the full step — micro-benches on this rig are too noisy
# to decide (PERF_NOTES round 3).  CPU always uses XLA (compiled Pallas is
# TPU-only here; interpret mode would be slower).
_GN_STATS_IMPL = _os.environ.get("NAS3D_GN_STATS", "xla")


def set_gn_stats_impl(impl: str) -> None:
    global _GN_STATS_IMPL
    assert impl in ("xla", "pallas", "dot"), impl
    _GN_STATS_IMPL = impl


def _use_pallas_stats(shape) -> bool:
    if _GN_STATS_IMPL != "pallas" or jax.default_backend() == "cpu":
        return False
    from .pallas.stats import stats_viable

    return stats_viable(shape)


def _gn_meta(layout: PackedLayout, groups: int):
    """Trace-time fold maps for GN on a packed layout."""
    r, c = layout.r, layout.c
    gsize = c // groups
    idx = layout.index()
    pos_to_c = np.empty((r * c,), dtype=np.int64)
    for d in range(r):
        for ch in range(c):
            pos_to_c[idx[d, ch]] = ch
    pos_group = pos_to_c // gsize                   # (rC,)
    fold_g = np.zeros((r * c, groups), np.float32)  # packed pos -> group
    fold_g[np.arange(r * c), pos_group] = 1.0
    fold_c = np.zeros((r * c, c), np.float32)       # packed pos -> channel
    fold_c[np.arange(r * c), pos_to_c] = 1.0
    return pos_to_c, pos_group, fold_g, fold_c


@functools.lru_cache(maxsize=None)
def _gn_core(layout: PackedLayout, groups: int, eps: float,
             relu: bool = False):
    """GroupNorm on a packed tensor with a hand-written VJP.

    Why custom: the autodiff backward of the FMA-normalize materializes
    full-volume fp32 intermediates (the upcast shared by the s1/s2 stats
    becomes a fusion OUTPUT — a 268 MB buffer per level-0 GN in the round-3
    profile) plus several extra elementwise passes.  The analytic GN
    gradient needs exactly two converting reductions over (dy, x) and one
    fused FMA pass for dx; everything else is tiny (B, rC)/(B, G) algebra.

        dx = a·dy + c2·x + c1,     a  = inv·γ (as in fwd)
        c2 = −inv²·S_tx̂/n,        c1 = −inv·S_t/n + inv²·μ·S_tx̂/n
        S_t = Σ_g γ·dy,           S_tx̂·inv⁻¹ = Σ_g γ·dy·x − μ·S_t

    dγ/dβ fold the same two reductions to logical channels.  All
    full-volume arithmetic reads/writes the input dtype; fp32 math lives
    inside the fusions (converting reduces / fused upcasts), never in HBM.
    """
    r, c = layout.r, layout.c
    gsize = c // groups
    pos_to_c, pos_group, fold_g, fold_c = _gn_meta(layout, groups)
    # NOTE: keep constants as NUMPY here — _gn_core is lru_cached, and a
    # jnp.asarray created inside one trace (e.g. under nn.remat) would leak
    # that trace's tracer into every later caller.  jnp conversion happens
    # per call; XLA dedups the constants.

    def _stats(xp):
        n = xp.shape[1] * xp.shape[2] * xp.shape[3] * r * gsize
        if _use_pallas_stats(xp.shape):
            from .pallas.stats import moments

            s1, s2 = moments(xp)                                     # one pass
        elif _GN_STATS_IMPL == "dot":
            # MXU formulation of the stats (tiny-output XLA reduces measured
            # ~6× off roofline — PERF_NOTES round 3).  bf16·bf16 products are
            # EXACT in the fp32 MXU accumulator, so the gram diagonal is the
            # precision-equivalent of a converting square-reduce.
            bsz = xp.shape[0]
            x2 = xp.reshape(bsz, -1, r * c)                          # (B,V,rC)
            ones = jnp.ones(x2.shape[:2], xp.dtype)                  # (B, V)
            s1 = jax.lax.dot_general(
                ones, x2, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)                  # (B, rC)
            gram = jax.lax.dot_general(
                x2, x2, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)                  # (B,rC,rC)
            s2 = jnp.diagonal(gram, axis1=1, axis2=2)                # (B, rC)
        else:
            # converting reduces: the fp32 upcast fuses INTO each reduction
            # — no fp32 volume is materialized (the old shared-xf form did)
            s1 = jnp.sum(xp, axis=(1, 2, 3), dtype=jnp.float32)      # (B, rC)
            s2 = jnp.sum(jnp.square(xp.astype(jnp.float32)), axis=(1, 2, 3))
        return _fold_stats(s1, s2, n) + (n,)

    def _fold_stats(s1, s2, n):
        g1 = s1 @ jnp.asarray(fold_g)                                # (B, G)
        g2 = s2 @ jnp.asarray(fold_g)
        mean = g1 / n
        var = g2 / n - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        return mean, inv

    def _affine(mean, inv, scale, bias, bshape):
        mean_p = mean[:, pos_group]                 # (B, rC)
        inv_p = inv[:, pos_group]
        scale_p = scale[pos_to_c]
        bias_p = bias[pos_to_c]
        a = (inv_p * scale_p).reshape(bshape)       # f32
        b = (bias_p - mean_p * inv_p * scale_p).reshape(bshape)
        return a, b

    @jax.custom_vjp
    def gn(xp, scale, bias):
        mean, inv, _ = _stats(xp)
        shp = (xp.shape[0], 1, 1, 1, r * c)
        a, b = _affine(mean, inv, scale, bias, shp)
        y = xp * a.astype(xp.dtype) + b.astype(xp.dtype)
        return jax.nn.relu(y) if relu else y

    def gn_fwd(xp, scale, bias):
        mean, inv, _ = _stats(xp)
        shp = (xp.shape[0], 1, 1, 1, r * c)
        a, b = _affine(mean, inv, scale, bias, shp)
        y = xp * a.astype(xp.dtype) + b.astype(xp.dtype)
        if relu:
            y = jax.nn.relu(y)
        return y, (xp, scale, bias, mean, inv)

    def gn_bwd(res, dy):
        xp, scale, bias, mean, inv = res
        if relu:
            # mask dy where the pre-activation was ≤ 0; the affine is
            # RECOMPUTED (tiny vectors broadcast) so it fuses into every
            # consumer instead of keeping y alive or spending a mask pass
            shp0 = (xp.shape[0], 1, 1, 1, r * c)
            a0, b0 = _affine(mean, inv, scale, bias, shp0)
            pre = xp * a0.astype(xp.dtype) + b0.astype(xp.dtype)
            dy = jnp.where(pre > 0, dy, jnp.zeros((), dy.dtype))
        bsz = xp.shape[0]
        n = xp.shape[1] * xp.shape[2] * xp.shape[3] * r * gsize
        if _use_pallas_stats(xp.shape):
            from .pallas.stats import weighted_sums

            r1, r2 = weighted_sums(dy, xp)                           # one pass
        elif _GN_STATS_IMPL == "dot":
            # MXU formulation: Σdy as a ones-dot, Σdy·x as the cross-gram
            # diagonal — exact fp32 accumulation of bf16 products
            dy2 = dy.reshape(bsz, -1, r * c)
            x2 = xp.reshape(bsz, -1, r * c)
            ones = jnp.ones(dy2.shape[:2], dy.dtype)
            r1 = jax.lax.dot_general(
                ones, dy2, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)                  # (B, rC)
            cross = jax.lax.dot_general(
                dy2, x2, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)                  # (B,rC,rC)
            r2 = jnp.diagonal(cross, axis1=1, axis2=2)               # (B, rC)
        else:
            # two converting reductions over (dy, x) — one fused pass
            r1 = jnp.sum(dy, axis=(1, 2, 3), dtype=jnp.float32)      # (B, rC)
            r2 = jnp.sum(dy.astype(jnp.float32) * xp.astype(jnp.float32),
                         axis=(1, 2, 3))                             # (B, rC)
        scale_p = scale[pos_to_c][None]             # (1, rC)
        t1 = (scale_p * r1) @ jnp.asarray(fold_g)   # (B, G)  Σ γ·dy
        t2 = (scale_p * r2) @ jnp.asarray(fold_g)   # (B, G)  Σ γ·dy·x
        s_t = t1
        s_tx = inv * (t2 - mean * t1)               # Σ t·x̂
        a_g = inv                                   # per-group inv
        c2_g = -(a_g * a_g) * s_tx / n
        c1_g = -a_g * s_t / n - c2_g * mean
        shp = (bsz, 1, 1, 1, r * c)
        a_p = (inv[:, pos_group] * scale_p).reshape(shp)
        c1_p = c1_g[:, pos_group].reshape(shp)
        c2_p = c2_g[:, pos_group].reshape(shp)
        # single fused FMA pass; fp32 math inside the fusion, bf16 in HBM
        dx = (dy.astype(jnp.float32) * a_p + xp.astype(jnp.float32) * c2_p
              + c1_p).astype(xp.dtype)
        # parameter grads from the same reductions (fp32, summed over batch)
        dgamma = jnp.sum((inv[:, pos_group] * (r2 - mean[:, pos_group] * r1))
                         @ jnp.asarray(fold_c), axis=0)   # (C,)
        dbeta = jnp.sum(r1 @ jnp.asarray(fold_c), axis=0)
        return dx, dgamma, dbeta

    gn.defvjp(gn_fwd, gn_bwd)

    # ---- external-stats flavor (fused conv+stats producer) ----
    # Same math, but the raw moments come in precomputed (from the Pallas
    # conv's fused accumulator).  The VJP returns the COMPLETE analytic GN
    # gradient through dxp (gn_bwd already folds the stats' dependence on x
    # into c1/c2), so the stats cotangents are exact zeros.

    @jax.custom_vjp
    def gn_s(xp, scale, bias, s1, s2):
        n = xp.shape[1] * xp.shape[2] * xp.shape[3] * r * gsize
        mean, inv = _fold_stats(s1, s2, n)
        shp = (xp.shape[0], 1, 1, 1, r * c)
        a, b = _affine(mean, inv, scale, bias, shp)
        y = xp * a.astype(xp.dtype) + b.astype(xp.dtype)
        return jax.nn.relu(y) if relu else y

    def gn_s_fwd(xp, scale, bias, s1, s2):
        n = xp.shape[1] * xp.shape[2] * xp.shape[3] * r * gsize
        mean, inv = _fold_stats(s1, s2, n)
        shp = (xp.shape[0], 1, 1, 1, r * c)
        a, b = _affine(mean, inv, scale, bias, shp)
        y = xp * a.astype(xp.dtype) + b.astype(xp.dtype)
        if relu:
            y = jax.nn.relu(y)
        return y, (xp, scale, bias, mean, inv, s1, s2)

    def gn_s_bwd(res, dy):
        xp, scale, bias, mean, inv, s1, s2 = res
        dx, dgamma, dbeta = gn_bwd((xp, scale, bias, mean, inv), dy)
        return dx, dgamma, dbeta, jnp.zeros_like(s1), jnp.zeros_like(s2)

    gn_s.defvjp(gn_s_fwd, gn_s_bwd)
    gn.from_stats = gn_s
    return gn


def packed_group_norm_from_stats(xp: Array, scale: Array, bias: Array,
                                 s1: Array, s2: Array, groups: int,
                                 layout: PackedLayout, eps: float = 1e-6,
                                 relu: bool = False) -> Array:
    """GroupNorm(+ReLU) on a packed tensor with precomputed raw moments
    (s1 = Σxp, s2 = Σxp² over (D, H, Wp), (B, rC) fp32 — the exact sums
    packed_conv_stats emits).  Identical math to packed_group_norm; the
    full-volume stats reduce op disappears from the graph."""
    assert layout.c % groups == 0
    return _gn_core(layout, groups, float(eps),
                    bool(relu)).from_stats(xp, scale, bias, s1, s2)


def packed_group_norm(xp: Array, scale: Array, bias: Array, groups: int,
                      layout: PackedLayout, eps: float = 1e-6,
                      relu: bool = False) -> Array:
    """GroupNorm (optionally fused with ReLU) over logical channels of a
    packed tensor (per-sample stats over D, H, W and the channels of each
    group), matching nn.GroupNorm (+ jax.nn.relu).

    Stats: converting-reduce to (B, r·C), folded to per-group scalars with
    the layout's index map; normalization is a single elementwise pass with
    packed-gathered scale/bias; the backward is analytic (_gn_core) — two
    reductions + one FMA pass, with the ReLU mask recomputed from the
    affine (no saved activation, no separate mask pass).  The volume is
    never reshaped."""
    assert layout.c % groups == 0
    return _gn_core(layout, groups, float(eps), bool(relu))(xp, scale, bias)


# ---------------------------------------------------------------------------
# Packed pooling (3³ windows; stride 1 or 2), exact vs nn.avg_pool/max_pool
# ---------------------------------------------------------------------------


def _w_shift_matrices(layout: PackedLayout, shifts: Sequence[int]) -> dict:
    """For each shift s, a pair of (rC × rC) 0/1 matrices (cur, prev/next)
    implementing a W shift by s voxels in packed space:
        y[..., p_out] = Σ cur[p_in, p_out]·x[..., wp, p_in]
                      + Σ oth[p_in, p_out]·x[..., wp±1, p_in]
    Used for pooling; shifts ∈ {-1, 0, 1} (3-window)."""
    r, c = layout.r, layout.c
    idx = layout.index()
    out = {}
    for s in shifts:
        cur = np.zeros((r * c, r * c), np.float32)
        oth = np.zeros((r * c, r * c), np.float32)
        for do in range(r):
            di = do + s
            for ch in range(c):
                if 0 <= di < r:
                    cur[idx[di, ch], idx[do, ch]] = 1.0
                elif di < 0:
                    oth[idx[di + r, ch], idx[do, ch]] = 1.0   # previous block
                else:
                    oth[idx[di - r, ch], idx[do, ch]] = 1.0   # next block
        out[s] = (cur, oth)
    return out


def _w_neighbor(xp: Array, direction: int) -> Array:
    """Packed tensor shifted one BLOCK along Wp (zero boundary)."""
    zeros = jnp.zeros_like(xp[:, :, :, :1])
    if direction < 0:     # previous block at each position
        return jnp.concatenate([zeros, xp[:, :, :, :-1]], axis=3)
    return jnp.concatenate([xp[:, :, :, 1:], zeros], axis=3)


def _pool_w_shifted(xp: Array, layout: PackedLayout, combine) -> Array:
    """3-window along W via in-lane shifts: combine(x[w-1], x[w], x[w+1]).
    Boundary positions contribute `None` (caller handles via counts/identity
    of the combine)."""
    mats = _w_shift_matrices(layout, (-1, 0, 1))
    prev_b = _w_neighbor(xp, -1)
    next_b = _w_neighbor(xp, +1)
    dt = xp.dtype
    parts = []
    for s in (-1, 0, 1):
        cur, oth = mats[s]
        curj = jnp.asarray(cur, dt)
        othj = jnp.asarray(oth, dt)
        term = xp @ curj
        nb = prev_b if s < 0 else next_b
        term = term + nb @ othj
        parts.append(term)
    return combine(parts)


def _axis_max3(x: Array, axis: int, stride: int) -> Array:
    """Max over 3-wide SAME windows along one axis via pad(−inf) + three
    strided slices + elementwise maximum.  Values are exactly
    reduce_window-max's; the point is the GRADIENT: XLA lowers
    reduce_window-max's VJP to SelectAndScatter, which the GSPMD partitioner
    silently mis-partitions on a spatially sharded window axis (measured
    round 4: max|dgrad| 6.4e-3 on a forward that matches to 4e-6, CPU mesh).
    Slice/pad transposes + jnp.maximum's balanced-tie VJP partition
    correctly, and the tie behaviour (split, not first-wins) is the same on
    every backend and sharding."""
    n = x.shape[axis]
    lo, hi = same_pad(n, 3, stride, 1)
    out = -(-n // stride)
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (lo, hi)
    xpad = jnp.pad(x, pad_cfg, constant_values=-jnp.inf)
    parts = [jax.lax.slice_in_dim(xpad, o, o + stride * (out - 1) + 1,
                                  stride=stride, axis=axis) for o in range(3)]
    return jnp.maximum(jnp.maximum(parts[0], parts[1]), parts[2])


def max_pool3_shifted(x: Array, stride: int = 1) -> Array:
    """3³ max pool (SAME) on (B, D, H, W, C), separable per-axis maxima.
    The GSPMD-safe replacement for nn.max_pool — see _axis_max3.

    The whole pool is rematerialized in the backward (jax.checkpoint):
    the maximum-chain VJP otherwise stores every padded slice and partial
    maximum as residuals — ~4 extra full-size buffers per stride-1 pool,
    enough to OOM the 128³ remat-off supernet search on a 16 GB chip
    (measured round 4).  Recomputing the slice maxima costs three
    elementwise passes in the backward, invisible next to the convs, and
    restores reduce_window's input+output-only footprint."""
    def pool(x):
        for axis in (1, 2, 3):
            x = _axis_max3(x, axis, stride)
        return x
    return jax.checkpoint(pool)(x)


def packed_avg_pool3(xp: Array, layout: PackedLayout, *, w_in: int,
                     stride: int = 1) -> Array:
    """3³ avg pool, SAME, count_include_pad=False, on a packed tensor.

    D/H via lax.reduce_window on the packed tensor (those axes are
    untouched by packing); W via in-lane shift matmuls.  The divisor plane
    (window sizes under SAME without pad counting) is a trace-time constant
    computed per axis and combined by outer product — exact."""
    # sum over W window first (keeps dtype; shifts are 0/1 matmuls)
    def comb(parts):
        return parts[0] + parts[1] + parts[2]

    xf = xp.astype(jnp.float32)
    ws = _pool_w_shifted(xf, layout, comb)
    # sum over D/H windows
    pd = same_pad(ws.shape[1], 3, stride, 1)
    ph = same_pad(ws.shape[2], 3, stride, 1)
    summed = jax.lax.reduce_window(
        ws, 0.0, jax.lax.add, (1, 3, 3, 1, 1), (1, stride, stride, 1, 1),
        [(0, 0), pd, ph, (0, 0), (0, 0)])
    # W stride-2: window o covers [2o − pad_lo, 2o − pad_lo + 2], i.e. the
    # centered stride-1 sum at position 2o + 1 − pad_lo.  Even W → pad_lo 0
    # → odd positions; odd W (reachable when r degenerates to 1) → pad_lo 1
    # → even positions.
    if stride == 2:
        pw_lo, _ = same_pad(w_in, 3, 2, 1)
        summed = _w_downsample2(summed, layout, offset=1 - pw_lo)

    # divisor: outer product of per-axis true-window counts
    def axis_counts(n, stride):
        lo, _ = same_pad(n, 3, stride, 1)
        outn = -(-n // stride)
        cnt = []
        for o in range(outn):
            start = o * stride - lo
            cnt.append(sum(1 for k in range(3) if 0 <= start + k < n))
        return np.asarray(cnt, np.float32)

    d_in, h_in = xp.shape[1], xp.shape[2]
    cd = axis_counts(d_in, stride)
    chh = axis_counts(h_in, stride)
    cw = axis_counts(w_in, stride)
    out_w = cw.shape[0]
    # r == 1 stride 2 degenerates to keeping every other BLOCK
    # (_w_downsample2), so the output packing factor stays 1.
    r_out = layout.r if stride == 1 else max(1, layout.r // 2)
    # packed W counts: (Wp_out, r_out·c) gathered from per-voxel counts
    idx_out = (standard_layout(r_out, layout.c).index()
               if stride == 2 else layout.index())
    cw_packed = np.empty((out_w // r_out, r_out * layout.c), np.float32)
    for wp in range(out_w // r_out):
        for do in range(r_out):
            cw_packed[wp, idx_out[do]] = cw[wp * r_out + do]
    div = (cd[None, :, None, None, None] * chh[None, None, :, None, None]
           * cw_packed[None, None, None, :, :])
    return (summed / jnp.asarray(div)).astype(xp.dtype)


def _w_downsample2(xp: Array, lin: PackedLayout, offset: int = 0) -> Array:
    """Stride-2 W subsample of a packed tensor: keep slots 2k+offset.
    Output W = W/2 with r_out = r/2 over the SAME block count, so the
    subsample stays in-block — a pure channel gather, no reshape.
    Degenerate r == 1: keep every other BLOCK instead."""
    r = lin.r
    if r == 1:
        return xp[:, :, :, offset::2]
    assert r % 2 == 0
    idx = lin.index()
    gather = np.concatenate([idx[2 * k + offset] for k in range(r // 2)])
    return xp[..., gather]


def packed_max_pool3(xp: Array, layout: PackedLayout, *, stride: int = 1) -> Array:
    """3³ max pool, SAME, on a packed tensor.  W window via in-lane shift
    matmuls with −inf boundary (matmul with 0/1 matrix then where-mask).

    Runs in the INPUT dtype: the 0/1 shift matmuls copy single values (one
    nonzero per output lane — the MXU's f32 accumulation of one product is
    the exact bf16 value back), and max never rounds, so bf16-in/bf16-out
    is bit-identical to an f32 round-trip at half the buffer traffic.
    Backward rematerializes the whole pool (jax.checkpoint) — see
    max_pool3_shifted for the measured OOM this prevents."""
    def pool(xp):
        dt = xp.dtype
        neg = jnp.asarray(-jnp.inf, dt)
        mats = _w_shift_matrices(layout, (-1, 0, 1))
        prev_b = _w_neighbor(xp, -1)
        next_b = _w_neighbor(xp, +1)
        # boundary masks: positions whose shifted source falls outside [0, W)
        wpn = xp.shape[3]
        acc = None
        for s in (-1, 0, 1):
            cur, oth = mats[s]
            shifted = xp @ jnp.asarray(cur, dt)
            nb = prev_b if s < 0 else next_b
            shifted = shifted + nb @ jnp.asarray(oth, dt)
            # sources outside the volume: only the FIRST block's lowest slot
            # (s=-1) / LAST block's highest slot (s=+1) read a zero neighbor —
            # mask those to -inf so max ignores them
            if s != 0:
                mask = np.zeros((wpn, layout.r * layout.c), bool)
                idx = layout.index()
                if s < 0:
                    mask[0, idx[0]] = True               # w-1 < 0
                else:
                    mask[-1, idx[layout.r - 1]] = True   # w+1 >= W
                shifted = jnp.where(jnp.asarray(mask)[None, None, None], neg, shifted)
            acc = shifted if acc is None else jnp.maximum(acc, shifted)
        # D/H max windows — shifted maxima, not reduce_window: the
        # SelectAndScatter backward is wrong under spatial (D) sharding
        # (_axis_max3 docstring)
        y = _axis_max3(_axis_max3(acc, 1, stride), 2, stride)
        if stride == 2:
            # anchor parity follows SAME pad_lo — see packed_avg_pool3
            w_in = xp.shape[3] * layout.r
            pw_lo, _ = same_pad(w_in, 3, 2, 1)
            y = _w_downsample2(y, layout, offset=1 - pw_lo)
        return y
    return jax.checkpoint(pool)(xp)


# ---------------------------------------------------------------------------
# Packed depthwise 3³ conv (for separable convs)
# ---------------------------------------------------------------------------


def packed_depthwise3(xp: Array, w: Array, layout: PackedLayout, *,
                      w_in: int, stride: int = 1, precision=None) -> Array:
    """Depthwise 3³ conv (SAME) on a packed tensor.

    D/H taps: grouped conv with feature_group_count = r·C (exact, cheap).
    Combined with the W taps by scattering the depthwise kernel into a
    BLOCK-SPARSE dense packed kernel — mathematically the same trick as
    packed_conv with Cin==Cout and a diagonal channel kernel."""
    c = layout.c
    assert w.shape == (3, 3, 3, 1, c) or w.shape == (3, 3, 3, c, 1) or w.shape == (3, 3, 3, c), w.shape
    wd = w.reshape(3, 3, 3, -1)[..., :c] if w.shape[-1] != c else w.reshape(3, 3, 3, c)
    # express as dense (diagonal) logical kernel and reuse packed_conv
    eye = np.eye(c, dtype=np.float32)
    wdense = jnp.einsum("dhwc,ce->dhwce", wd, jnp.asarray(eye, wd.dtype))
    r_out = layout.r if stride == 1 else max(1, layout.r // 2)
    lout = standard_layout(r_out, c)
    return packed_conv(xp, wdense, layout, lout, w_in=w_in, kernel=(3, 3, 3),
                       stride=stride, dilation=1, precision=precision)


# ---------------------------------------------------------------------------
# Packed trilinear 2x upsample (exact vs jax.image.resize "trilinear")
# ---------------------------------------------------------------------------


def packed_resize2x(xp: Array, layout: PackedLayout) -> Array:
    """Trilinear 2x upsample of a packed tensor (jax.image.resize
    half-pixel semantics, edges clamped).

    D/H: jax.image.resize on the packed tensor touches only those axes
    (trilinear is separable; unchanged axes are identity).
    W: in-lane interpolation — output slot 2δ+0 = 0.75·x[δ] + 0.25·x[δ−1],
    slot 2δ+1 = 0.75·x[δ] + 0.25·x[δ+1] — via three (rC → 2rC) constant
    matmuls (current / previous / next block) plus clamp corrections at the
    two global W boundaries.  Output layout: standard(2r, c)."""
    r, c = layout.r, layout.c
    idx_in = layout.index()
    lout = standard_layout(2 * r, c)
    idx_out = lout.index()

    b, d, h, wpn, rc = xp.shape
    xf = xp.astype(jnp.float32)
    xf = jax.image.resize(xf, (b, 2 * d, 2 * h, wpn, rc), method="trilinear")

    A = np.zeros((r * c, 2 * r * c), np.float32)    # current block
    B = np.zeros((r * c, 2 * r * c), np.float32)    # previous block
    C2 = np.zeros((r * c, 2 * r * c), np.float32)   # next block
    for di in range(r):
        for ch in range(c):
            A[idx_in[di, ch], idx_out[2 * di, ch]] += 0.75
            A[idx_in[di, ch], idx_out[2 * di + 1, ch]] += 0.75
            if di > 0:
                A[idx_in[di - 1, ch], idx_out[2 * di, ch]] += 0.25
            else:
                B[idx_in[r - 1, ch], idx_out[0, ch]] += 0.25
            if di < r - 1:
                A[idx_in[di + 1, ch], idx_out[2 * di + 1, ch]] += 0.25
            else:
                C2[idx_in[0, ch], idx_out[2 * r - 1, ch]] += 0.25

    prev_b = _w_neighbor(xf, -1)
    next_b = _w_neighbor(xf, +1)
    y = xf @ jnp.asarray(A) + prev_b @ jnp.asarray(B) + next_b @ jnp.asarray(C2)
    # clamp corrections: first output voxel reads x[-1]→x[0], last reads
    # x[W]→x[W-1]; the zero-neighbor terms above contributed 0 there.
    # The output layout is standard, so slot 0 / slot 2r−1 are STATIC
    # channel slices (array-indexed .at[] would lower to scatter HLO).
    assert np.array_equal(idx_in, standard_layout(r, c).index()), \
        "packed_resize2x requires the standard layout (callers to_standard())"
    first_src = xf[:, :, :, 0, 0:c]                 # (b, 2d, 2h, c)
    last_src = xf[:, :, :, -1, (r - 1) * c:]
    y = y.at[:, :, :, 0, 0:c].add(0.25 * first_src)
    y = y.at[:, :, :, -1, (2 * r - 1) * c:].add(0.25 * last_src)
    return y.astype(xp.dtype)


# ---------------------------------------------------------------------------
# PX: packed activation wrapper (traced data + static layout metadata)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class PX:
    """A packed activation flowing through the model: `data` is the traced
    (B, D, H, Wp, rC) array; `layout` and the original W size are static
    pytree aux data (hashable), so PX works under jit/grad/remat/vmap.

    Implements the small algebra cells need: PX + PX (same layout) and
    scalar · PX (MixedOp weighting)."""

    def __init__(self, data: Array, layout: PackedLayout, w_in: int):
        self.data = data
        self.layout = layout
        self.w_in = w_in

    def tree_flatten(self):
        return (self.data,), (self.layout, self.w_in)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @staticmethod
    def pack(x: Array, r: int) -> "PX":
        w_in = x.shape[3]
        return PX(pack(x, r), standard_layout(r, x.shape[4]), w_in)

    def unpack(self) -> Array:
        """Back to (B, D, H, W, C).  Standard layout: free reshape; other
        layouts gather lanes to standard order first."""
        std = self.to_standard()
        return unpack(std.data, std.layout.r)

    def to_standard(self) -> "PX":
        lay = self.layout
        std = standard_layout(lay.r, lay.c)
        if lay.idx == std.idx:
            return self
        gathered = self.data[..., lay.index().reshape(-1)]
        return PX(gathered, std, self.w_in)

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    def astype(self, dt) -> "PX":
        return PX(self.data.astype(dt), self.layout, self.w_in)

    def __add__(self, other: "PX") -> "PX":
        assert isinstance(other, PX) and other.layout.idx == self.layout.idx, \
            "PX addition requires identical layouts"
        return PX(self.data + other.data, self.layout, self.w_in)

    def __mul__(self, scalar) -> "PX":
        return PX(self.data * scalar, self.layout, self.w_in)

    __rmul__ = __mul__

    def repack(self, r_new: int) -> "PX":
        """Change the packing factor (standard layout): moving factors
        between Wp and channels is a FREE reshape in row-major (adjacent
        dims merge/split)."""
        std = self.to_standard()
        r, c = std.layout.r, std.layout.c
        if r_new == r:
            return std
        b, d, h, wp, rc = std.data.shape
        assert (wp * r) % r_new == 0, (wp, r, r_new)
        data = std.data.reshape(b, d, h, wp * r // r_new, r_new * c)
        return PX(data, standard_layout(r_new, c), std.w_in)

    def slice_channels(self, start_c: int, n_c: int) -> "PX":
        """Logical channel slice [start_c, start_c+n_c).  Contiguous (zero
        cost) when the layout is a concat of standard blocks aligned to the
        slice; otherwise a lane gather."""
        lay = self.layout
        idx = lay.index()[:, start_c:start_c + n_c]   # (r, n_c)
        flat = idx.reshape(-1)
        lo, hi = flat.min(), flat.max()
        std = standard_layout(lay.r, n_c)
        if (hi - lo + 1 == flat.size
                and np.array_equal(flat - lo, std.index().reshape(-1))):
            return PX(self.data[..., int(lo):int(hi) + 1], std, self.w_in)
        return PX(self.data[..., flat], std, self.w_in)

    def permute_channels(self, perm: Sequence[int]) -> "PX":
        """Logical channel permutation: out channel j = in channel perm[j].

        ZERO data movement — only the layout's (δ, channel) → lane map is
        permuted; downstream packed ops consume arbitrary layouts through
        their trace-time weight scatters / shift matrices.  (This makes the
        PC-DARTS channel shuffle free in packed execution; an unpacked
        shuffle is a real gather/transpose of the tensor.)"""
        lay = self.layout
        assert len(perm) == lay.c, (len(perm), lay.c)
        idx = lay.index()[:, list(perm)]              # (r, c) column permute
        new = PackedLayout(r=lay.r, c=lay.c,
                           idx=tuple(map(tuple, idx.tolist())))
        return PX(self.data, new, self.w_in)


def px_concat(parts: Sequence[PX]) -> PX:
    """Concatenate packed activations along logical channels."""
    lay = concat_layouts([p.layout for p in parts])
    data = jnp.concatenate([p.data for p in parts], axis=-1)
    return PX(data, lay, parts[0].w_in)
