"""Pallas TPU kernels for the hot 3D-conv paths (SURVEY.md §2a plan).

Design (per /opt/skills/guides/pallas_guide.md):
  * Layout is channels-last (B, D, H, W, C): C rides the 128-wide lanes.
  * `conv3d` (3×3×3, stride 1|2, dilation 1|2, SAME): per grid step a halo
    slab of the padded input is DMA'd HBM→VMEM, an im2col matrix of shape
    (TH·W_out, 27·Cin) is assembled in registers, and ONE MXU matmul
    against the (27·Cin, Cout) weight panel produces the output tile —
    K = 27·Cin keeps the systolic array full even at small channel counts,
    where a per-tap matmul would run the MXU at Cin/128 utilisation.
  * Optional fused epilogue: +bias and ReLU ride the matmul result while
    it is still in registers (saves one HBM round trip of the activation).
  * `pointwise_conv` (1×1×1) is a pure matmul over flattened voxels.
  * `conv_transpose2x` (kernel 2, stride 2) is a single matmul
    (voxels, Cin) @ (Cin, 8·Cout) followed by an in-register
    depth-to-space — the MXU-native form of deconvolution; no scatter,
    no overlap (this is why the framework standardizes on k2s2 transpose
    convs, see ops/primitives.py).
  * Backward passes go through jax.custom_vjp: grads are computed with the
    XLA conv (transposed-conv identities), keeping training correctness
    independent of kernel tuning.  Forward-only use (inference) never
    touches XLA conv.

All kernels are validated against `lax.conv_general_dilated` oracles in
tests/test_pallas.py (interpret mode on CPU + real-chip parity).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_DIMNUMS = ("NDHWC", "DHWIO", "NDHWC")


def _same_pad(in_size: int, stride: int, k: int, dil: int) -> Tuple[int, int]:
    """SAME padding (lo, hi) for one spatial dim."""
    out = -(-in_size // stride)
    eff_k = (k - 1) * dil + 1
    total = max((out - 1) * stride + eff_k - in_size, 0)
    return total // 2, total - total // 2


def _conv3d_kernel(x_ref, w_ref, b_ref, out_ref, acc_ref,
                   *, stride: int, dil: int, th: int, h_out: int, w_out: int,
                   c_in: int, c_out: int, relu: bool, out_dtype):
    """Partial 2D conv for one depth tap kd, accumulated over kd revisits.

    The grid is (B, d_out, kd=3) with kd innermost; the input block is one
    padded input D-plane selected by index-map arithmetic
    (d = do·stride + kd·dil) — a size-1 block dim makes overlapping (halo)
    reads expressible without manual DMA, so Mosaic's DMA-slice alignment
    rules never apply and any channel count works.  Within the plane, an
    im2col tile (th·w_out, 9·Cin) is built from 9 shifted value slices and
    hits the MXU as a single matmul per H-tile against this kd's weight
    panel.  A persistent fp32 VMEM scratch accumulates the three kd
    contributions; bias/ReLU are fused on the last revisit.
    """
    kd = pl.program_id(2)
    plane = x_ref[0, 0]                       # (h_span, w_pad, c_in)
    wpanel = w_ref[0]                         # (9*c_in, c_out)

    h_tiles = h_out // th
    for ht in range(h_tiles):
        taps = []
        for kh in range(3):
            for kw in range(3):
                tap = jax.lax.slice(
                    plane,
                    (ht * th * stride + kh * dil, kw * dil, 0),
                    (ht * th * stride + kh * dil + (th - 1) * stride + 1,
                     kw * dil + (w_out - 1) * stride + 1,
                     c_in),
                    (stride, stride, 1))      # (th, w_out, c_in)
                # reshape BEFORE the lane-concat: merging (th, w_out) into
                # rows normalizes each tap's sublane offset (Mosaic cannot
                # concat vectors whose non-concat dims carry different
                # offsets from the shifted slices)
                taps.append(tap.reshape(th * w_out, c_in))
        im2col = jnp.concatenate(taps, axis=-1)
        part = jnp.dot(im2col, wpanel, preferred_element_type=jnp.float32)

        rows = pl.ds(ht * th * w_out, th * w_out)

        @pl.when(kd == 0)
        def _():
            acc_ref[rows, :] = part

        @pl.when(kd != 0)
        def _():
            acc_ref[rows, :] = acc_ref[rows, :] + part

    @pl.when(kd == 2)
    def _():
        res = acc_ref[:] + b_ref[0].astype(jnp.float32)
        if relu:
            res = jnp.maximum(res, 0.0)
        out_ref[0, 0] = res.reshape(h_out, w_out, c_out).astype(out_dtype)


def _pick_th(h_out: int, w_out: int, target_rows: int = 512) -> int:
    """Divisor of h_out keeping im2col tiles near the target row count."""
    cands = [t for t in range(1, h_out + 1) if h_out % t == 0]
    return min(cands, key=lambda t: (abs(t * w_out - target_rows), t))


def _lane_pad(c: int) -> int:
    return -(-c // 128) * 128


def conv3d_pallas_viable(x_shape, c_out: int, stride: int, dil: int,
                         itemsize: int, vmem_budget: int = 12 * 2**20) -> bool:
    """Pallas conv3d pays off only when channel lane-padding stays small and
    the per-step plane blocks fit VMEM; otherwise XLA's native conv (which
    has layout freedoms Mosaic does not expose for C<128 DMA) is faster.
    Measured on v5e: C>=32 stride-1 cell convs are competitive; the C=4 stem
    loses/OOMs, and Mosaic cannot lower the strided (stride-2) value slices
    (vector.extract_strided_slice is confined to stride 1)."""
    B, D, H, W, Cin = x_shape
    if Cin < 32 or stride != 1:
        return False
    h_out = -(-H // stride)
    w_out = -(-W // stride)
    need = lambda o: (o - 1) * stride + 2 * dil + 1
    in_block = need(h_out) * need(w_out) * _lane_pad(Cin) * itemsize
    out_block = h_out * w_out * _lane_pad(c_out) * itemsize
    acc = h_out * w_out * _lane_pad(c_out) * 4
    wp = 3 * 9 * Cin * _lane_pad(c_out) * itemsize
    return 2 * (in_block + out_block) + acc + wp < vmem_budget


def _conv3d_pallas_fwd(x: Array, w: Array, b: Optional[Array],
                       stride: int, dil: int, relu: bool,
                       interpret: bool = False) -> Array:
    """x: (B, D, H, W, Cin); w: (3, 3, 3, Cin, Cout); b: (Cout,) or None."""
    B, D, H, W, Cin = x.shape
    Cout = w.shape[-1]

    if not interpret and not conv3d_pallas_viable(
            x.shape, Cout, stride, dil, x.dtype.itemsize):
        return conv3d_reference(x, w, b, stride, dil, relu)

    d_out = -(-D // stride)
    h_out = -(-H // stride)
    w_out = -(-W // stride)
    th = _pick_th(h_out, w_out)

    pads = [_same_pad(s, stride, 3, dil) for s in (D, H, W)]
    need = lambda o: (o - 1) * stride + 2 * dil + 1
    xp = jnp.pad(x, [(0, 0)] + [
        (p_lo, max(p_hi, need(o) - s - p_lo))
        for (p_lo, p_hi), s, o in zip(pads, (D, H, W), (d_out, h_out, w_out))
    ] + [(0, 0)])
    h_span, w_pad = xp.shape[2], xp.shape[3]

    # weights as one (9·Cin, Cout) panel per depth tap kd
    wk = jnp.transpose(w, (0, 1, 2, 3, 4)).reshape(3, 9 * Cin, Cout)
    bv = (b if b is not None else jnp.zeros((Cout,), w.dtype)).reshape(1, Cout)

    kernel = functools.partial(
        _conv3d_kernel, stride=stride, dil=dil, th=th, h_out=h_out,
        w_out=w_out, c_in=Cin, c_out=Cout, relu=relu, out_dtype=x.dtype)

    flops = 2 * B * d_out * h_out * w_out * 27 * Cin * Cout
    return pl.pallas_call(
        kernel,
        grid=(B, d_out, 3),
        in_specs=[
            pl.BlockSpec((1, 1, h_span, w_pad, Cin),
                         lambda bb, dd, kd: (bb, dd * stride + kd * dil, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9 * Cin, Cout), lambda bb, dd, kd: (kd, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h_out, w_out, Cout),
            lambda bb, dd, kd: (bb, dd, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, d_out, h_out, w_out, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h_out * w_out, Cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * xp.size * xp.dtype.itemsize
            + B * d_out * h_out * w_out * Cout * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, wk, bv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def conv3d(x: Array, w: Array, b: Optional[Array], stride: int = 1,
           dilation: int = 1, relu: bool = False, interpret: bool = False) -> Array:
    """3×3×3 conv, SAME padding, optional fused bias+ReLU (Pallas forward)."""
    return _conv3d_pallas_fwd(x, w, b, stride, dilation, relu, interpret)


def _conv3d_fwd_rule(x, w, b, stride, dilation, relu, interpret):
    y = _conv3d_pallas_fwd(x, w, b, stride, dilation, relu, interpret)
    return y, (x, w, b, y if relu else None)


def conv3d_reference(x: Array, w: Array, b: Optional[Array], stride: int = 1,
                     dilation: int = 1, relu: bool = False) -> Array:
    """XLA-conv reference with identical semantics (oracle + backward anchor)."""
    pads = [_same_pad(s, stride, 3, dilation) for s in x.shape[1:4]]
    # no preferred_element_type: TPU accumulates bf16 convs in fp32
    # internally, and JAX's conv VJP requires matching primal dtypes
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,) * 3, padding=pads,
        rhs_dilation=(dilation,) * 3,
        dimension_numbers=jax.lax.conv_dimension_numbers(x.shape, w.shape, _DIMNUMS))
    if b is not None:
        y = y + b.astype(y.dtype)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _conv3d_bwd_rule(stride, dilation, relu, interpret, res, g):
    # Differentiate the XLA reference (bitwise-equal semantics) — keeps
    # training gradients on XLA's battle-tested transposed convs while the
    # forward stays on the Pallas kernel.
    x, w, b, _ = res
    g = g.astype(x.dtype)  # cotangent arrives in the output (compute) dtype
    if b is None:
        _, vjp = jax.vjp(lambda xx, ww: conv3d_reference(xx, ww, None, stride, dilation, relu), x, w)
        dx, dw = vjp(g)
        return dx, dw, None
    _, vjp = jax.vjp(lambda xx, ww, bb: conv3d_reference(xx, ww, bb, stride, dilation, relu), x, w, b)
    dx, dw, db = vjp(g)
    return dx, dw, db


conv3d.defvjp(_conv3d_fwd_rule, _conv3d_bwd_rule)


# ---------------------------------------------------------------------------
# 1×1×1 conv: a single matmul over flattened voxels.
# ---------------------------------------------------------------------------

def _pointwise_kernel(x_ref, w_ref, out_ref, *, relu, bias, out_dtype):
    xm = x_ref[:]
    wmat = w_ref[:]
    if bias:
        k = wmat.shape[0] - 1
        c = wmat.shape[-1]
        w_main = jax.lax.slice(wmat, (0, 0), (k, c))
        w_bias = jax.lax.slice(wmat, (k, 0), (k + 1, c))
        acc = jnp.dot(xm, w_main, preferred_element_type=jnp.float32)
        acc = acc + w_bias.astype(jnp.float32)
    else:
        acc = jnp.dot(xm, wmat, preferred_element_type=jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = acc.astype(out_dtype)


def pointwise_reference(x: Array, w: Array, b: Optional[Array] = None,
                        relu: bool = False) -> Array:
    y = jnp.einsum("bdhwc,ck->bdhwk", x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pointwise_conv(x: Array, w: Array, b: Optional[Array] = None,
                   relu: bool = False, block_rows: int = 1024) -> Array:
    """1×1×1 conv (+bias+ReLU): (B,D,H,W,Cin)·(Cin,Cout)."""
    return _pointwise_fwd(x, w, b, relu, block_rows)


def _pointwise_fwd_rule(x, w, b, relu, block_rows):
    return _pointwise_fwd(x, w, b, relu, block_rows), (x, w, b)


def _pointwise_bwd_rule(relu, block_rows, res, g):
    x, w, b = res
    g = g.astype(x.dtype)
    if b is None:
        _, vjp = jax.vjp(lambda xx, ww: pointwise_reference(xx, ww, None, relu), x, w)
        dx, dw = vjp(g)
        return dx, dw, None
    _, vjp = jax.vjp(lambda xx, ww, bb: pointwise_reference(xx, ww, bb, relu), x, w, b)
    return vjp(g)


def _pointwise_fwd(x: Array, w: Array, b: Optional[Array] = None,
                   relu: bool = False, block_rows: int = 1024) -> Array:
    B, D, H, W, Cin = x.shape
    Cout = w.shape[-1]
    rows = B * D * H * W
    xm = x.reshape(rows, Cin)
    br = min(block_rows, rows)
    while rows % br:
        br -= 1
    wmat = w.reshape(Cin, Cout)
    if b is not None:
        wmat = jnp.concatenate([wmat, b.reshape(1, Cout).astype(wmat.dtype)], axis=0)
    kernel = functools.partial(_pointwise_kernel, relu=relu, bias=b is not None,
                               out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(rows // br,),
        in_specs=[
            pl.BlockSpec((br, Cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, Cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, Cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * Cin * Cout,
            bytes_accessed=(rows * (Cin + Cout) + Cin * Cout) * x.dtype.itemsize,
            transcendentals=0),
    )(xm, wmat)
    return out.reshape(B, D, H, W, Cout)


pointwise_conv.defvjp(_pointwise_fwd_rule, _pointwise_bwd_rule)


# ---------------------------------------------------------------------------
# Transpose conv, kernel 2, stride 2: matmul + depth-to-space.
# ---------------------------------------------------------------------------

def _transpose2x_kernel(x_ref, w_ref, out_ref, *, relu, out_dtype, c_out):
    xm = x_ref[:]                                        # (rows_tile, Cin)
    acc = jnp.dot(xm, w_ref[:], preferred_element_type=jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = acc.astype(out_dtype)                   # (rows_tile, 8*Cout)


def transpose2x_reference(x: Array, w: Array, relu: bool = False) -> Array:
    y = jax.lax.conv_transpose(
        x, w.astype(x.dtype), strides=(2, 2, 2), padding="VALID",
        dimension_numbers=_DIMNUMS)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_transpose2x(x: Array, w: Array, relu: bool = False,
                     block_rows: int = 512) -> Array:
    """See _transpose2x_fwd."""
    return _transpose2x_fwd(x, w, relu, block_rows)


def _transpose2x_fwd_rule(x, w, relu, block_rows):
    return _transpose2x_fwd(x, w, relu, block_rows), (x, w)


def _transpose2x_bwd_rule(relu, block_rows, res, g):
    x, w = res
    g = g.astype(x.dtype)
    _, vjp = jax.vjp(lambda xx, ww: transpose2x_reference(xx, ww, relu), x, w)
    return vjp(g)


def _transpose2x_fwd(x: Array, w: Array, relu: bool = False,
                     block_rows: int = 512) -> Array:
    """Kernel-2 stride-2 transpose conv: each input voxel expands to a 2³
    output block — one matmul (voxels, Cin)@(Cin, 8·Cout) + depth-to-space.

    w: (2, 2, 2, Cin, Cout) in flax ConvTranspose (DHWIO) layout.  lax/flax
    semantics place the spatially *flipped* tap on each output offset
    (transpose_kernel=False), so flip before flattening."""
    B, D, H, W, Cin = x.shape
    Cout = w.shape[-1]
    wflip = w[::-1, ::-1, ::-1]
    # (2,2,2,Cin,Cout) → (Cin, 2,2,2, Cout) → (Cin, 8*Cout)
    wmat = jnp.transpose(wflip, (3, 0, 1, 2, 4)).reshape(Cin, 8 * Cout)

    rows = B * D * H * W
    xm = x.reshape(rows, Cin)
    br = min(block_rows, rows)
    while rows % br:
        br -= 1
    kernel = functools.partial(_transpose2x_kernel, relu=relu,
                               out_dtype=x.dtype, c_out=Cout)
    out = pl.pallas_call(
        kernel,
        grid=(rows // br,),
        in_specs=[
            pl.BlockSpec((br, Cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, 8 * Cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 8 * Cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * Cin * 8 * Cout,
            bytes_accessed=(rows * (Cin + 8 * Cout) + Cin * 8 * Cout) * x.dtype.itemsize,
            transcendentals=0),
    )(xm, wmat)
    # depth-to-space: (B,D,H,W, 2,2,2,Cout) → (B, 2D, 2H, 2W, Cout)
    out = out.reshape(B, D, H, W, 2, 2, 2, Cout)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return out.reshape(B, 2 * D, 2 * H, 2 * W, Cout)


conv_transpose2x.defvjp(_transpose2x_fwd_rule, _transpose2x_bwd_rule)
