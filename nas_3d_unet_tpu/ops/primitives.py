"""Candidate primitive ops for NAS edges.

The reference keeps an ``OPS`` registry mapping op names to torch ``nn.Module``
factories: identity/none, 3³ conv, dilated conv, depthwise-separable conv,
avg/max pool, with stride-2 "down" variants and transpose-conv/upsample "up"
variants, each wrapped with norm + activation (SURVEY.md §2 "Primitive ops").

TPU-first decisions (not a translation):
  * Layout is channels-last (B, D, H, W, C) — the lane dimension is C, which
    XLA tiles onto the 128-wide MXU/VPU lanes directly.
  * Norm is GroupNorm (stateless under jit; BatchNorm's running stats are
    hostile to a single compiled training graph and to GSPMD).  Order is
    conv → norm → act.
  * Transpose conv uses kernel 2, stride 2: exact 2× upsampling with no
    output-window overlap, which lowers to one matmul + depth-to-space — the
    MXU-friendliest deconv form (also the basis of the Pallas kernel).
  * All ops preserve the channel count C; cells pre-project inputs to C with
    1³ convs, so `identity`/`none`/pool edges need no channel adapters.

Three op sets (SURVEY.md §2 cell/ops rows):
  NORMAL_OPS — stride-1 edges inside a cell,
  DOWN_OPS   — stride-2 edges from a down-cell's inputs (encoder),
  UP_OPS     — 2× upsampling edges from an up-cell's below-input (decoder).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .packed import (
    PX,
    conv_stats_fused_viable,
    packed_avg_pool3,
    packed_conv,
    packed_conv_stats,
    packed_depthwise3,
    packed_group_norm,
    packed_group_norm_from_stats,
    max_pool3_shifted,
    packed_max_pool3,
    packed_resize2x,
    packed_transpose2x,
    standard_layout,
)
from .pallas.conv3d import conv3d as pallas_conv3d
from .pallas.conv3d import conv_transpose2x, pointwise_conv
from .pallas.groupnorm import group_norm as pallas_group_norm

Array = jax.Array


class PallasGroupNorm(nn.Module):
    """GroupNorm with nn.GroupNorm's param tree ('scale'/'bias') and the
    fused Pallas forward/backward (ops/pallas/groupnorm.py); shapes that
    cannot lane-fuse fall back to the XLA reference inside group_norm."""

    num_groups: int
    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return pallas_group_norm(x.astype(self.dtype), scale, bias,
                                 self.num_groups, self.epsilon, False)


class PackedGroupNormMod(nn.Module):
    """GroupNorm (optionally ReLU-fused) on a PX activation; nn.GroupNorm's
    param tree."""

    num_groups: int
    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-6
    relu: bool = False

    @nn.compact
    def __call__(self, x: PX, s1=None, s2=None) -> PX:
        c = x.layout.c
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if s1 is not None:
            # raw moments precomputed by the fused conv+stats producer
            y = packed_group_norm_from_stats(
                x.data.astype(self.dtype), scale, bias, s1, s2,
                self.num_groups, x.layout, self.epsilon, self.relu)
        else:
            y = packed_group_norm(x.data.astype(self.dtype), scale, bias,
                                  self.num_groups, x.layout, self.epsilon,
                                  self.relu)
        return PX(y, x.layout, x.w_in)


def _norm(kind: str, gn_groups: int, dtype,
          use_pallas: bool = False) -> Callable[[], nn.Module]:
    """Factory: make(c, packed, relu) → (module, relu_was_fused).

    `relu` is a fusion REQUEST: the packed GroupNorm folds the activation
    into its custom-VJP normalize pass (one less full-volume pass fwd and
    no mask pass bwd); other branches leave the ReLU to the caller."""
    if kind in ("group", "instance"):
        def make(c, packed=False, relu=False):
            groups = c if kind == "instance" else _gn_groups_for(c, gn_groups)
            # all classes share the param tree; name fixed for checkpoint
            # compatibility across the use_pallas / packed flags
            if packed:
                return (PackedGroupNormMod(num_groups=groups, dtype=dtype,
                                           relu=relu, name="norm"), relu)
            if use_pallas:
                return (PallasGroupNorm(num_groups=groups, dtype=dtype,
                                        name="norm"), False)
            return (nn.GroupNorm(num_groups=groups, dtype=dtype,
                                 param_dtype=jnp.float32, name="norm"), False)
        return make
    if kind == "none":
        def make(c, packed=False, relu=False):
            return (lambda x: x), False
        return make
    raise ValueError(f"unknown norm {kind!r}")


def _gn_groups_for(channels: int, groups: int) -> int:
    g = min(groups, channels)
    while channels % g != 0:
        g -= 1
    return g


class PallasPointwise(nn.Module):
    """1³ conv with nn.Conv's param tree, Pallas matmul forward."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, 1, c_in, self.features), jnp.float32)
        return pointwise_conv(x.astype(self.dtype),
                              w.reshape(c_in, self.features).astype(self.dtype))


class PallasTranspose2x(nn.Module):
    """k2s2 transpose conv with nn.ConvTranspose's param tree, Pallas forward."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (2, 2, 2, x.shape[-1], self.features), jnp.float32)
        return conv_transpose2x(x.astype(self.dtype), w.astype(self.dtype))


class PallasConv3(nn.Module):
    """3³ conv with the same param tree as nn.Conv (kernel name/shape), but
    a Pallas MXU forward when the shape is viable (ops/pallas/conv3d.py);
    falls back to the XLA reference inside conv3d otherwise."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 3, x.shape[-1], self.features), jnp.float32)
        x = x.astype(self.dtype)
        return pallas_conv3d(x, w.astype(self.dtype), None,
                             self.stride, self.dilation, False)


class PackedConvK(nn.Module):
    """Packed conv (kernel 1/3, stride 1/2, dilation 1/2) with nn.Conv's
    param tree ('kernel', logical shape).  Consumes and produces PX; the
    packing factor halves under stride 2 (ops/packed.py)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = False
    stats: bool = False   # also return GN raw moments (fused Pallas path)

    @nn.compact
    def __call__(self, x: PX):
        cin = x.layout.c
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel,) * 3 + (cin, self.features), jnp.float32)
        r_out = x.layout.r if self.stride == 1 else max(1, x.layout.r // 2)
        lout = standard_layout(r_out, self.features)
        w_out = -(-x.w_in // self.stride)
        if self.stats:
            assert not self.use_bias
            y, s1, s2 = packed_conv_stats(
                x.data.astype(self.dtype), w.astype(self.dtype), x.layout,
                lout, w_in=x.w_in, kernel=(self.kernel,) * 3,
                stride=self.stride, dilation=self.dilation)
            return PX(y, lout, w_out), s1, s2
        y = packed_conv(x.data.astype(self.dtype), w.astype(self.dtype),
                        x.layout, lout, w_in=x.w_in,
                        kernel=(self.kernel,) * 3, stride=self.stride,
                        dilation=self.dilation)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + jnp.tile(b, r_out).astype(y.dtype)   # standard layout
        return PX(y, lout, w_out)


class PackedTranspose2xMod(nn.Module):
    """k2s2 transpose conv on PX with nn.ConvTranspose's param tree.
    Output packing factor doubles (callers repack to the target level)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: PX) -> PX:
        cin = x.layout.c
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (2, 2, 2, cin, self.features), jnp.float32)
        std = x.to_standard()
        lout = standard_layout(2 * std.layout.r, self.features)
        y = packed_transpose2x(std.data.astype(self.dtype),
                               w.astype(self.dtype), std.layout, lout)
        return PX(y, lout, 2 * std.w_in)


class ConvNormAct(nn.Module):
    """conv3d → GroupNorm → ReLU.  The basic building block of every conv op."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    norm: str = "group"
    gn_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    act: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x) -> Array:
        # all branches name the module "conv" with param "kernel", so the
        # checkpoint pytree is identical whichever path a config picks
        packed = isinstance(x, PX)
        s1 = s2 = None
        if packed:
            assert self.groups == 1, "grouped ConvNormAct has no packed path"
            r_out = x.layout.r if self.stride == 1 else max(1, x.layout.r // 2)
            fuse_stats = (
                self.norm in ("group", "instance")
                and conv_stats_fused_viable(
                    x.layout, standard_layout(r_out, self.features),
                    x.shape[3], jnp.dtype(self.dtype), (self.kernel,) * 3,
                    self.stride, self.dilation, h_n=x.shape[2],
                    w_in=x.w_in))
            conv = PackedConvK(self.features, self.kernel, self.stride,
                               self.dilation, self.dtype, stats=fuse_stats,
                               name="conv")
            if fuse_stats:
                x, s1, s2 = conv(x)
            else:
                x = conv(x)
        elif self.use_pallas and self.kernel == 3 and self.groups == 1:
            x = PallasConv3(self.features, self.stride, self.dilation,
                            self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(self.kernel,) * 3,
                strides=(self.stride,) * 3,
                kernel_dilation=(self.dilation,) * 3,
                feature_group_count=self.groups,
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        norm_mod, relu_fused = _norm(self.norm, self.gn_groups, self.dtype,
                                     self.use_pallas)(self.features, packed,
                                                      relu=self.act)
        x = norm_mod(x, s1, s2) if s1 is not None else norm_mod(x)
        if self.act and not relu_fused:
            x = PX(nn.relu(x.data), x.layout, x.w_in) if packed else nn.relu(x)
        return x


class SepConv(nn.Module):
    """Depthwise 3³ conv + pointwise 1³ conv (depthwise-separable)."""

    features: int
    stride: int = 1
    norm: str = "group"
    gn_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x) -> Array:
        packed = isinstance(x, PX)
        if packed:
            x = PackedDepthwise3(self.stride, self.dtype, name="dw")(x)
            x = PackedConvK(self.features, 1, 1, 1, self.dtype, name="pw")(x)
        else:
            c_in = x.shape[-1]
            x = nn.Conv(
                c_in,
                kernel_size=(3, 3, 3),
                strides=(self.stride,) * 3,
                feature_group_count=c_in,
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="dw",
            )(x)
            if self.use_pallas:
                x = PallasPointwise(self.features, self.dtype, name="pw")(x)
            else:
                x = nn.Conv(
                    self.features,
                    kernel_size=(1, 1, 1),
                    padding="SAME",
                    use_bias=False,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name="pw",
                )(x)
        norm_mod, relu_fused = _norm(self.norm, self.gn_groups, self.dtype,
                                     self.use_pallas)(self.features, packed,
                                                      relu=True)
        x = norm_mod(x)
        if relu_fused:
            return x
        return PX(nn.relu(x.data), x.layout, x.w_in) if packed else nn.relu(x)


class PackedDepthwise3(nn.Module):
    """Depthwise 3³ conv on PX with flax's depthwise param tree
    ('kernel' of shape (3,3,3,1,C))."""

    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: PX) -> PX:
        c = x.layout.c
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 3, 1, c), jnp.float32)
        std = x.to_standard()
        y = packed_depthwise3(std.data.astype(self.dtype), w.astype(self.dtype),
                              std.layout, w_in=std.w_in, stride=self.stride)
        r_out = std.layout.r if self.stride == 1 else max(1, std.layout.r // 2)
        w_out = -(-std.w_in // self.stride)
        return PX(y, standard_layout(r_out, c), w_out)


class Zero(nn.Module):
    """The `none` op: zeros with the correct (possibly strided) output shape."""

    stride: int = 1

    @nn.compact
    def __call__(self, x) -> Array:
        if isinstance(x, PX):
            if self.stride == 1:
                std = x.to_standard()
                return PX(jnp.zeros_like(std.data), std.layout, std.w_in)
            s = self.stride
            r_out = max(1, x.layout.r // s)
            lout = standard_layout(r_out, x.layout.c)
            b, d, h, wp, _ = x.data.shape
            w_out = -(-x.w_in // s)
            zero = jnp.zeros((b, -(-d // s), -(-h // s), w_out // r_out,
                              lout.packed_channels), x.dtype)
            return PX(zero, lout, w_out)
        if self.stride == 1:
            return jnp.zeros_like(x)
        s = self.stride
        return jnp.zeros_like(x[:, ::s, ::s, ::s, :])


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x


class Pool(nn.Module):
    """3³ avg/max pool, SAME padding, stride 1 (normal) or 2 (down)."""

    kind: str  # "avg" | "max"
    stride: int = 1

    @nn.compact
    def __call__(self, x) -> Array:
        if isinstance(x, PX):
            std = x.to_standard()
            if self.kind == "avg":
                y = packed_avg_pool3(std.data, std.layout, w_in=std.w_in,
                                     stride=self.stride)
            else:
                y = packed_max_pool3(std.data, std.layout, stride=self.stride)
            r_out = std.layout.r if self.stride == 1 else max(1, std.layout.r // 2)
            w_out = -(-std.w_in // self.stride)
            return PX(y, standard_layout(r_out, std.layout.c), w_out)
        win = (1, 3, 3, 3, 1)
        strides = (1, self.stride, self.stride, self.stride, 1)
        if self.kind == "avg":
            # nn.avg_pool(count_include_pad=False) PROMOTES bf16 → f32; cast
            # back or the f32 poisons every downstream accumulation — at
            # 128³ C=16 each poisoned temp costs 1 GiB on TPU (f32 + the 8×
            # lane padding of C=16 in a T(8,128) layout), which alone OOMed
            # the merged supernet (measured round 2).
            y = nn.avg_pool(x, win[1:4], strides=strides[1:4], padding="SAME",
                            count_include_pad=False)
            return y.astype(x.dtype)
        # NOT nn.max_pool: reduce_window-max's SelectAndScatter gradient is
        # silently mis-partitioned under GSPMD spatial sharding (packed.py
        # _axis_max3 has the measurement); same forward values
        return max_pool3_shifted(x, self.stride)


class UpTranspose(nn.Module):
    """2× transpose conv (kernel 2, stride 2) → norm → ReLU."""

    features: int
    norm: str = "group"
    gn_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x) -> Array:
        packed = isinstance(x, PX)
        if packed:
            x = PackedTranspose2xMod(self.features, self.dtype, name="deconv")(x)
        elif self.use_pallas:
            x = PallasTranspose2x(self.features, self.dtype, name="deconv")(x)
        else:
            x = nn.ConvTranspose(
                self.features,
                kernel_size=(2, 2, 2),
                strides=(2, 2, 2),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="deconv",
            )(x)
        norm_mod, relu_fused = _norm(self.norm, self.gn_groups, self.dtype,
                                     self.use_pallas)(self.features, packed,
                                                      relu=True)
        x = norm_mod(x)
        if relu_fused:
            return x
        return PX(nn.relu(x.data), x.layout, x.w_in) if packed else nn.relu(x)


class UpSampleConv(nn.Module):
    """Trilinear 2× upsample, then a conv op (full or depthwise-separable)."""

    features: int
    separable: bool = False
    norm: str = "group"
    gn_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x) -> Array:
        if isinstance(x, PX):
            std = x.to_standard()
            y = packed_resize2x(std.data, std.layout)
            x = PX(y, standard_layout(2 * std.layout.r, std.layout.c),
                   2 * std.w_in)
        else:
            b, d, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * d, 2 * h, 2 * w, c),
                                 method="trilinear")
        if self.separable:
            return SepConv(self.features, 1, self.norm, self.gn_groups, self.dtype,
                           self.use_pallas)(x)
        return ConvNormAct(self.features, 3, 1, 1, 1, self.norm, self.gn_groups,
                           self.dtype, True, self.use_pallas)(x)


# ---------------------------------------------------------------------------
# Registries.  Factory signature: (features, norm, gn_groups, dtype) → Module.
# ---------------------------------------------------------------------------

NORMAL_OPS: Sequence[str] = (
    "none",
    "identity",
    "conv3",
    "dil_conv3",
    "sep_conv3",
    "avg_pool3",
    "max_pool3",
)

DOWN_OPS: Sequence[str] = (
    "down_avg_pool",
    "down_max_pool",
    "down_conv3",
    "down_dil_conv3",
    "down_sep_conv3",
)

UP_OPS: Sequence[str] = (
    "up_transpose",
    "up_conv3",
    "up_sep_conv3",
)

_FACTORIES = {
    # normal (stride 1)
    "none": lambda c, n, g, dt, up: Zero(stride=1),
    "identity": lambda c, n, g, dt, up: Identity(),
    "conv3": lambda c, n, g, dt, up: ConvNormAct(c, 3, 1, 1, 1, n, g, dt, True, up),
    "dil_conv3": lambda c, n, g, dt, up: ConvNormAct(c, 3, 1, 2, 1, n, g, dt, True, up),
    "sep_conv3": lambda c, n, g, dt, up: SepConv(c, 1, n, g, dt, up),
    "avg_pool3": lambda c, n, g, dt, up: Pool("avg", 1),
    "max_pool3": lambda c, n, g, dt, up: Pool("max", 1),
    # down (stride 2)
    "down_avg_pool": lambda c, n, g, dt, up: Pool("avg", 2),
    "down_max_pool": lambda c, n, g, dt, up: Pool("max", 2),
    "down_conv3": lambda c, n, g, dt, up: ConvNormAct(c, 3, 2, 1, 1, n, g, dt, True, up),
    "down_dil_conv3": lambda c, n, g, dt, up: ConvNormAct(c, 3, 2, 2, 1, n, g, dt, True, up),
    "down_sep_conv3": lambda c, n, g, dt, up: SepConv(c, 2, n, g, dt, up),
    # up (2x)
    "up_transpose": lambda c, n, g, dt, up: UpTranspose(c, n, g, dt, up),
    "up_conv3": lambda c, n, g, dt, up: UpSampleConv(c, False, n, g, dt, up),
    "up_sep_conv3": lambda c, n, g, dt, up: UpSampleConv(c, True, n, g, dt, up),
}


def make_op(name: str, features: int, norm: str = "group", gn_groups: int = 8,
            dtype: jnp.dtype = jnp.float32, use_pallas: bool = False) -> nn.Module:
    """Instantiate a candidate op by registry name."""
    if name not in _FACTORIES:
        raise KeyError(f"unknown op {name!r}")
    return _FACTORIES[name](features, norm, gn_groups, dtype, use_pallas)
