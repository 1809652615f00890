"""Exactness of the fused conv+GN-stats path (packed_conv_stats +
packed_group_norm_from_stats) vs the unfused packed ops.

Runs the Pallas kernel in interpret mode on CPU (NAS3D_PG_INTERPRET).  The
fused path must match the unfused conv→GN→ReLU chain's outputs and ALL
gradients (x, conv kernel, GN scale/bias) to fp32-accumulation tolerance:
the only numeric difference is tap-summation order inside the conv
(pgemm accumulates every tap in fp32; d2 rounds per kd tap).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from nas_3d_unet_tpu.ops.packed import (
    conv_stats_fused_viable,
    pack,
    packed_conv,
    packed_conv_stats,
    packed_group_norm,
    packed_group_norm_from_stats,
    standard_layout,
    unpack,
)
from nas_3d_unet_tpu.ops.primitives import ConvNormAct


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    monkeypatch.setenv("NAS3D_PG_INTERPRET", "1")
    # default-off (measured 2% step regression on this jaxlib); the tests
    # exercise the path explicitly
    monkeypatch.setenv("NAS3D_FUSED_CONVGN", "1")


def _mk(r, c, w, dn=8, hn=8, seed=0):
    lay = standard_layout(r, c)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((1, dn, hn, w // r, r * c)),
                    jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.1, jnp.float32)
    return lay, x, wgt


@pytest.mark.parametrize("dilation", [1, 2])
def test_conv_stats_match_separate(dilation):
    lay, x, wgt = _mk(4, 4, 32)
    y, s1, s2 = packed_conv_stats(x, wgt, lay, lay, w_in=32,
                                  dilation=dilation)
    y_ref = packed_conv(x, wgt, lay, lay, w_in=32, dilation=dilation,
                        conv_mode="d2")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1),
                               np.asarray(jnp.sum(y, axis=(1, 2, 3),
                                                  dtype=jnp.float32)),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s2),
        np.asarray(jnp.sum(jnp.square(y.astype(jnp.float32)),
                           axis=(1, 2, 3))), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("relu", [False, True])
def test_fused_chain_matches_unfused(relu):
    lay, x, wgt = _mk(4, 4, 32, seed=1)
    groups = 2
    scale = jnp.asarray(np.random.default_rng(2).standard_normal(4) * 0.2 + 1,
                        jnp.float32)
    bias = jnp.asarray(np.random.default_rng(3).standard_normal(4) * 0.1,
                       jnp.float32)

    def fused(x, wgt, scale, bias):
        y, s1, s2 = packed_conv_stats(x, wgt, lay, lay, w_in=32)
        out = packed_group_norm_from_stats(y, scale, bias, s1, s2, groups,
                                           lay, relu=relu)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def unfused(x, wgt, scale, bias):
        y = packed_conv(x, wgt, lay, lay, w_in=32, conv_mode="d2")
        out = packed_group_norm(y, scale, bias, groups, lay, relu=relu)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    va, ga = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(x, wgt, scale,
                                                             bias)
    vb, gb = jax.value_and_grad(unfused, argnums=(0, 1, 2, 3))(x, wgt, scale,
                                                               bias)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    for a, b, name in zip(ga, gb, ["dx", "dw", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4, err_msg=name)


def test_convnormact_uses_fused_path_and_matches():
    """Module level: same params, same output, fused on/off via env."""
    lay = standard_layout(4, 4)
    rng = np.random.default_rng(5)
    xd = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 16)), jnp.float32)
    from nas_3d_unet_tpu.ops.packed import PX

    x = PX(xd, lay, 32)
    mod = ConvNormAct(features=4, kernel=3, norm="group", gn_groups=2,
                      dtype=jnp.float32)
    assert conv_stats_fused_viable(lay, lay, 8, jnp.dtype(jnp.float32),
                                   (3, 3, 3), 1, 1)
    params = mod.init(jax.random.PRNGKey(0), x)
    y_fused = mod.apply(params, x)

    import os
    os.environ["NAS3D_FUSED_CONVGN"] = "0"
    try:
        mod2 = ConvNormAct(features=4, kernel=3, norm="group", gn_groups=2,
                           dtype=jnp.float32)
        params2 = mod2.init(jax.random.PRNGKey(0), x)
        y_plain = mod2.apply(params2, x)
    finally:
        os.environ.pop("NAS3D_FUSED_CONVGN", None)

    # identical param trees (the bit-for-bit checkpoint contract)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    np.testing.assert_allclose(np.asarray(y_fused.data),
                               np.asarray(y_plain.data), rtol=1e-5,
                               atol=1e-5)


def test_stats_gate_rejects_nonviable():
    # r=1 and stride-2 must not take the fused path
    assert not conv_stats_fused_viable(standard_layout(1, 16),
                                       standard_layout(1, 16), 16,
                                       jnp.dtype(jnp.float32), (3, 3, 3), 1, 1)
    assert not conv_stats_fused_viable(standard_layout(4, 4),
                                       standard_layout(2, 4), 8,
                                       jnp.dtype(jnp.float32), (3, 3, 3), 2, 1)
    # 1-cubed stride-1 same-r IS viable (GEMM+stats path, any r/wp)
    assert conv_stats_fused_viable(standard_layout(4, 4),
                                   standard_layout(4, 4), 4,
                                   jnp.dtype(jnp.float32), (1, 1, 1), 1, 1)
    # a merged conv too wide for scoped VMEM is rejected by the estimate
    assert not conv_stats_fused_viable(standard_layout(8, 16),
                                       standard_layout(8, 16 * 24), 16,
                                       jnp.dtype(jnp.bfloat16), (3, 3, 3),
                                       1, 1, h_n=128, w_in=128)


def test_gemm_stats_1cubed_matches():
    """1³ conv (pure lane mix) + GN via the fused Pallas GEMM path."""
    lay = standard_layout(4, 4)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 8, 16)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((1, 1, 1, 4, 4)) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(4) * 0.2 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(4) * 0.1, jnp.float32)

    def fused(x, wgt, scale, bias):
        y, s1, s2 = packed_conv_stats(x, wgt, lay, lay, w_in=32,
                                      kernel=(1, 1, 1))
        out = packed_group_norm_from_stats(y, scale, bias, s1, s2, 2, lay,
                                           relu=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def unfused(x, wgt, scale, bias):
        y = packed_conv(x, wgt, lay, lay, w_in=32, kernel=(1, 1, 1))
        out = packed_group_norm(y, scale, bias, 2, lay, relu=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    va, ga = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(x, wgt, scale,
                                                             bias)
    vb, gb = jax.value_and_grad(unfused, argnums=(0, 1, 2, 3))(x, wgt, scale,
                                                               bias)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    for a, b, name in zip(ga, gb, ["dx", "dw", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4, err_msg=name)


def test_convnormact_kernel1_fused_matches():
    from nas_3d_unet_tpu.ops.packed import PX

    lay = standard_layout(4, 8)
    rng = np.random.default_rng(8)
    xd = jnp.asarray(rng.standard_normal((1, 6, 6, 5, 32)), jnp.float32)
    x = PX(xd, lay, 20)
    mod = ConvNormAct(features=4, kernel=1, norm="group", gn_groups=2,
                      dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    y_fused = mod.apply(params, x)
    import os
    os.environ["NAS3D_FUSED_CONVGN"] = "0"
    try:
        y_plain = mod.apply(params, x)
    finally:
        os.environ.pop("NAS3D_FUSED_CONVGN", None)
    np.testing.assert_allclose(np.asarray(y_fused.data),
                               np.asarray(y_plain.data), rtol=1e-5,
                               atol=1e-5)
