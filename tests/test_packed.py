"""Exactness tests for lane-packed execution (ops/packed.py).

Every packed op must reproduce its unpacked lax/flax counterpart to fp32
accumulation tolerance on randomized shapes, including strided, dilated,
and layout-permuted (concat) inputs — the packed path is a pure
re-representation, not an approximation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nas_3d_unet_tpu.ops.packed import (
    PackedLayout,
    concat_layouts,
    pack,
    packed_avg_pool3,
    packed_conv,
    packed_depthwise3,
    packed_group_norm,
    packed_max_pool3,
    packed_transpose2x,
    same_pad,
    standard_layout,
    unpack,
)


def _conv_ref(x, w, stride, dilation):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, "SAME", rhs_dilation=(dilation,) * 3,
        dimension_numbers=dn)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 8, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack(pack(x, 4), 4)), np.asarray(x))


def test_pack_is_w_major():
    # packed channel δ·C+c must hold original voxel (w = r·wp + δ, c)
    x = np.arange(2 * 8 * 3, dtype=np.float32).reshape(1, 1, 2, 8, 3)
    xp = np.asarray(pack(jnp.asarray(x), 4))       # (1,1,2,2,12)
    for wp in range(2):
        for d in range(4):
            for c in range(3):
                assert xp[0, 0, 1, wp, d * 3 + c] == x[0, 0, 1, 4 * wp + d, c]


@pytest.mark.parametrize("stride,dilation", [(1, 1), (1, 2), (2, 1), (2, 2)])
@pytest.mark.parametrize("r", [2, 4])
def test_packed_conv3_matches_lax(stride, dilation, r):
    rng = np.random.default_rng(1)
    cin, cout, W = 3, 5, 16
    x = jnp.asarray(rng.standard_normal((2, 6, 8, W, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32))
    want = _conv_ref(x, w, stride, dilation)

    lin = standard_layout(r, cin)
    r_out = r if stride == 1 else r // 2
    lout = standard_layout(r_out, cout)
    got = packed_conv(pack(x, r), w, lin, lout, w_in=W, kernel=(3, 3, 3),
                      stride=stride, dilation=dilation)
    got = unpack(got, r_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_packed_conv1_matches_lax(stride):
    rng = np.random.default_rng(2)
    cin, cout, W = 6, 4, 16
    x = jnp.asarray(rng.standard_normal((1, 4, 4, W, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, 1, cin, cout)).astype(np.float32))
    want = _conv_ref(x, w, stride, 1)
    r = 4
    r_out = r if stride == 1 else r // 2
    got = packed_conv(pack(x, r), w, standard_layout(r, cin),
                      standard_layout(r_out, cout), w_in=W, kernel=(1, 1, 1),
                      stride=stride)
    np.testing.assert_allclose(np.asarray(unpack(got, r_out)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_conv_repacking_factor_change():
    # 1³ stride-1 conv that also CHANGES r (repack 2 -> 4): the level-0
    # _pre case (C=48 r=2 input -> C=16 r=8 output) scaled down
    rng = np.random.default_rng(3)
    cin, cout, W = 6, 2, 16
    x = jnp.asarray(rng.standard_normal((1, 4, 4, W, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, 1, cin, cout)).astype(np.float32))
    want = _conv_ref(x, w, 1, 1)
    got = packed_conv(pack(x, 2), w, standard_layout(2, cin),
                      standard_layout(4, cout), w_in=W, kernel=(1, 1, 1))
    np.testing.assert_allclose(np.asarray(unpack(got, 4)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_concat_input_layout():
    # consumer absorbs a packed-concat (non-standard) input layout
    rng = np.random.default_rng(4)
    c1, c2, cout, W, r = 3, 2, 4, 12, 4
    a = jnp.asarray(rng.standard_normal((1, 4, 4, W, c1)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 4, 4, W, c2)).astype(np.float32))
    x = jnp.concatenate([a, b], axis=-1)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, c1 + c2, cout)).astype(np.float32))
    want = _conv_ref(x, w, 1, 1)

    xp = jnp.concatenate([pack(a, r), pack(b, r)], axis=-1)
    lin = concat_layouts([standard_layout(r, c1), standard_layout(r, c2)])
    got = packed_conv(xp, w, lin, standard_layout(r, cout), w_in=W)
    np.testing.assert_allclose(np.asarray(unpack(got, r)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_transpose2x_matches_flax():
    from flax import linen as nn

    rng = np.random.default_rng(5)
    cin, cout, W, r = 3, 4, 8, 2
    x = jnp.asarray(rng.standard_normal((1, 4, 5, W, cin)).astype(np.float32))
    mod = nn.ConvTranspose(cout, kernel_size=(2, 2, 2), strides=(2, 2, 2),
                           padding="VALID", use_bias=False,
                           param_dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    w = params["params"]["kernel"]

    got = packed_transpose2x(pack(x, r), w, standard_layout(r, cin),
                             standard_layout(2 * r, cout))
    np.testing.assert_allclose(np.asarray(unpack(got, 2 * r)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_group_norm_matches_flax():
    from flax import linen as nn

    rng = np.random.default_rng(6)
    c, W, r, groups = 8, 16, 4, 4
    x = jnp.asarray(rng.standard_normal((2, 4, 4, W, c)).astype(np.float32))
    mod = nn.GroupNorm(num_groups=groups, epsilon=1e-6, param_dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape), p.dtype) * 0.1 + 1.0,
        params)
    want = mod.apply(params, x)
    scale = params["params"]["scale"]
    bias = params["params"]["bias"]

    got = packed_group_norm(pack(x, r), scale, bias, groups,
                            standard_layout(r, c))
    np.testing.assert_allclose(np.asarray(unpack(got, r)), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_packed_group_norm_concat_layout():
    from flax import linen as nn

    rng = np.random.default_rng(7)
    c1, c2, W, r = 4, 4, 8, 2
    a = jnp.asarray(rng.standard_normal((1, 3, 3, W, c1)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 3, 3, W, c2)).astype(np.float32))
    x = jnp.concatenate([a, b], axis=-1)
    mod = nn.GroupNorm(num_groups=4, epsilon=1e-6, param_dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)

    xp = jnp.concatenate([pack(a, r), pack(b, r)], axis=-1)
    lay = concat_layouts([standard_layout(r, c1), standard_layout(r, c2)])
    got = packed_group_norm(xp, params["params"]["scale"],
                            params["params"]["bias"], 4, lay)
    # got is packed in the CONCAT layout; gather to the standard δ-major
    # order, then unpack
    std = got[..., lay.index().reshape(-1)]
    std = unpack(std, r)
    np.testing.assert_allclose(np.asarray(std), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_packed_avg_pool_matches_flax(stride):
    from flax import linen as nn

    rng = np.random.default_rng(8)
    c, W, r = 3, 16, 4
    x = jnp.asarray(rng.standard_normal((1, 5, 6, W, c)).astype(np.float32))
    want = nn.avg_pool(x, (3, 3, 3), strides=(stride,) * 3, padding="SAME",
                       count_include_pad=False)
    got = packed_avg_pool3(pack(x, r), standard_layout(r, c), w_in=W,
                           stride=stride)
    r_out = r if stride == 1 else r // 2
    np.testing.assert_allclose(np.asarray(unpack(got, r_out)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_packed_max_pool_matches_flax(stride):
    from flax import linen as nn

    rng = np.random.default_rng(9)
    c, W, r = 3, 8, 4
    x = jnp.asarray(rng.standard_normal((1, 4, 5, W, c)).astype(np.float32))
    want = nn.max_pool(x, (3, 3, 3), strides=(stride,) * 3, padding="SAME")
    got = packed_max_pool3(pack(x, r), standard_layout(r, c), stride=stride)
    r_out = r if stride == 1 else r // 2
    np.testing.assert_allclose(np.asarray(unpack(got, r_out)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_packed_depthwise_matches_lax(stride):
    rng = np.random.default_rng(10)
    c, W, r = 4, 16, 4
    x = jnp.asarray(rng.standard_normal((1, 5, 5, W, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 1, c)).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    want = jax.lax.conv_general_dilated(x, w, (stride,) * 3, "SAME",
                                        dimension_numbers=dn,
                                        feature_group_count=c)
    got = packed_depthwise3(pack(x, r), w, standard_layout(r, c), w_in=W,
                            stride=stride)
    r_out = r if stride == 1 else r // 2
    np.testing.assert_allclose(np.asarray(unpack(got, r_out)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_conv_grad_flows_to_logical_weights():
    rng = np.random.default_rng(11)
    cin, cout, W, r = 3, 4, 8, 2
    x = jnp.asarray(rng.standard_normal((1, 4, 4, W, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32))

    def loss_packed(w):
        y = packed_conv(pack(x, r), w, standard_layout(r, cin),
                        standard_layout(r, cout), w_in=W)
        return jnp.sum(y ** 2)

    def loss_ref(w):
        return jnp.sum(_conv_ref(x, w, 1, 1) ** 2)

    gp = jax.grad(loss_packed)(w)
    gr = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# r == 1 degeneracy (round-3 ADVICE fix): stride-2 ops must clamp r_out to 1
# and fall back to block-level W subsampling.  Reachable whenever a level's
# packing factor bottoms out (e.g. depth 4, or patch W not divisible by 8 —
# odd W then also appears at inner levels).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("W", [16, 15])
@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (2, 2)])
def test_packed_conv3_r1(stride, dilation, W):
    rng = np.random.default_rng(21)
    cin, cout = 3, 5
    x = jnp.asarray(rng.standard_normal((1, 6, 6, W, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32))
    want = _conv_ref(x, w, stride, dilation)
    lin = standard_layout(1, cin)
    lout = standard_layout(1, cout)
    got = packed_conv(pack(x, 1), w, lin, lout, w_in=W, kernel=(3, 3, 3),
                      stride=stride, dilation=dilation)
    np.testing.assert_allclose(np.asarray(unpack(got, 1)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("W", [16, 15])
@pytest.mark.parametrize("stride", [1, 2])
def test_packed_avg_pool_r1(stride, W):
    from flax import linen as nn

    rng = np.random.default_rng(22)
    c = 3
    x = jnp.asarray(rng.standard_normal((1, 5, 6, W, c)).astype(np.float32))
    want = nn.avg_pool(x, (3, 3, 3), strides=(stride,) * 3, padding="SAME",
                       count_include_pad=False)
    got = packed_avg_pool3(pack(x, 1), standard_layout(1, c), w_in=W,
                           stride=stride)
    np.testing.assert_allclose(np.asarray(unpack(got, 1)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("W", [16, 15])
@pytest.mark.parametrize("stride", [1, 2])
def test_packed_max_pool_r1(stride, W):
    from flax import linen as nn

    rng = np.random.default_rng(23)
    c = 3
    x = jnp.asarray(rng.standard_normal((1, 4, 5, W, c)).astype(np.float32))
    want = nn.max_pool(x, (3, 3, 3), strides=(stride,) * 3, padding="SAME")
    got = packed_max_pool3(pack(x, 1), standard_layout(1, c), stride=stride)
    np.testing.assert_allclose(np.asarray(unpack(got, 1)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_packed_depthwise_r1(stride):
    rng = np.random.default_rng(24)
    c, W = 4, 16
    x = jnp.asarray(rng.standard_normal((1, 5, 5, W, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 1, c)).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    want = jax.lax.conv_general_dilated(x, w, (stride,) * 3, "SAME",
                                        dimension_numbers=dn,
                                        feature_group_count=c)
    got = packed_depthwise3(pack(x, 1), w, standard_layout(1, c), w_in=W,
                            stride=stride)
    np.testing.assert_allclose(np.asarray(unpack(got, 1)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_r2_to_r1_stride2():
    # the level transition where r bottoms out: r_in=2 -> r_out=1
    rng = np.random.default_rng(25)
    cin, cout, W = 3, 4, 8
    x = jnp.asarray(rng.standard_normal((1, 6, 6, W, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32))
    want = _conv_ref(x, w, 2, 1)
    got = packed_conv(pack(x, 2), w, standard_layout(2, cin),
                      standard_layout(1, cout), w_in=W, stride=2)
    np.testing.assert_allclose(np.asarray(unpack(got, 1)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["d2", "d2c", "wcat", "3d"])
@pytest.mark.parametrize("stride,dilation", [(1, 1), (1, 2), (2, 1)])
def test_packed_conv_lowering_modes_exact(mode, stride, dilation):
    # every lowering mode computes the same taps with fp32 conv accumulation;
    # tolerances only absorb tap-summation order differences
    rng = np.random.default_rng(31)
    cin, cout, W, r = 3, 5, 16, 4
    x = jnp.asarray(rng.standard_normal((2, 6, 8, W, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32))
    want = _conv_ref(x, w, stride, dilation)
    r_out = r if stride == 1 else r // 2
    got = packed_conv(pack(x, r), w, standard_layout(r, cin),
                      standard_layout(r_out, cout), w_in=W, kernel=(3, 3, 3),
                      stride=stride, dilation=dilation, conv_mode=mode)
    np.testing.assert_allclose(np.asarray(unpack(got, r_out)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_conv_d2c_grads_match_d2():
    rng = np.random.default_rng(32)
    cin, cout, W, r = 4, 4, 16, 4
    x = jnp.asarray(rng.standard_normal((1, 6, 6, W, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32))

    def loss(mode):
        def f(x, w):
            y = packed_conv(pack(x, r), w, standard_layout(r, cin),
                            standard_layout(r, cout), w_in=W,
                            kernel=(3, 3, 3), conv_mode=mode)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1))(x, w)

    gx_a, gw_a = loss("d2")
    gx_b, gw_b = loss("d2c")
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_a),
                               rtol=1e-4, atol=1e-4)


def test_packed_group_norm_dot_stats_matches_xla():
    from nas_3d_unet_tpu.ops import packed as pk

    rng = np.random.default_rng(33)
    c, W, r, groups = 8, 16, 4, 4
    x = jnp.asarray(rng.standard_normal((2, 4, 4, W, c)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1 + 1)
    bias = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)

    def run(xp):
        def f(xp, scale, bias):
            y = packed_group_norm(xp, scale, bias, groups,
                                  standard_layout(r, c), relu=True)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(xp, scale, bias)
        return val, grads

    xp = pack(x, r)
    pk._gn_core.cache_clear()   # impl is baked in at trace time
    pk.set_gn_stats_impl("xla")
    v_a, g_a = run(xp)
    pk._gn_core.cache_clear()
    pk.set_gn_stats_impl("dot")
    try:
        v_b, g_b = run(xp)
    finally:
        pk.set_gn_stats_impl("xla")
        pk._gn_core.cache_clear()
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_a), rtol=1e-5)
    for a, b in zip(g_a, g_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_max_pool_vjp_saves_only_input_residuals():
    """HBM-footprint pin for the shifted-max pools (PERF_NOTES round-4).

    The maximum-chain VJP would naturally save every padded slice and
    partial maximum (~4 extra full-size buffers per stride-1 pool) — at
    128³ supernet scale that OOMed the remat-off bilevel search step on
    a 16 GB chip.  Both pool entry points are jax.checkpoint-wrapped so
    the backward recomputes the cheap slice maxima; this test pins the
    property itself: the only full-size residual is the pool INPUT (plus,
    for the packed variant, O(r²c²) trace-time shift-matrix constants).
    """
    from nas_3d_unet_tpu.ops.packed import max_pool3_shifted
    try:
        from jax._src.ad_checkpoint import saved_residuals
    except ImportError:
        pytest.skip("saved_residuals moved; re-pin against this jaxlib")

    def nbytes(residuals):
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a, _ in residuals)

    x = jnp.zeros((1, 8, 8, 16, 2), jnp.float32)
    for stride in (1, 2):
        res = saved_residuals(lambda x: max_pool3_shifted(x, stride), x)
        assert nbytes(res) <= x.size * x.dtype.itemsize, [
            (a.shape, str(src)) for a, src in res]

    r, c = 4, 2
    lay = standard_layout(r, c)
    xp = pack(x.astype(jnp.bfloat16), r)
    for stride in (1, 2):
        res = saved_residuals(
            lambda xp: packed_max_pool3(xp, lay, stride=stride), xp)
        # input + shift-matrix constants (shape-independent, ~1 KB here)
        assert nbytes(res) <= xp.size * xp.dtype.itemsize + 4096, [
            (a.shape, str(src)) for a, src in res]
        # no f32 promotion: every residual is bf16/bool-sized or smaller
        assert all(a.dtype != jnp.float32 for a, _ in res)
