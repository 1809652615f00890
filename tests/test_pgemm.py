"""Exactness tests for the shift-GEMM Pallas conv (ops/pallas/pgemm.py).

Run in Pallas interpret mode on CPU (NAS3D_PG_INTERPRET): same math as the
compiled TPU kernel, minus Mosaic.  The kernel must match the logical lax
conv (fwd) and the d2 lowering's autodiff (dx, dW) to fp32-accumulation
tolerance — it is a re-lowering, not an approximation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nas_3d_unet_tpu.ops.packed import pack, packed_conv, standard_layout, unpack


def _conv_ref(x, w, stride, dilation):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, "SAME", rhs_dilation=(dilation,) * 3,
        dimension_numbers=dn)


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    monkeypatch.setenv("NAS3D_PG_INTERPRET", "1")


def _run_pg(x, w, r, cin, cout, dilation=1):
    W = x.shape[3]
    y = packed_conv(pack(x, r), w, standard_layout(r, cin),
                    standard_layout(r, cout), w_in=W, kernel=(3, 3, 3),
                    stride=1, dilation=dilation, conv_mode="pg")
    return unpack(y, r)


@pytest.mark.parametrize("r,wdim", [(2, 16), (4, 32), (8, 64)])
@pytest.mark.parametrize("dilation", [1, 2])
def test_pgemm_fwd_matches_lax(r, wdim, dilation):
    rng = np.random.default_rng(7)
    cin, cout = 3, 5
    x = jnp.asarray(rng.standard_normal((2, 5, 8, wdim, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32))
    got = _run_pg(x, w, r, cin, cout, dilation)
    want = _conv_ref(x, w, 1, dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pgemm_grads_match_d2():
    rng = np.random.default_rng(8)
    cin = cout = 4
    r, wdim = 4, 32
    x = jnp.asarray(rng.standard_normal((1, 4, 8, wdim, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32))

    def loss(mode):
        def f(x, w):
            y = packed_conv(pack(x, r), w, standard_layout(r, cin),
                            standard_layout(r, cout), w_in=wdim,
                            kernel=(3, 3, 3), conv_mode=mode)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.value_and_grad(f, argnums=(0, 1))(x, w)

    v_a, (gx_a, gw_a) = loss("d2")
    v_b, (gx_b, gw_b) = loss("pg")
    np.testing.assert_allclose(float(v_b), float(v_a), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_a),
                               rtol=1e-4, atol=1e-4)


def test_pgemm_dilated_grads_match_d2():
    rng = np.random.default_rng(9)
    cin = cout = 3
    r, wdim = 2, 16
    x = jnp.asarray(rng.standard_normal((2, 4, 8, wdim, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32))

    def grads(mode):
        def f(x, w):
            y = packed_conv(pack(x, r), w, standard_layout(r, cin),
                            standard_layout(r, cout), w_in=wdim,
                            kernel=(3, 3, 3), dilation=2, conv_mode=mode)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1))(x, w)

    gx_a, gw_a = grads("d2")
    gx_b, gw_b = grads("pg")
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_a),
                               rtol=1e-4, atol=1e-4)


def test_pgemm_fallbacks():
    # stride-2 and r=1 are outside the kernel's gate: conv_mode="pg" must
    # still be correct by falling back to d2
    rng = np.random.default_rng(10)
    cin, cout, W, r = 3, 4, 16, 2
    x = jnp.asarray(rng.standard_normal((1, 4, 6, W, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32))
    y = packed_conv(pack(x, r), w, standard_layout(r, cin),
                    standard_layout(1, cout), w_in=W, kernel=(3, 3, 3),
                    stride=2, conv_mode="pg")
    want = _conv_ref(x, w, 2, 1)
    np.testing.assert_allclose(np.asarray(unpack(y, 1)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
