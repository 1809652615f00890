"""Pallas kernels vs lax oracles (interpret mode on CPU, SURVEY.md §4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from nas_3d_unet_tpu.ops.pallas.conv3d import (
    _same_pad,
    conv3d,
    conv3d_reference,
    conv_transpose2x,
    pointwise_conv,
)


def _rand(shape, seed, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape).astype(dtype))


@pytest.mark.parametrize("stride,dil", [(1, 1), (2, 1), (1, 2), (2, 2)])
@pytest.mark.parametrize("shape,cin,cout", [
    ((1, 8, 8, 8), 4, 8),
    ((2, 6, 10, 12), 8, 16),
    ((1, 5, 7, 9), 3, 5),      # odd sizes, unaligned channels
])
def test_conv3d_matches_lax(stride, dil, shape, cin, cout):
    x = _rand((*shape, cin), 0)
    w = _rand((3, 3, 3, cin, cout), 1) * 0.1
    b = _rand((cout,), 2) * 0.1
    got = conv3d(x, w, b, stride, dil, True, interpret=True)
    want = conv3d_reference(x, w, b, stride, dil, True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_conv3d_no_bias_no_relu():
    x = _rand((1, 6, 6, 6, 4), 0)
    w = _rand((3, 3, 3, 4, 8), 1) * 0.1
    got = conv3d(x, w, None, 1, 1, False, interpret=True)
    want = conv3d_reference(x, w, None, 1, 1, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_conv3d_grads_match_lax():
    x = _rand((1, 6, 6, 6, 4), 0)
    w = _rand((3, 3, 3, 4, 6), 1) * 0.1
    b = _rand((6,), 2) * 0.1

    def loss_pallas(x, w, b):
        return jnp.sum(conv3d(x, w, b, 2, 1, True, interpret=True) ** 2)

    def loss_lax(x, w, b):
        return jnp.sum(conv3d_reference(x, w, b, 2, 1, True) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    gl = jax.grad(loss_lax, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gp, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-4, rtol=5e-4)


def test_pointwise_matches_lax():
    x = _rand((2, 4, 6, 8, 16), 0)
    w = _rand((16, 32), 1) * 0.1
    b = _rand((32,), 2) * 0.1
    with pltpu.force_tpu_interpret_mode():
        got = pointwise_conv(x, w, b, relu=True)
    want = jnp.maximum(jnp.einsum("bdhwc,ck->bdhwk", x, w) + b, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_conv_transpose2x_matches_lax():
    x = _rand((1, 4, 5, 6, 8), 0)
    w = _rand((2, 2, 2, 8, 4), 1) * 0.1  # flax DHWIO layout
    want = jax.lax.conv_transpose(
        x, w, strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    with pltpu.force_tpu_interpret_mode():
        got = conv_transpose2x(x, w)
    assert got.shape == want.shape == (1, 8, 10, 12, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_same_pad_matches_xla():
    for size in (5, 6, 7, 8, 16):
        for stride in (1, 2):
            for dil in (1, 2):
                lo, hi = _same_pad(size, stride, 3, dil)
                out = -(-size // stride)
                eff = 2 * dil + 1
                assert (out - 1) * stride + eff <= size + lo + hi
