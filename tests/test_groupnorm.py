"""Fused GroupNorm vs flax/XLA reference: values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from nas_3d_unet_tpu.ops.pallas.groupnorm import (
    _fusable,
    group_norm,
    group_norm_reference,
)


def _data(shape=(2, 4, 4, 8, 16), c=None, seed=0):
    c = shape[-1]
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    return x, gamma, beta


def test_reference_matches_flax():
    x, gamma, beta = _data()
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-6)
    params = {"params": {"scale": gamma, "bias": beta}}
    want = gn.apply(params, x)
    got = group_norm_reference(x, gamma, beta, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("c,groups", [(16, 4), (32, 8), (128, 8), (8, 8)])
@pytest.mark.parametrize("relu", [False, True])
def test_fused_matches_reference_interpret(c, groups, relu):
    x, gamma, beta = _data(shape=(2, 4, 4, 8, c))
    assert _fusable(x.shape, groups) is not None
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = group_norm(x, gamma, beta, groups, 1e-6, relu)
    want = group_norm_reference(x, gamma, beta, groups, 1e-6, relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("relu", [False, True])
def test_fused_grads_match_reference(relu):
    x, gamma, beta = _data(shape=(1, 4, 4, 8, 16))
    from jax.experimental.pallas import tpu as pltpu

    def loss_fused(x, gamma, beta):
        y = group_norm(x, gamma, beta, 4, 1e-6, relu)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size, dtype=jnp.float32)).reshape(y.shape))

    def loss_ref(x, gamma, beta):
        y = group_norm_reference(x, gamma, beta, 4, 1e-6, relu)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size, dtype=jnp.float32)).reshape(y.shape))

    with pltpu.force_tpu_interpret_mode():  # bwd kernels trace under grad
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_fallback_for_unfusable_channels():
    # C=48 does not divide 128 → reference path (still correct + differentiable)
    x, gamma, beta = _data(shape=(1, 2, 4, 4, 48))
    assert _fusable(x.shape, 8) is None
    got = group_norm(x, gamma, beta, 8)
    want = group_norm_reference(x, gamma, beta, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    g = jax.grad(lambda x: jnp.sum(group_norm(x, gamma, beta, 8) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_bf16_path():
    x, gamma, beta = _data(shape=(1, 4, 4, 8, 32))
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = group_norm(x.astype(jnp.bfloat16), gamma, beta, 8)
    want = group_norm_reference(x.astype(jnp.bfloat16), gamma, beta, 8)
    np.testing.assert_allclose(np.asarray(got.astype(jnp.float32)),
                               np.asarray(want.astype(jnp.float32)),
                               atol=3e-2, rtol=3e-2)
    assert got.dtype == jnp.bfloat16
