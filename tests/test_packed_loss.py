"""Packed-head training loss (round 3): the K=3 head stays packed through
Dice+CE (metrics/dice.py _dice_ce_loss_packed), and the custom-VJP packed
GroupNorm must match flax autodiff gradients exactly enough to swap in."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from nas_3d_unet_tpu.metrics.dice import dice_ce_loss
from nas_3d_unet_tpu.models.genotype import default_genotype
from nas_3d_unet_tpu.models.unet import DerivedNet
from nas_3d_unet_tpu.ops.packed import (PX, pack, packed_group_norm,
                                        standard_layout, unpack)


def _nets():
    kw = dict(genotype=default_genotype(2), in_channels=4, num_classes=3,
              base_channels=4, depth=2, n_nodes=2, gn_groups=4, remat=False,
              dtype_name="float32", packed=True)
    return DerivedNet(**kw), DerivedNet(**kw, unpack_head=False)


def test_packed_head_loss_and_grads_match_unpacked():
    net_u, net_p = _nets()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 4)).astype(np.float32))
    y = jnp.asarray((rng.random((2, 16, 16, 16, 3)) > 0.7).astype(np.float32))
    params = net_u.init(jax.random.PRNGKey(0), x)
    params_p = net_p.init(jax.random.PRNGKey(0), x)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    lu, gu = jax.value_and_grad(lambda p: dice_ce_loss(net_u.apply(p, x), y))(params)
    lp, gp = jax.value_and_grad(lambda p: dice_ce_loss(net_p.apply(p, x), y))(params)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gu), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=1e-6)


def test_packed_head_returns_px_and_shape():
    _, net_p = _nets()
    x = jnp.zeros((1, 16, 16, 16, 4), jnp.float32)
    params = net_p.init(jax.random.PRNGKey(0), x)
    out = net_p.apply(params, x)
    assert isinstance(out, PX)
    assert out.unpack().shape == (1, 16, 16, 16, 3)
    assert out.dtype == jnp.float32                # fp32 head contract


def test_packed_gn_custom_vjp_matches_flax_grads():
    rng = np.random.default_rng(1)
    c, W, r, groups = 8, 16, 4, 4
    x = jnp.asarray(rng.standard_normal((2, 4, 4, W, c)).astype(np.float32))
    mod = nn.GroupNorm(num_groups=groups, epsilon=1e-6, param_dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape), p.dtype) * 0.1 + 1.0,
        params)
    scale, bias = params["params"]["scale"], params["params"]["bias"]
    lay = standard_layout(r, c)

    def loss_ref(x, s, b):
        y = mod.apply({"params": {"scale": s, "bias": b}}, x)
        return jnp.sum(jnp.sin(y))

    def loss_pkd(x, s, b):
        y = unpack(packed_group_norm(pack(x, r), s, b, groups, lay), r)
        return jnp.sum(jnp.sin(y))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    gp = jax.grad(loss_pkd, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(gr, gp, ("x", "scale", "bias")):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_packed_gn_custom_vjp_under_remat():
    # the lru_cached core must not leak tracers across traces (regression:
    # jnp constants cached from inside an nn.remat trace)
    rng = np.random.default_rng(2)
    c, W, r, groups = 4, 8, 2, 2
    x = jnp.asarray(rng.standard_normal((1, 4, 4, W, c)).astype(np.float32))
    lay = standard_layout(r, c)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    @jax.jit
    def f(x):
        def inner(x):
            return jnp.sum(packed_group_norm(pack(x, r), scale, bias,
                                             groups, lay) ** 2)
        return jax.grad(jax.checkpoint(inner))(x)

    g1 = f(x)

    @jax.jit  # second, distinct trace reusing the cached core
    def f2(x):
        return jax.grad(lambda x: jnp.sum(packed_group_norm(
            pack(x, r), scale, bias, groups, lay) ** 2))(x)

    g2 = f2(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)
