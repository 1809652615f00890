"""Model shape/param tests: supernet + derived net, genotype parse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nas_3d_unet_tpu.models.genotype import (
    Genotype,
    alpha_shapes,
    init_alphas,
    parse_alphas,
)
from nas_3d_unet_tpu.models.unet import (
    DerivedNet,
    SuperNet,
    arch_weights_from_alphas,
)
from nas_3d_unet_tpu.ops.primitives import DOWN_OPS, NORMAL_OPS, UP_OPS, make_op


def tiny_supernet(**kw):
    base = dict(in_channels=4, num_classes=3, base_channels=4, depth=2,
                n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")
    base.update(kw)
    return SuperNet(**base)


def tiny_derived(genotype, **kw):
    base = dict(in_channels=4, num_classes=3, base_channels=4, depth=2,
                n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")
    base.update(kw)
    return DerivedNet(genotype=genotype, **base)


def test_ops_shapes():
    x = jnp.zeros((1, 8, 8, 8, 4))
    rng = jax.random.PRNGKey(0)
    for name in NORMAL_OPS:
        op = make_op(name, 4, gn_groups=4)
        y, _ = jax.jit(lambda: op.init_with_output(rng, x))()
        assert y.shape == x.shape, name
    for name in DOWN_OPS:
        op = make_op(name, 4, gn_groups=4)
        y, _ = op.init_with_output(rng, x)
        assert y.shape == (1, 4, 4, 4, 4), name
    for name in UP_OPS:
        op = make_op(name, 4, gn_groups=4)
        y, _ = op.init_with_output(rng, x)
        assert y.shape == (1, 16, 16, 16, 4), name


def test_alpha_shapes_and_parse():
    rng = jax.random.PRNGKey(0)
    alphas = init_alphas(rng, n_nodes=3)
    for name, shape in alpha_shapes(3).items():
        assert alphas[name].shape == shape
    g = parse_alphas(alphas, n_nodes=3)
    g.validate()
    # json round trip
    g2 = Genotype.from_json(g.to_json())
    assert g2 == g


def test_parse_respects_alpha_preferences():
    alphas = init_alphas(jax.random.PRNGKey(0), n_nodes=2)
    # bias node-0 input edges: in0 → down_conv3 strongly
    a = {k: np.array(v) for k, v in alphas.items()}
    a["down_in"][0, :] = -5.0
    a["down_in"][0, DOWN_OPS.index("down_conv3")] = 5.0
    g = parse_alphas({k: jnp.asarray(v) for k, v in a.items()}, n_nodes=2)
    assert ("in0", "down_conv3") in g.down[0]


def test_supernet_forward_shape():
    net = tiny_supernet()
    alphas = init_alphas(jax.random.PRNGKey(0), n_nodes=2)
    w = arch_weights_from_alphas(alphas)
    x = jnp.zeros((2, 16, 16, 16, 4))
    params = net.init(jax.random.PRNGKey(1), x, w)
    y = net.apply(params, x, w)
    assert y.shape == (2, 16, 16, 16, 3)
    assert y.dtype == jnp.float32


def test_supernet_grad_flows_to_alphas():
    net = tiny_supernet()
    alphas = init_alphas(jax.random.PRNGKey(0), n_nodes=2)
    x = jnp.ones((1, 8, 8, 8, 4))
    params = net.init(jax.random.PRNGKey(1), x, arch_weights_from_alphas(alphas))

    def loss(a):
        return jnp.sum(net.apply(params, x, arch_weights_from_alphas(a)) ** 2)

    grads = jax.grad(loss)(alphas)
    total = sum(float(jnp.abs(g).sum()) for g in grads.values())
    assert np.isfinite(total) and total > 0


def test_derived_forward_shape_and_odd_sizes():
    alphas = init_alphas(jax.random.PRNGKey(0), n_nodes=2)
    g = parse_alphas(alphas, n_nodes=2)
    net = tiny_derived(g)
    x = jnp.zeros((1, 16, 16, 16, 4))
    params = net.init(jax.random.PRNGKey(1), x)
    y = net.apply(params, x)
    assert y.shape == (1, 16, 16, 16, 3)


def test_derived_bf16_activations_fp32_params():
    alphas = init_alphas(jax.random.PRNGKey(0), n_nodes=2)
    g = parse_alphas(alphas, n_nodes=2)
    net = tiny_derived(g, dtype_name="bfloat16")
    x = jnp.zeros((1, 8, 8, 8, 4))
    params = net.init(jax.random.PRNGKey(1), x)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    y = net.apply(params, x)
    assert y.dtype == jnp.float32  # head is fp32


def test_supernet_remat_matches_noremat():
    alphas = init_alphas(jax.random.PRNGKey(0), n_nodes=2)
    w = arch_weights_from_alphas(alphas)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8, 4))
    net_a = tiny_supernet(remat=False)
    net_b = tiny_supernet(remat=True)
    params = net_a.init(jax.random.PRNGKey(1), x, w)
    ya = net_a.apply(params, x, w)
    yb = net_b.apply(params, x, w)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-6)


def test_remat_edges_knob_config_to_supernet():
    # model.remat_edges decouples supernet edge remat from cell remat
    # (config -> make_supernet -> apply); param tree must not depend on it
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nas_3d_unet_tpu.models.genotype import init_alphas
    from nas_3d_unet_tpu.models.unet import arch_weights_from_alphas, make_supernet
    from nas_3d_unet_tpu.utils import load_config

    ov = {"model.base_channels": 4, "model.depth": 2, "model.n_nodes": 2,
          "model.gn_groups": 4, "model.dtype": "float32", "model.remat": True}
    aw = arch_weights_from_alphas(init_alphas(jax.random.PRNGKey(0), 2))
    x = jnp.zeros((1, 16, 16, 16, 4))
    outs, trees = [], []
    for redges in (None, False):
        cfg = load_config(None, overrides={**ov, "model.remat_edges": redges})
        net = make_supernet(cfg.model, 3)
        p = net.init(jax.random.PRNGKey(1), x, aw)
        trees.append(jax.tree_util.tree_structure(p))
        outs.append(np.asarray(net.apply(p, x, aw)))
    assert trees[0] == trees[1]
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
