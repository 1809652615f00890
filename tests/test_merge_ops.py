"""Graph-level op merging in derived cells: exact-equivalence and wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from nas_3d_unet_tpu.models.cell import DerivedDownCell, _MERGEABLE
from nas_3d_unet_tpu.models.genotype import Genotype
from nas_3d_unet_tpu.models.unet import DerivedNet
from nas_3d_unet_tpu.ops.primitives import ConvNormAct
from nas_3d_unet_tpu.utils.params import count_params


def _merge_gene():
    """Down-cell gene where two edges share (in1, down_conv3) → mergeable."""
    return Genotype(
        n_nodes=2,
        down=((("in0", "down_conv3"), ("in1", "down_conv3")),
              (("in1", "down_conv3"), ("n0", "conv3"))),
        up=((("below", "up_transpose"), ("skip", "conv3")),
            (("below", "up_transpose"), ("n0", "conv3"))),
    )


def test_merged_conv_norm_act_is_exactly_two_stacked():
    """A 2C-wide ConvNormAct with concatenated kernels/scales and 2× GN groups
    equals the channel-concat of two independent C-wide ones."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 8, 8, 8, 8))
    c, g = 8, 4

    op_a = ConvNormAct(c, 3, 1, 1, 1, "group", g)
    op_b = ConvNormAct(c, 3, 1, 1, 1, "group", g)
    pa = op_a.init(jax.random.PRNGKey(1), x)
    pb = op_b.init(jax.random.PRNGKey(2), x)

    merged = ConvNormAct(2 * c, 3, 1, 1, 1, "group", 2 * g)
    pm = merged.init(jax.random.PRNGKey(3), x)
    pm = jax.tree_util.tree_map(lambda l: l, pm)  # copy
    pm["params"]["conv"]["kernel"] = jnp.concatenate(
        [pa["params"]["conv"]["kernel"], pb["params"]["conv"]["kernel"]], axis=-1)
    pm["params"]["norm"]["scale"] = jnp.concatenate(
        [pa["params"]["norm"]["scale"], pb["params"]["norm"]["scale"]])
    pm["params"]["norm"]["bias"] = jnp.concatenate(
        [pa["params"]["norm"]["bias"], pb["params"]["norm"]["bias"]])

    ya = op_a.apply(pa, x)
    yb = op_b.apply(pb, x)
    ym = merged.apply(pm, x)
    np.testing.assert_allclose(np.asarray(ym),
                               np.asarray(jnp.concatenate([ya, yb], axis=-1)),
                               atol=1e-5, rtol=1e-5)


def test_sep_conv_not_mergeable():
    assert "sep_conv3" not in _MERGEABLE and "down_sep_conv3" not in _MERGEABLE


def test_merged_cell_param_count_matches_unmerged():
    g = _merge_gene()
    x0 = jnp.zeros((1, 8, 8, 8, 12))
    kw = dict(features=8, n_nodes=2, gn_groups=4, dtype=jnp.float32)
    cell_m = DerivedDownCell(gene=g.down, merge_ops=True, **kw)
    cell_u = DerivedDownCell(gene=g.down, merge_ops=False, **kw)
    pm = cell_m.init(jax.random.PRNGKey(0), x0, x0)
    pu = cell_u.init(jax.random.PRNGKey(0), x0, x0)
    assert count_params(pm) == count_params(pu)
    ym = cell_m.apply(pm, x0, x0)
    yu = cell_u.apply(pu, x0, x0)
    assert ym.shape == yu.shape


def test_derived_net_merge_runs_and_trains():
    g = _merge_gene()
    net = DerivedNet(genotype=g, in_channels=4, num_classes=3, base_channels=4,
                     depth=2, n_nodes=2, gn_groups=4, remat=False,
                     dtype_name="float32", merge_ops=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16, 4))
    params = net.init(jax.random.PRNGKey(1), x)
    y = net.apply(params, x)
    assert y.shape == (1, 16, 16, 16, 3)
    grads = jax.grad(lambda p: jnp.sum(net.apply(p, x) ** 2))(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0
