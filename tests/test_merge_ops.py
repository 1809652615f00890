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


# ---------------------------------------------------------------------------
# Supernet source-major merging (merge_ops=True on SuperDownCell/SuperUpCell)
# ---------------------------------------------------------------------------

def _map_super_down_params(pu, pm):
    """Rebuild merged-cell params from the per-edge MixedOp params.

    Unmerged MixedOp order for n_nodes=2: node0 ← (M0: in0, M1: in1);
    node1 ← (M2: in0, M3: in1, M4: n0).  Merged wide ops concatenate the
    per-edge kernels over the output-channel axis in target-node order.
    """
    u = pu["params"]
    m = jax.tree_util.tree_map(lambda x: x, pm["params"])  # copy

    # the two _pre projection convs are positionally identical in both trees
    m["ConvNormAct_0"] = u["ConvNormAct_0"]
    m["ConvNormAct_1"] = u["ConvNormAct_1"]

    # wide convs inside each src_* remat unit: ConvNormAct_0 = (down_)conv3,
    # ConvNormAct_1 = (down_)dil_conv3; concat per-edge kernels/scales over
    # the output-channel axis in target-node order
    for dst, (ma, mb) in (
        ("src_in0", ("CheckpointMixedOp_0", "CheckpointMixedOp_2")),
        ("src_in1", ("CheckpointMixedOp_1", "CheckpointMixedOp_3")),
    ):
        for cna in ("ConvNormAct_0", "ConvNormAct_1"):
            m[dst][cna]["conv"]["kernel"] = jnp.concatenate(
                [u[ma][cna]["conv"]["kernel"], u[mb][cna]["conv"]["kernel"]], axis=-1)
            for name in ("scale", "bias"):
                m[dst][cna]["norm"][name] = jnp.concatenate(
                    [u[ma][cna]["norm"][name], u[mb][cna]["norm"][name]])
        # per-edge separable convs: SepConv_<e> in target order
        m[dst]["SepConv_0"] = u[ma]["SepConv_0"]
        m[dst]["SepConv_1"] = u[mb]["SepConv_0"]
    # k=1 source n0 (mid edge to node 1)
    for cna in ("ConvNormAct_0", "ConvNormAct_1"):
        m["src_n0"][cna] = u["CheckpointMixedOp_4"][cna]
    m["src_n0"]["SepConv_0"] = u["CheckpointMixedOp_4"]["SepConv_0"]
    return {"params": m}


def test_super_down_cell_merged_is_exactly_per_edge():
    """merge_ops=True produces bitwise-equivalent math to per-edge MixedOps
    when fed the concatenation of the per-edge parameters."""
    from nas_3d_unet_tpu.models.cell import SuperDownCell

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 12)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 12)), jnp.float32)
    w_in = jnp.asarray(rng.random((4, 5)), jnp.float32)
    w_mid = jnp.asarray(rng.random((1, 7)), jnp.float32)
    kw = dict(features=8, n_nodes=2, gn_groups=4, dtype=jnp.float32)
    cm = SuperDownCell(merge_ops=True, **kw)
    cu = SuperDownCell(merge_ops=False, **kw)
    pm = cm.init(jax.random.PRNGKey(0), x0, x1, w_in, w_mid)
    pu = cu.init(jax.random.PRNGKey(1), x0, x1, w_in, w_mid)
    pm2 = _map_super_down_params(pu, pm)
    ym = cm.apply(pm2, x0, x1, w_in, w_mid)
    yu = cu.apply(pu, x0, x1, w_in, w_mid)
    np.testing.assert_allclose(np.asarray(ym), np.asarray(yu),
                               atol=1e-5, rtol=1e-5)


def test_supernet_merged_param_count_and_alpha_grads():
    from nas_3d_unet_tpu.models.genotype import init_alphas
    from nas_3d_unet_tpu.models.unet import SuperNet, arch_weights_from_alphas

    alphas = init_alphas(jax.random.PRNGKey(0), 2)
    w = arch_weights_from_alphas(alphas)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 16, 4))
    kw = dict(in_channels=4, num_classes=3, base_channels=4, depth=2, n_nodes=2,
              gn_groups=4, remat=False, dtype_name="float32")
    net_m = SuperNet(merge_ops=True, **kw)
    net_u = SuperNet(merge_ops=False, **kw)
    pm = net_m.init(jax.random.PRNGKey(2), x, w)
    pu = net_u.init(jax.random.PRNGKey(2), x, w)
    assert count_params(pm) == count_params(pu)
    assert net_m.apply(pm, x, w).shape == (1, 16, 16, 16, 3)
    # every alpha row must receive gradient through the merged graph
    g = jax.grad(lambda a: jnp.sum(
        net_m.apply(pm, x, arch_weights_from_alphas(a)) ** 2))(alphas)
    for name, v in g.items():
        rows_hit = np.sum(np.abs(np.asarray(v)).sum(-1) > 0)
        assert rows_hit == v.shape[0], (name, rows_hit, v.shape)
