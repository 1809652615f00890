"""Packed-execution model equivalence: DerivedNet/SuperNet with packed=True
must (a) expose the IDENTICAL param tree and (b) reproduce the unpacked
forward to fp32 tolerance, with gradients flowing to the same params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nas_3d_unet_tpu.models.genotype import default_genotype
from nas_3d_unet_tpu.models.unet import DerivedNet, SuperNet, arch_weights_from_alphas


def _tree_paths(tree):
    return {jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _derived(packed, merge_ops=True, **kw):
    kwargs = dict(genotype=default_genotype(2), in_channels=4, num_classes=3,
                  base_channels=4, depth=2, n_nodes=2, gn_groups=4,
                  norm="group", remat=False, dtype_name="float32",
                  packed=packed, merge_ops=merge_ops)
    kwargs.update(kw)
    return DerivedNet(**kwargs)


def test_derived_packed_param_tree_identical():
    x = jnp.zeros((1, 16, 16, 16, 4), jnp.float32)
    p_ref = _derived(False).init(jax.random.PRNGKey(0), x)
    p_pkd = _derived(True).init(jax.random.PRNGKey(0), x)
    assert _tree_paths(p_ref) == _tree_paths(p_pkd)
    # same name-derived RNG streams -> identical values too
    ref = {jax.tree_util.keystr(p): v
           for p, v in jax.tree_util.tree_leaves_with_path(p_ref)}
    pkd = {jax.tree_util.keystr(p): v
           for p, v in jax.tree_util.tree_leaves_with_path(p_pkd)}
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(pkd[k]),
                                      err_msg=k)


@pytest.mark.parametrize("merge_ops", [False, True])
def test_derived_packed_forward_matches(merge_ops):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 4)).astype(np.float32))
    net_ref = _derived(False, merge_ops=merge_ops)
    net_pkd = _derived(True, merge_ops=merge_ops)
    params = net_ref.init(jax.random.PRNGKey(1), x)
    want = net_ref.apply(params, x)
    got = net_pkd.apply(params, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_derived_packed_all_ops_forward():
    # genotype touching every op family: pools, identity, dilated, separable,
    # up_conv3 (trilinear resize) and transpose
    from nas_3d_unet_tpu.models.genotype import Genotype
    gene_down = ((("in0", "down_avg_pool"), ("in1", "down_dil_conv3")),
                 (("in1", "down_max_pool"), ("n0", "sep_conv3")))
    gene_up = ((("below", "up_conv3"), ("skip", "avg_pool3")),
               (("skip", "identity"), ("n0", "max_pool3")))
    geno = Genotype(n_nodes=2, down=gene_down, up=gene_up)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32))
    kw = dict(genotype=geno, in_channels=4, num_classes=3, base_channels=4,
              depth=2, n_nodes=2, gn_groups=4, norm="group", remat=False,
              dtype_name="float32")
    net_ref = DerivedNet(packed=False, **kw)
    net_pkd = DerivedNet(packed=True, **kw)
    params = net_ref.init(jax.random.PRNGKey(3), x)
    want = net_ref.apply(params, x)
    got = net_pkd.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_derived_packed_grads_match():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 3)).astype(np.float32))
    net_ref = _derived(False)
    net_pkd = _derived(True)
    params = net_ref.init(jax.random.PRNGKey(5), x)

    def loss(net):
        def f(p):
            out = net.apply(p, x)
            return jnp.mean((out - y) ** 2)
        return f

    g_ref = jax.grad(loss(net_ref))(params)
    g_pkd = jax.grad(loss(net_pkd))(params)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_p = dict((jax.tree_util.keystr(p), v)
                  for p, v in jax.tree_util.tree_leaves_with_path(g_pkd))
    for p, v in flat_r:
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(np.asarray(flat_p[key]), np.asarray(v),
                                   rtol=5e-3, atol=1e-4, err_msg=key)


def test_derived_packed_remat_bf16_runs():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32))
    net = _derived(True, remat=True, dtype_name="bfloat16")
    params = net.init(jax.random.PRNGKey(7), x)

    @jax.jit
    def f(p):
        return jnp.sum(net.apply(p, x).astype(jnp.float32))

    v, g = jax.value_and_grad(f)(params)
    assert np.isfinite(float(v))
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))


@pytest.mark.parametrize("merge_ops", [False, True])
def test_supernet_packed_forward_matches(merge_ops):
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32))
    kw = dict(in_channels=4, num_classes=3, base_channels=4, depth=2,
              n_nodes=2, gn_groups=4, norm="group", remat=False,
              dtype_name="float32", merge_ops=merge_ops)
    net_ref = SuperNet(packed=False, **kw)
    net_pkd = SuperNet(packed=True, **kw)

    from nas_3d_unet_tpu.search.bilevel import init_alphas
    alphas = init_alphas(jax.random.PRNGKey(9), 2)
    aw = arch_weights_from_alphas(alphas)
    params = net_ref.init(jax.random.PRNGKey(10), x, aw)
    want = net_ref.apply(params, x, aw)
    got = net_pkd.apply(params, x, aw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_supernet_packed_param_tree_identical():
    from nas_3d_unet_tpu.search.bilevel import init_alphas
    x = jnp.zeros((1, 16, 16, 16, 4), jnp.float32)
    aw = arch_weights_from_alphas(init_alphas(jax.random.PRNGKey(0), 2))
    kw = dict(in_channels=4, num_classes=3, base_channels=4, depth=2,
              n_nodes=2, gn_groups=4, norm="group", remat=False,
              dtype_name="float32")
    p_ref = SuperNet(packed=False, **kw).init(jax.random.PRNGKey(1), x, aw)
    p_pkd = SuperNet(packed=True, **kw).init(jax.random.PRNGKey(1), x, aw)
    assert _tree_paths(p_ref) == _tree_paths(p_pkd)


def test_derived_packed_depth4_r_bottoms_out():
    # depth 4 at 32-cubed: the deepest levels reach packing factor r=1, so
    # stride-2 packed ops must take the degenerate (block-subsample) branch
    # instead of dividing r to 0 (round-3 ADVICE crash repro)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 4)).astype(np.float32))
    net_ref = _derived(False, depth=4, genotype=default_genotype(2))
    net_pkd = _derived(True, depth=4, genotype=default_genotype(2))
    params = net_pkd.init(jax.random.PRNGKey(2), x)     # used to crash here
    want = net_ref.apply(params, x)
    got = net_pkd.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_derived_packed_odd_w_patch():
    # patch W=20: level-2 W=5 is odd with r=1 — exercises the pad-parity
    # branch of the stride-2 pools and convs
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 20, 20, 20, 4)).astype(np.float32))
    net_ref = _derived(False)
    net_pkd = _derived(True)
    params = net_pkd.init(jax.random.PRNGKey(3), x)
    want = net_ref.apply(params, x)
    got = net_pkd.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
