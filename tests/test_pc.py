"""Partial-channel (PC-DARTS-style) supernet evaluation.

`search.partial_channels = K > 1` routes only C/K of each edge's channels
through the candidate ops; the rest bypass (resolution-matched on down/up
edges) and a channel shuffle remixes groups (models/cell.py).  Pins:

  * the packed shuffle is a pure layout-metadata permutation that unpacks
    to exactly the unpacked shuffle;
  * packed and unpacked pc supernets share the param tree and match
    forward to fp32 tolerance (the same contract as pc_k=1);
  * source-major merging stays exactly equivalent to the per-edge MixedOp
    chain at pc_k>1 (the round-2 equivalence oracle, extended);
  * every alpha row still receives gradient, and the supernet shrinks;
  * the Searcher runs end-to-end with partial_channels=2 and emits a
    valid genotype (same parse as full-channel DARTS).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nas_3d_unet_tpu.models.cell import SuperDownCell, _pc_shuffle
from nas_3d_unet_tpu.models.genotype import Genotype, init_alphas
from nas_3d_unet_tpu.models.unet import SuperNet, arch_weights_from_alphas
from nas_3d_unet_tpu.ops.packed import PX
from nas_3d_unet_tpu.utils.params import count_params

KW = dict(in_channels=4, num_classes=3, base_channels=8, depth=2, n_nodes=2,
          gn_groups=4, norm="group", remat=False, dtype_name="float32")


def _tree_paths(tree):
    return {jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_packed_shuffle_is_metadata_only_and_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8, 6)).astype(np.float32))
    k = 3
    want = _pc_shuffle(x, k)                      # unpacked reference
    px = PX.pack(x, 2)
    got = _pc_shuffle(px, k)
    assert got.data is px.data                    # zero data movement
    np.testing.assert_array_equal(np.asarray(got.unpack()), np.asarray(want))


def test_pc_supernet_packed_matches_unpacked():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32))
    alphas = init_alphas(jax.random.PRNGKey(1), 2)
    aw = arch_weights_from_alphas(alphas)
    net_u = SuperNet(pc_k=2, packed=False, merge_ops=True, **KW)
    net_p = SuperNet(pc_k=2, packed=True, merge_ops=True, **KW)
    params = net_u.init(jax.random.PRNGKey(2), x, aw)
    assert _tree_paths(params) == _tree_paths(
        net_p.init(jax.random.PRNGKey(2), x, aw))
    want = net_u.apply(params, x, aw)
    got = net_p.apply(params, x, aw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pc_super_down_cell_merged_is_exactly_per_edge():
    """Source-major merging oracle at pc_k=2 (same param mapping as the
    pc_k=1 test — only the op feature widths change)."""
    from tests.test_merge_ops import _map_super_down_params

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 12)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 12)), jnp.float32)
    w_in = jnp.asarray(rng.random((4, 5)), jnp.float32)
    w_mid = jnp.asarray(rng.random((1, 7)), jnp.float32)
    kw = dict(features=8, n_nodes=2, gn_groups=4, dtype=jnp.float32, pc_k=2)
    cm = SuperDownCell(merge_ops=True, **kw)
    cu = SuperDownCell(merge_ops=False, **kw)
    pm = cm.init(jax.random.PRNGKey(0), x0, x1, w_in, w_mid)
    pu = cu.init(jax.random.PRNGKey(1), x0, x1, w_in, w_mid)
    pm2 = _map_super_down_params(pu, pm)
    ym = cm.apply(pm2, x0, x1, w_in, w_mid)
    yu = cu.apply(pu, x0, x1, w_in, w_mid)
    np.testing.assert_allclose(np.asarray(ym), np.asarray(yu),
                               atol=1e-5, rtol=1e-5)


def test_pc_alpha_grads_cover_every_row_and_model_shrinks():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 16, 4))
    alphas = init_alphas(jax.random.PRNGKey(0), 2)
    aw = arch_weights_from_alphas(alphas)
    net_pc = SuperNet(pc_k=2, merge_ops=True, **KW)
    net_full = SuperNet(pc_k=1, merge_ops=True, **KW)
    p_pc = net_pc.init(jax.random.PRNGKey(2), x, aw)
    p_full = net_full.init(jax.random.PRNGKey(2), x, aw)
    # candidate ops run at C/2: the supernet must be strictly smaller
    assert count_params(p_pc) < count_params(p_full)
    assert net_pc.apply(p_pc, x, aw).shape == (1, 16, 16, 16, 3)
    g = jax.grad(lambda a: jnp.sum(
        net_pc.apply(p_pc, x, arch_weights_from_alphas(a)) ** 2))(alphas)
    for name, v in g.items():
        rows_hit = np.sum(np.abs(np.asarray(v)).sum(-1) > 0)
        assert rows_hit == v.shape[0], (name, rows_hit, v.shape)


def test_pc_requires_divisibility():
    x = jnp.zeros((1, 16, 16, 16, 4))
    aw = arch_weights_from_alphas(init_alphas(jax.random.PRNGKey(0), 2))
    with pytest.raises(ValueError, match="partial_channels"):
        SuperNet(pc_k=3, **KW).init(jax.random.PRNGKey(1), x, aw)


def test_searcher_partial_channels_end_to_end(tmp_path):
    from tests.helpers import write_synthetic_h5
    from nas_3d_unet_tpu.search.bilevel import Searcher
    from nas_3d_unet_tpu.utils.config import load_config

    paths = write_synthetic_h5(str(tmp_path / "h5"), n_patients=3)
    cfg = load_config(None, overrides={
        "data.patch_size": (8, 8, 8), "data.batch_size": 2,
        "data.val_fraction": 0.34, "model.base_channels": 4,
        "model.depth": 2, "model.n_nodes": 2, "model.gn_groups": 4,
        "model.dtype": "float32", "model.remat": False,
        "search.warmup_epochs": 1, "search.partial_channels": 2,
        "search.checkpoint_dir": str(tmp_path / "ckpt"), "search.seed": 0,
    })
    net = SuperNet(in_channels=4, num_classes=3, base_channels=4, depth=2,
                   n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")
    searcher = Searcher(net, cfg, paths, log_path=str(tmp_path / "slog.jsonl"))
    assert searcher.net.pc_k == 2                 # config clones the supernet
    state, geno = searcher.search(epochs=2, steps_per_epoch=3)
    assert int(state.step) == 6
    assert isinstance(geno, Genotype)
    geno.validate()
    assert os.path.exists(os.path.join(str(tmp_path / "ckpt"), "genotype.json"))
