"""Bilevel search: α moves on search steps only, losses drop, genotype emitted."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nas_3d_unet_tpu.models.genotype import Genotype, init_alphas
from nas_3d_unet_tpu.models.unet import SuperNet, arch_weights_from_alphas
from nas_3d_unet_tpu.search.bilevel import (
    SearchState,
    Searcher,
    alpha_summary,
    make_search_step,
    make_warmup_step,
)
from nas_3d_unet_tpu.utils.config import load_config
from tests.helpers import write_synthetic_h5

import optax


def tiny_supernet():
    return SuperNet(in_channels=4, num_classes=3, base_channels=4, depth=2,
                    n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")


def make_state(net, w_tx, a_tx, b=2, p=8):
    alphas = init_alphas(jax.random.PRNGKey(0), 2)
    x0 = jnp.zeros((b, p, p, p, 4), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x0, arch_weights_from_alphas(alphas))
    return SearchState(params=params, w_opt=w_tx.init(params), alphas=alphas,
                       a_opt=a_tx.init(alphas), step=jnp.asarray(0, jnp.int32),
                       rng=jax.random.PRNGKey(2))


def batches(seed=0, b=2, p=8):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, p, p, p, 4)).astype(np.float32)
    wt = (x[..., 1] > 0.5).astype(np.float32)
    y = np.stack([wt, wt, wt], axis=-1)
    return jnp.asarray(x), jnp.asarray(y)


def test_search_step_updates_both_param_groups():
    net = tiny_supernet()
    w_tx, a_tx = optax.adamw(1e-3), optax.adamw(3e-3)
    step = make_search_step(net.apply, w_tx, a_tx)
    state = make_state(net, w_tx, a_tx)
    a_before = jax.device_get(state.alphas)
    p_before = jax.device_get(state.params)
    x_tr, y_tr = batches(0)
    x_val, y_val = batches(1)
    state, m = step(state, x_tr, y_tr, x_val, y_val)
    a_after = jax.device_get(state.alphas)
    p_after = jax.device_get(state.params)
    a_moved = any(np.abs(a_after[k] - a_before[k]).max() > 0 for k in a_after)
    leaves_b = jax.tree_util.tree_leaves(p_before)
    leaves_a = jax.tree_util.tree_leaves(p_after)
    w_moved = any(np.abs(np.asarray(x) - np.asarray(y)).max() > 0
                  for x, y in zip(leaves_a, leaves_b))
    assert a_moved and w_moved
    assert np.isfinite(float(m["train_loss"])) and np.isfinite(float(m["val_loss"]))
    assert int(state.step) == 1


def test_warmup_step_freezes_alpha():
    net = tiny_supernet()
    w_tx, a_tx = optax.adamw(1e-3), optax.adamw(3e-3)
    step = make_warmup_step(net.apply, w_tx)
    state = make_state(net, w_tx, a_tx)
    a_before = jax.device_get(state.alphas)
    x_tr, y_tr = batches(0)
    state, _ = step(state, x_tr, y_tr)
    a_after = jax.device_get(state.alphas)
    for k in a_after:
        np.testing.assert_array_equal(a_after[k], a_before[k])


def test_search_losses_decrease_overfit():
    net = tiny_supernet()
    w_tx, a_tx = optax.adamw(5e-3), optax.adamw(3e-3)
    step = make_search_step(net.apply, w_tx, a_tx)
    state = make_state(net, w_tx, a_tx)
    x_tr, y_tr = batches(0)
    x_val, y_val = batches(1)
    first = None
    for _ in range(30):
        state, m = step(state, x_tr, y_tr, x_val, y_val)
        if first is None:
            first = float(m["train_loss"])
    assert float(m["train_loss"]) < first


def test_alpha_summary_entropy_positive():
    alphas = init_alphas(jax.random.PRNGKey(0), 2)
    s = alpha_summary(alphas)
    assert all(v > 0 for v in s.values())


def test_searcher_end_to_end(tmp_path):
    paths = write_synthetic_h5(str(tmp_path / "h5"), n_patients=3)
    cfg = load_config(None, overrides={
        "data.patch_size": (8, 8, 8), "data.batch_size": 2, "data.val_fraction": 0.34,
        "model.base_channels": 4, "model.depth": 2, "model.n_nodes": 2,
        "model.gn_groups": 4, "model.dtype": "float32", "model.remat": False,
        "search.warmup_epochs": 1, "search.w_lr": 3e-3, "search.alpha_lr": 3e-3,
        "search.checkpoint_dir": str(tmp_path / "ckpt"), "search.seed": 0,
    })
    net = tiny_supernet()
    searcher = Searcher(net, cfg, paths, log_path=str(tmp_path / "slog.jsonl"))
    state, geno = searcher.search(epochs=2, steps_per_epoch=4)
    assert int(state.step) == 8
    assert isinstance(geno, Genotype)
    geno.validate()
    gpath = os.path.join(str(tmp_path / "ckpt"), "genotype.json")
    assert os.path.exists(gpath)
    assert Genotype.load(gpath) == geno
    # resume continues
    searcher2 = Searcher(net, cfg, paths, log_path=str(tmp_path / "slog.jsonl"))
    state2, _ = searcher2.search(epochs=3, steps_per_epoch=4)
    assert int(state2.step) == 12


def test_search_batch_size_override(tmp_path):
    """search.batch_size pins the bilevel batch independently of
    data.batch_size (0 = inherit).  The shipped config relies on this:
    derived training runs b2+microbatch=1 (the measured optimum) while the
    HBM-critical remat-off search stays at b1."""
    paths = write_synthetic_h5(str(tmp_path / "h5"), n_patients=3)
    base = {
        "data.patch_size": (8, 8, 8), "data.batch_size": 2,
        "data.val_fraction": 0.34, "model.base_channels": 4,
        "model.depth": 2, "model.n_nodes": 2, "model.gn_groups": 4,
        "model.dtype": "float32",
        "search.checkpoint_dir": str(tmp_path / "ckpt"),
    }
    inherit = Searcher(tiny_supernet(), load_config(None, overrides=base), paths)
    assert inherit.batch == 2          # default 0 inherits data.batch_size
    pinned = Searcher(tiny_supernet(),
                      load_config(None, overrides={**base, "search.batch_size": 1}),
                      paths)
    assert pinned.batch == 1
    # and the pinned searcher actually steps at its own batch size
    state, _ = pinned.search(epochs=1, steps_per_epoch=2)
    assert int(state.step) == 2


def test_search_resume_trajectory_exact(tmp_path):
    """VERDICT r3 #3 (search side): interrupted+resumed search is bitwise
    identical to an uninterrupted run — the w/α/eval streams are counter-
    based and positioned by the restored step (bilevel.py)."""
    paths = write_synthetic_h5(str(tmp_path / "h5"), n_patients=3)

    def mk(ck):
        cfg = load_config(None, overrides={
            "data.patch_size": (8, 8, 8), "data.batch_size": 2,
            "data.val_fraction": 0.34, "model.base_channels": 4,
            "model.depth": 2, "model.n_nodes": 2, "model.gn_groups": 4,
            "model.dtype": "float32", "model.remat": False,
            "search.warmup_epochs": 1, "search.val_steps": 2,
            "search.checkpoint_dir": str(tmp_path / ck), "search.seed": 0,
        })
        return Searcher(tiny_supernet(), cfg, paths)

    s_full, g_full = mk("ck_a").search(epochs=2, steps_per_epoch=3)
    mk("ck_b").search(epochs=1, steps_per_epoch=3)   # "crash" after epoch 0
    s_res, g_res = mk("ck_b").search(epochs=2, steps_per_epoch=3)

    assert int(s_full.step) == int(s_res.step) == 6
    assert g_full == g_res
    np.testing.assert_array_equal(np.asarray(s_full.rng), np.asarray(s_res.rng))
    for k in s_full.alphas:
        np.testing.assert_array_equal(np.asarray(s_full.alphas[k]),
                                      np.asarray(s_res.alphas[k]))
    for tree_a, tree_b in ((s_full.params, s_res.params),
                           (s_full.w_opt, s_res.w_opt),
                           (s_full.a_opt, s_res.a_opt)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_second_order_step_runs_and_differs():
    from nas_3d_unet_tpu.search.bilevel import make_search_step_unrolled

    net = tiny_supernet()
    w_tx, a_tx = optax.adamw(1e-3), optax.adamw(3e-3)
    step1 = make_search_step(net.apply, w_tx, a_tx)
    step2 = make_search_step_unrolled(net.apply, w_tx, a_tx, xi=1e-3)
    x_tr, y_tr = batches(0)
    x_val, y_val = batches(1)

    s1, m1 = step1(make_state(net, w_tx, a_tx), x_tr, y_tr, x_val, y_val)
    s2, m2 = step2(make_state(net, w_tx, a_tx), x_tr, y_tr, x_val, y_val)
    assert np.isfinite(float(m2["train_loss"])) and np.isfinite(float(m2["val_loss"]))
    # the unrolled alpha-gradient includes the Hessian-vector correction,
    # so alpha trajectories must differ from first-order
    diff = max(float(jnp.abs(s1.alphas[k] - s2.alphas[k]).max()) for k in s1.alphas)
    assert diff > 0


def test_searcher_unrolled_config(tmp_path):
    from tests.helpers import write_synthetic_h5

    paths = write_synthetic_h5(str(tmp_path / "h5"), n_patients=2)
    cfg = load_config(None, overrides={
        "data.patch_size": (8, 8, 8), "data.batch_size": 1, "data.val_fraction": 0.5,
        "model.base_channels": 4, "model.depth": 1, "model.n_nodes": 2,
        "model.gn_groups": 4, "model.dtype": "float32", "model.remat": False,
        "search.warmup_epochs": 0, "search.unrolled": True,
        "search.checkpoint_dir": str(tmp_path / "ckpt")})
    net = SuperNet(in_channels=4, num_classes=3, base_channels=4, depth=1,
                   n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")
    searcher = Searcher(net, cfg, paths)
    state, geno = searcher.search(epochs=1, steps_per_epoch=2)
    assert int(state.step) == 2
    geno.validate()


def test_searcher_evaluate_alpha_split(tmp_path):
    # VERDICT r1 weak #5: the search loop must evaluate on the α-split
    # beyond the in-step val loss — frozen-α supernet eval with region dice
    import json

    paths = write_synthetic_h5(str(tmp_path / "h5"), n_patients=3)
    cfg = load_config(None, overrides={
        "data.patch_size": (8, 8, 8), "data.batch_size": 2, "data.val_fraction": 0.34,
        "model.base_channels": 4, "model.depth": 2, "model.n_nodes": 2,
        "model.gn_groups": 4, "model.dtype": "float32", "model.remat": False,
        "search.warmup_epochs": 1, "search.val_steps": 2,
        "search.checkpoint_dir": str(tmp_path / "ckpt"), "search.seed": 0,
    })
    net = tiny_supernet()
    log = str(tmp_path / "slog.jsonl")
    searcher = Searcher(net, cfg, paths, log_path=log)
    searcher.search(epochs=2, steps_per_epoch=2)
    epochs = [json.loads(l) for l in open(log) if '"epoch"' in l]
    warm = [e for e in epochs if e.get("warmup")]
    full = [e for e in epochs if e.get("event") == "epoch" and not e.get("warmup")]
    assert full, epochs
    for k in ("eval_loss", "dice_wt", "dice_tc", "dice_et"):
        assert k in full[-1] and np.isfinite(full[-1][k]), (k, full[-1])
    assert warm and "dice_wt" not in warm[0]
    # the augment_val flag rides into every epoch record (default off)
    assert all(e.get("augment_val") is False for e in epochs), epochs


def test_augment_val_flag_semantics():
    """VERDICT r2 #9: val-side augmentation is an explicit, default-off config
    choice (the reference applies none to the α batch, SURVEY.md §3.2).

    augment_val=False: the step's val_loss equals a direct frozen eval of the
    supernet on the RAW val batch; =True (flip_prob=1 forces flips): differs.
    """
    from nas_3d_unet_tpu.metrics.dice import get_loss_fn

    net = tiny_supernet()
    w_tx, a_tx = optax.adamw(1e-3), optax.adamw(3e-3)
    aug = dict(flip_prob=1.0, intensity_shift=0.0, intensity_scale=0.0)
    x_tr, y_tr = batches(0)
    x_val, y_val = batches(1)

    state = make_state(net, w_tx, a_tx)
    raw = float(get_loss_fn("regions")(
        net.apply(state.params, x_val, arch_weights_from_alphas(state.alphas)),
        y_val))

    # fresh state per call: the step donates its input state
    step_off = make_search_step(net.apply, w_tx, a_tx, augment=aug,
                                augment_val=False)
    _, m_off = step_off(make_state(net, w_tx, a_tx), x_tr, y_tr, x_val, y_val)
    step_on = make_search_step(net.apply, w_tx, a_tx, augment=aug,
                               augment_val=True)
    _, m_on = step_on(make_state(net, w_tx, a_tx), x_tr, y_tr, x_val, y_val)

    off_loss, on_loss = float(m_off["val_loss"]), float(m_on["val_loss"])
    # rtol 1e-4: jitted vs un-jitted fp32 reductions may reassociate across
    # jaxlib versions; still far below the 1e-4 on/off separation below
    np.testing.assert_allclose(off_loss, raw, rtol=1e-4)
    assert abs(on_loss - raw) > 1e-4, (on_loss, raw)

    # config plumb: default off, override works (Searcher pickup + the
    # epoch-log augment_val field are asserted in
    # test_searcher_evaluate_alpha_split, which runs a full Searcher)
    from nas_3d_unet_tpu.utils.config import load_config as _lc
    assert _lc(None).search.augment_val is False
    assert _lc(None, overrides={"search.augment_val": True}).search.augment_val is True
