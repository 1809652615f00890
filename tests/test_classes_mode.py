"""label_mode="classes" end-to-end: config resolution, train, search, predict.

The reference supports one-hot class encoding as an alternative to region
encoding (SURVEY.md §2 "Patch generator": "one-hot or region (WT/TC/ET)
label encoding"); here the softmax-class path must work end-to-end, not
just exist as a loss function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nas_3d_unet_tpu.metrics.dice import (
    class_indices_to_labels,
    labels_to_class_indices,
    labels_to_regions,
    softmax_dice_ce_loss,
)
from nas_3d_unet_tpu.models.genotype import init_alphas, parse_alphas
from nas_3d_unet_tpu.models.unet import DerivedNet, SuperNet
from nas_3d_unet_tpu.train.loop import Trainer, make_eval_step, make_optimizer, make_train_step
from nas_3d_unet_tpu.utils.config import apply_overrides, load_config
from tests.helpers import write_synthetic_h5


def tiny_classes_net():
    geno = parse_alphas(init_alphas(jax.random.PRNGKey(0), 2), 2)
    return DerivedNet(genotype=geno, in_channels=4, num_classes=4, base_channels=4,
                      depth=2, n_nodes=2, gn_groups=4, remat=False,
                      dtype_name="float32")


def class_batch(seed=0, b=2, p=8):
    """x plus an int class-index label derivable from x (learnable)."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, p, p, p, 4)).astype(np.float32)
    y = np.zeros((b, p, p, p), np.int32)
    y[x[..., 1] > 0.5] = 2
    y[x[..., 1] > 1.2] = 1
    y[x[..., 1] > 1.8] = 3
    return jnp.asarray(x), jnp.asarray(y)


def test_config_num_classes_autoresolves():
    cfg = load_config(None, overrides={"data.label_mode": "classes"})
    assert cfg.data.num_classes == 4
    cfg = load_config(None)
    assert cfg.data.num_classes == 3
    # explicit mismatch is rejected
    with pytest.raises(ValueError):
        load_config(None, overrides={"data.label_mode": "classes",
                                     "data.num_classes": 3})
    with pytest.raises(ValueError):
        load_config(None, overrides={"data.label_mode": "nonsense"})
    # mode switch on an existing config re-resolves num_classes
    cfg = apply_overrides(load_config(None), {"data.label_mode": "classes"})
    assert cfg.data.num_classes == 4


def test_class_label_roundtrip():
    labels = jnp.asarray([0, 1, 2, 4, 4, 0])
    idx = labels_to_class_indices(labels)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3, 3, 0])
    back = class_indices_to_labels(idx)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(labels))


def test_softmax_train_step_reduces_loss():
    net = tiny_classes_net()
    tx = make_optimizer(1e-2, 1e-4)
    step = make_train_step(net.apply, tx, augment=None, label_mode="classes")
    x, y = class_batch()
    params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x))
    from nas_3d_unet_tpu.train.loop import TrainState
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(2))
    first = None
    for _ in range(60):
        state, m = step(state, x, y)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)


def test_eval_step_classes_reports_region_dice():
    net = tiny_classes_net()
    x, y = class_batch(1)
    params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x))
    ev = make_eval_step(net.apply, label_mode="classes")
    m = ev(params, x, y)
    for k in ("dice_wt", "dice_tc", "dice_et"):
        assert 0.0 <= float(m[k]) <= 1.0
    assert np.isfinite(float(m["loss"]))
    # near-one-hot logits drive the softmax loss to ~0
    onehot_logits = jax.nn.one_hot(y, 4) * 20.0 - 10.0
    loss = softmax_dice_ce_loss(onehot_logits, y)
    assert float(loss) < 0.05
    pred_regions = labels_to_regions(class_indices_to_labels(y).astype(jnp.int32))
    assert pred_regions.shape == (*y.shape, 3)


def test_trainer_end_to_end_classes(tmp_path):
    paths = write_synthetic_h5(str(tmp_path / "h5"), n_patients=3)
    cfg = load_config(None, overrides={
        "data.patch_size": (8, 8, 8), "data.batch_size": 2, "data.val_fraction": 0.34,
        "data.label_mode": "classes",
        "model.base_channels": 4, "model.depth": 2, "model.n_nodes": 2,
        "model.gn_groups": 4, "model.dtype": "float32", "model.remat": False,
        "train.lr": 3e-3, "train.checkpoint_dir": str(tmp_path / "ckpt"),
    })
    assert cfg.data.num_classes == 4
    net = tiny_classes_net()
    trainer = Trainer(net, cfg, paths, log_path=str(tmp_path / "log.jsonl"),
                      device_augment=True)
    state = trainer.train(epochs=1, steps_per_epoch=4, val_steps=2)
    assert int(state.step) == 4
    import json
    events = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    ep = [e for e in events if e.get("event") == "epoch"]
    assert ep and np.isfinite(ep[-1]["train_loss"])
    assert 0.0 <= ep[-1]["dice_wt"] <= 1.0


def test_search_step_classes_smoke():
    from nas_3d_unet_tpu.models.unet import arch_weights_from_alphas
    from nas_3d_unet_tpu.search.bilevel import SearchState, make_search_step
    import optax

    net = SuperNet(in_channels=4, num_classes=4, base_channels=4, depth=1,
                   n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")
    alphas = init_alphas(jax.random.PRNGKey(0), 2)
    x, y = class_batch(b=1, p=8)
    params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x),
                      arch_weights_from_alphas(alphas))
    w_tx, a_tx = optax.adam(1e-3), optax.adam(1e-3)
    step = make_search_step(net.apply, w_tx, a_tx, label_mode="classes")
    state = SearchState(params=params, w_opt=w_tx.init(params), alphas=alphas,
                        a_opt=a_tx.init(alphas), step=jnp.asarray(0, jnp.int32),
                        rng=jax.random.PRNGKey(2))
    state, m = step(state, x, y, x, y)
    assert np.isfinite(float(m["train_loss"]))
    assert np.isfinite(float(m["val_loss"]))


def test_predict_classes_mode(tmp_path):
    """Sliding-window predict in class mode decodes argmax → BraTS labels."""
    from nas_3d_unet_tpu.infer.predict import predict_patient
    from nas_3d_unet_tpu.infer.sliding import SlidingWindowPredictor

    paths = write_synthetic_h5(str(tmp_path / "h5"), n_patients=1,
                               shape=(12, 12, 12))
    net = tiny_classes_net()
    x0 = jnp.zeros((1, 8, 8, 8, 4), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0)
    predictor = SlidingWindowPredictor(net.apply, params, (8, 8, 8),
                                       overlap=0.5, batch_size=2, num_classes=4,
                                       label_mode="classes")
    res = predict_patient(predictor, paths[0], out_dir=str(tmp_path / "out"))
    assert "dice" in res and set(res["dice"]) == {"WT", "TC", "ET"}
    import os
    assert os.path.exists(res["output"])
    from nas_3d_unet_tpu.io.nifti import read_nifti
    img = read_nifti(res["output"])
    assert set(np.unique(img.data)).issubset({0, 1, 2, 4})
