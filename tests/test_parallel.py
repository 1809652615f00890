"""GSPMD data parallelism on the fake 8-device CPU mesh (SURVEY.md §4).

The sharded train/search steps must be numerically equivalent to the
single-device step on the same total batch (same seed), up to fp32
all-reduce ordering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nas_3d_unet_tpu.models.genotype import init_alphas, parse_alphas
from nas_3d_unet_tpu.models.unet import DerivedNet, SuperNet, arch_weights_from_alphas
from nas_3d_unet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from nas_3d_unet_tpu.search.bilevel import SearchState, make_search_step
from nas_3d_unet_tpu.train.loop import TrainState, make_optimizer, make_train_step


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")


def tiny_derived():
    geno = parse_alphas(init_alphas(jax.random.PRNGKey(0), 2), 2)
    return DerivedNet(genotype=geno, in_channels=4, num_classes=3, base_channels=4,
                      depth=2, n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")


def batch(b=8, p=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, p, p, p, 4)).astype(np.float32)
    wt = (x[..., 1] > 0.5).astype(np.float32)
    y = np.stack([wt, wt, wt], axis=-1)
    return jnp.asarray(x), jnp.asarray(y)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(spatial_parallel=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(spatial_parallel=3)
    # explicit sizes may use a device subset
    assert make_mesh(data_parallel=3, spatial_parallel=2).devices.shape == (3, 2)
    with pytest.raises(ValueError):
        make_mesh(data_parallel=5, spatial_parallel=2)


def _run_train(state, step_fn, x, y, n=3):
    for _ in range(n):
        state, m = step_fn(state, x, y)
    return state, m


def test_dp_train_step_matches_single_device():
    net = tiny_derived()
    tx = make_optimizer(1e-3, 1e-4)
    step = make_train_step(net.apply, tx, augment=None)
    x, y = batch()

    def init_state():
        params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x))
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(2))

    # single device
    s_single, m_single = _run_train(init_state(), step, x, y)

    # 8-way DP: replicated state, batch sharded over data axis
    mesh = make_mesh()
    state = replicate(mesh, init_state())
    xs, ys = shard_batch(mesh, (x, y))
    s_dp, m_dp = _run_train(state, step, xs, ys)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


def test_dp_train_step_microbatch_matches_single_device():
    """Gradient accumulation under GSPMD DP: the strided microbatch grouping
    keeps every scan slice evenly sharded over the data axis, and the
    accumulated update equals the single-device FULL-batch step (grouping
    is arbitrary for a per-sample-mean loss).  b=8 over data=4 (per-device
    batch 2), microbatch 4 → k=2 slices of 4 samples, one per device each."""
    net = tiny_derived()
    tx = make_optimizer(1e-3, 1e-4)
    x, y = batch()

    def init_state():
        params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x))
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(2))

    full = make_train_step(net.apply, tx, augment=None)
    s_single, m_single = _run_train(init_state(), full, x, y)

    accum = make_train_step(net.apply, tx, augment=None, microbatch=4)
    mesh = make_mesh(data_parallel=4)
    state = replicate(mesh, init_state())
    xs, ys = shard_batch(mesh, (x, y))
    s_dp, m_dp = _run_train(state, accum, xs, ys)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


def test_dp_spatial_train_step_runs():
    """data×spatial mesh: batch over 4 devices, volume D-axis over 2."""
    net = tiny_derived()
    tx = make_optimizer(1e-3, 0.0)
    step = make_train_step(net.apply, tx, augment=None)
    x, y = batch(b=4, p=8)
    mesh = make_mesh(spatial_parallel=2)

    params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x))
    state = replicate(mesh, TrainState(params=params, opt_state=tx.init(params),
                                       step=jnp.asarray(0, jnp.int32),
                                       rng=jax.random.PRNGKey(2)))
    xs, ys = shard_batch(mesh, (x, y), spatial=True)
    assert xs.sharding.spec == batch_sharding(mesh, spatial=True).spec
    state, m = step(state, xs, ys)
    assert np.isfinite(float(m["loss"]))


def _train_equality_vs_single_device(net, spatial_parallel, data_parallel,
                                     b=4, p=16, n=3):
    """Run n train steps single-device and on a (data×spatial) mesh and
    assert loss AND updated params agree within fp32 all-reduce tolerance.

    This is the round-3 VERDICT #4 gap: the conv-halo-exchange TRANSPOSE in
    the backward is generated by XLA only under spatial sharding, and until
    now only the forward had a numerical check."""
    tx = make_optimizer(1e-3, 1e-4)
    step = make_train_step(net.apply, tx, augment=None)
    x, y = batch(b=b, p=p)

    def init_state():
        params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x))
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(2))

    s_single, m_single = _run_train(init_state(), step, x, y, n=n)

    mesh = make_mesh(data_parallel=data_parallel,
                     spatial_parallel=spatial_parallel)
    state = replicate(mesh, init_state())
    xs, ys = shard_batch(mesh, (x, y), spatial=(spatial_parallel > 1))
    s_sh, m_sh = _run_train(state, step, xs, ys, n=n)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_sh["loss"]),
                               rtol=2e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(s_single.params),
                     jax.tree_util.tree_leaves(s_sh.params)):
        # same tolerance rationale as the packed DP test above: psum/halo
        # reassociation drift amplified through Adam's normalization
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=2e-4)


def test_spatial_train_step_matches_single_device():
    """Pure spatial sharding (data axis size 1): the halo-exchange forward
    AND its transpose in the gradient must reproduce single-device training."""
    _train_equality_vs_single_device(tiny_derived(), spatial_parallel=2,
                                     data_parallel=1, b=2)


def test_spatial_train_step_matches_single_device_packed():
    _train_equality_vs_single_device(tiny_derived_packed(), spatial_parallel=2,
                                     data_parallel=1, b=2)


def test_dp_spatial_train_step_matches_single_device():
    """data×spatial (4×2) mesh: batch-grad psum and D-axis halo transpose
    compose; loss and updated params must match single-device."""
    _train_equality_vs_single_device(tiny_derived(), spatial_parallel=2,
                                     data_parallel=4, b=4)


def test_dp_spatial_train_step_matches_single_device_packed():
    _train_equality_vs_single_device(tiny_derived_packed(), spatial_parallel=2,
                                     data_parallel=4, b=4)


def test_max_pool_grad_matches_under_spatial_sharding():
    """Regression for the round-4 discovery that motivated max_pool3_shifted:
    reduce_window-max's SelectAndScatter VJP is silently WRONG under GSPMD
    spatial sharding (max|dgrad| ~6e-3 on this exact setup while the forward
    matched to 4e-6).  The shipped Pool must give sharding-invariant input
    gradients; ties (post-ReLU zeros) must split identically too."""
    from nas_3d_unet_tpu.ops.primitives import Pool

    mesh = make_mesh(data_parallel=1, spatial_parallel=2)
    rng = np.random.default_rng(0)
    for xin in (rng.standard_normal((2, 16, 16, 16, 4)),
                np.maximum(rng.standard_normal((2, 16, 16, 16, 4)), 0.0)):
        x = jnp.asarray(xin.astype(np.float32))
        for stride in (1, 2):
            mod = Pool("max", stride)

            def loss(xx):
                return jnp.mean(jnp.square(mod.apply({}, xx)))

            g1 = jax.jit(jax.grad(loss))(x)
            (xs,) = shard_batch(mesh, (x,), spatial=True)
            g2 = jax.jit(jax.grad(loss))(xs)
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                       atol=1e-7, rtol=1e-6)


def test_dp_search_step_matches_single_device():
    net = SuperNet(in_channels=4, num_classes=3, base_channels=4, depth=1,
                   n_nodes=2, gn_groups=4, remat=False, dtype_name="float32")
    w_tx, a_tx = optax.adamw(1e-3), optax.adamw(3e-3)
    step = make_search_step(net.apply, w_tx, a_tx)
    x_tr, y_tr = batch(seed=0)
    x_va, y_va = batch(seed=1)

    def init_state():
        alphas = init_alphas(jax.random.PRNGKey(0), 2)
        params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x_tr),
                          arch_weights_from_alphas(alphas))
        return SearchState(params=params, w_opt=w_tx.init(params), alphas=alphas,
                           a_opt=a_tx.init(alphas), step=jnp.asarray(0, jnp.int32),
                           rng=jax.random.PRNGKey(2))

    s1, m1 = step(init_state(), x_tr, y_tr, x_va, y_va)

    mesh = make_mesh()
    state = replicate(mesh, init_state())
    xs_tr, ys_tr, xs_va, ys_va = shard_batch(mesh, (x_tr, y_tr, x_va, y_va))
    s2, m2 = step(state, xs_tr, ys_tr, xs_va, ys_va)

    np.testing.assert_allclose(float(m1["train_loss"]), float(m2["train_loss"]), rtol=2e-5)
    for k in s1.alphas:
        np.testing.assert_allclose(np.asarray(s1.alphas[k]), np.asarray(s2.alphas[k]),
                                   atol=2e-6)


def test_dp_sliding_window_inference_bitexact():
    """Data-parallel patch batches produce bit-identical stitched output."""
    from nas_3d_unet_tpu.infer.sliding import sliding_window_probs
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((12, 10, 9, 4)).astype(np.float32)

    def forward(x):
        return x[..., :3] * jnp.float32(0.5) + jnp.float32(0.25)

    plain = sliding_window_probs(forward, vol, (8, 8, 8), 0.5, batch_size=8,
                                 num_classes=3)
    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("data", None, None, None, None))
    with mesh:
        sharded = sliding_window_probs(forward, vol, (8, 8, 8), 0.5,
                                       batch_size=8, num_classes=3,
                                       batch_sharding=sharding)
    np.testing.assert_array_equal(plain, sharded)


def test_spatial_sharded_forward_matches_single_device():
    """Volume-axis (CP-analog) sharding: XLA inserts conv halo exchanges;
    results must match the unsharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    net = tiny_derived()
    x, _ = batch(b=2, p=16)
    params = net.init(jax.random.PRNGKey(1), x)
    want = net.apply(params, x)

    mesh = make_mesh(spatial_parallel=2)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "spatial", None, None, None)))
    ps = replicate(mesh, params)
    got = jax.jit(net.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def tiny_derived_packed():
    geno = parse_alphas(init_alphas(jax.random.PRNGKey(0), 2), 2)
    return DerivedNet(genotype=geno, in_channels=4, num_classes=3, base_channels=4,
                      depth=2, n_nodes=2, gn_groups=4, remat=False,
                      dtype_name="float32", packed=True)


def test_dp_train_step_matches_single_device_packed():
    # the shipped default (lane-packed execution) must compose with GSPMD DP
    net = tiny_derived_packed()
    tx = make_optimizer(1e-3, 1e-4)
    step = make_train_step(net.apply, tx, augment=None)
    x, y = batch()

    def init_state():
        params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x))
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(2))

    s_single, m_single = _run_train(init_state(), step, x, y)
    mesh = make_mesh()
    state = replicate(mesh, init_state())
    xs, ys = shard_batch(mesh, (x, y))
    s_dp, m_dp = _run_train(state, step, xs, ys)
    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_dp.params)):
        # DP psum reassociates the grad reduction; after Adam's normalization
        # the worst per-element drift observed is ~5e-5 (fp32, CPU codegen-
        # dependent), so this is a tolerance on accumulation order, not logic
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=2e-4)


def test_spatial_sharded_forward_matches_single_device_packed():
    # packed keeps D/H native, so the D-axis (CP-analog) sharding and its
    # conv halo exchanges must still produce the unsharded result; the
    # packed W axis rides inside each shard untouched
    from jax.sharding import NamedSharding, PartitionSpec as P

    net = tiny_derived_packed()
    x, _ = batch(b=2, p=16)
    params = net.init(jax.random.PRNGKey(1), x)
    want = net.apply(params, x)

    mesh = make_mesh(spatial_parallel=2)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "spatial", None, None, None)))
    ps = replicate(mesh, params)
    got = jax.jit(net.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_spatial_sharded_sliding_window_bitexact():
    # CP-analog inference: the whole-volume stitch buffers shard over the
    # spatial axis; output must be BIT-IDENTICAL to the unsharded stitch
    # (per-voxel fp32 arithmetic is unchanged — GSPMD only moves data)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from nas_3d_unet_tpu.infer.sliding import SlidingWindowPredictor

    net = tiny_derived_packed()
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((24, 20, 18, 4)).astype(np.float32)
    x0 = jnp.zeros((1, 16, 16, 16, 4), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x0)

    base = SlidingWindowPredictor(net.apply, params, (16, 16, 16),
                                  overlap=0.5, batch_size=2, num_classes=3)
    want = base.predict_volume(vol)

    mesh = make_mesh(spatial_parallel=2)
    vs = NamedSharding(mesh, P("spatial", None, None, None))
    sharded = SlidingWindowPredictor(net.apply, params, (16, 16, 16),
                                     overlap=0.5, batch_size=2, num_classes=3,
                                     volume_sharding=vs)
    got = sharded.predict_volume(vol)
    np.testing.assert_array_equal(got, want)


def test_dp_train_step_classes_mode():
    # label_mode="classes": rank-4 int labels must shard under the DP mesh
    # (round-3 ADVICE: the rank-5 spec used to raise in device_put) and the
    # sharded step must match single-device
    from nas_3d_unet_tpu.parallel.mesh import put_batch

    geno = parse_alphas(init_alphas(jax.random.PRNGKey(0), 2), 2)
    net = DerivedNet(genotype=geno, in_channels=4, num_classes=4, base_channels=4,
                     depth=2, n_nodes=2, gn_groups=4, remat=False,
                     dtype_name="float32")
    tx = make_optimizer(1e-3, 1e-4)
    step = make_train_step(net.apply, tx, augment=None, label_mode="classes")

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 8, 8, 8, 4)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, size=(8, 8, 8, 8)).astype(np.int32))

    def init_state():
        params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(x))
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(2))

    s_single, m_single = _run_train(init_state(), step, x, y)

    mesh = make_mesh()
    state = replicate(mesh, init_state())
    xs, ys = put_batch((np.asarray(x), np.asarray(y)), batch_sharding(mesh))
    s_dp, m_dp = _run_train(state, step, xs, ys)
    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=2e-5)


def test_prefetcher_classes_mode_sharded():
    # Prefetcher._put must rank-trim the spec for the rank-4 label array
    from nas_3d_unet_tpu.data.pipeline import PatchGenerator, PatientCache, Prefetcher

    class _FakeCache:
        def __init__(self):
            rng = np.random.default_rng(0)
            self.records = [{
                "image": rng.standard_normal((16, 16, 16, 4)).astype(np.float32),
                "label": rng.integers(0, 4, size=(16, 16, 16)).astype(np.int32),
            }]

        def __len__(self):
            return 1

    gen = PatchGenerator(_FakeCache(), (8, 8, 8), batch_size=8, seed=0,
                         augment=False)
    mesh = make_mesh()
    pf = Prefetcher(gen, depth=1, sharding=batch_sharding(mesh))
    try:
        x, y = pf.next()
        assert x.shape == (8, 8, 8, 8, 4) and y.shape == (8, 8, 8, 8)
        assert tuple(y.sharding.spec)[0] == "data"
    finally:
        pf.close()


def test_dp_train_step_n_matches_single_device():
    """The multi-step scan driver under a DP mesh: stacked (step, B, ...)
    batches must shard the BATCH axis, not the step axis (the Trainer's
    _stack_steps prepends None to the spec), and n scanned sharded steps
    must match n sequential single-device steps."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nas_3d_unet_tpu.train.loop import make_train_step_n

    net = tiny_derived()
    tx = make_optimizer(1e-3, 1e-4)
    step1 = make_train_step(net.apply, tx, augment=None)
    stepn = make_train_step_n(net.apply, tx, augment=None)

    n = 3
    batches = [batch(seed=20 + i) for i in range(n)]
    xs = jnp.stack([b[0] for b in batches])
    ys = jnp.stack([b[1] for b in batches])

    def init_state():
        params = net.init(jax.random.PRNGKey(1), jnp.zeros_like(batches[0][0]))
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(2))

    s_seq = init_state()
    for x, y in batches:
        s_seq, m_seq = step1(s_seq, x, y)

    mesh = make_mesh()
    state = replicate(mesh, init_state())
    spec = batch_sharding(mesh).spec
    step_shard = NamedSharding(mesh, P(*((None,) + tuple(spec))))
    xs_s = jax.device_put(xs, step_shard)
    ys_s = jax.device_put(ys, step_shard)
    assert tuple(xs_s.sharding.spec)[1] == "data"
    s_dp, m_dp = stepn(state, xs_s, ys_s)

    assert int(s_dp.step) == n
    np.testing.assert_allclose(float(m_dp["loss"][-1]), float(m_seq["loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)
