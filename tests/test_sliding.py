"""Sliding-window stitching: grid coverage + bit-for-bit fp32 vs numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from nas_3d_unet_tpu.infer.predict import uncrop_labels
from nas_3d_unet_tpu.infer.sliding import grid_coords, grid_starts, sliding_window_probs


def test_grid_starts_cover_and_end_align():
    assert grid_starts(10, 4, 2) == [0, 2, 4, 6]
    assert grid_starts(11, 4, 2) == [0, 2, 4, 6, 7]  # end-aligned tail
    assert grid_starts(4, 4, 2) == [0]
    starts = grid_starts(37, 16, 8)
    assert starts[-1] == 37 - 16
    covered = np.zeros(37, bool)
    for s in starts:
        covered[s:s + 16] = True
    assert covered.all()


def _numpy_stitch_oracle(forward, volume, patch, stride, num_classes):
    """Reference stitch: sequential accumulate in fp32, single divide."""
    D, H, W, _ = volume.shape
    sums = np.zeros((D, H, W, num_classes), np.float32)
    cnts = np.zeros((D, H, W, 1), np.float32)
    coords = grid_coords((D, H, W), patch, stride)
    for (d, h, w) in coords:
        p = volume[d:d + patch[0], h:h + patch[1], w:w + patch[2], :]
        probs = forward(p[None])[0]
        sums[d:d + patch[0], h:h + patch[1], w:w + patch[2], :] += probs
        cnts[d:d + patch[0], h:h + patch[1], w:w + patch[2], :] += 1.0
    return sums / cnts


def test_stitch_bitexact_vs_numpy_oracle():
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((13, 11, 9, 4)).astype(np.float32)
    patch, overlap = (8, 8, 8), 0.5
    stride = (4, 4, 4)
    K = 3

    # an affine elementwise "model": *, + are correctly rounded IEEE ops, so
    # XLA and numpy produce bitwise-identical per-patch outputs — isolating
    # the stitching arithmetic, which is the bit-for-bit contract.
    def forward_jax(x):
        return x[..., :K] * jnp.float32(0.5) + jnp.float32(0.25)

    def forward_np(x):
        return x[..., :K] * np.float32(0.5) + np.float32(0.25)

    got = sliding_window_probs(forward_jax, vol, patch, overlap, batch_size=3, num_classes=K)

    # oracle runs on the padded volume the same way
    pad = [max(0, p - s) for p, s in zip(patch, vol.shape[:3])]
    vpad = np.pad(vol, [(0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)])
    want = _numpy_stitch_oracle(forward_np, vpad, patch, stride, K)[:13, :11, :9]

    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want)  # bit-for-bit fp32


def test_stitch_constant_model_gives_constant_probs():
    # any overlap pattern must average to exactly the constant
    def forward(x):
        return jnp.full(x.shape[:-1] + (2,), 0.25, jnp.float32)

    vol = np.zeros((10, 10, 10, 1), np.float32)
    probs = sliding_window_probs(forward, vol, (4, 4, 4), 0.5, batch_size=4, num_classes=2)
    np.testing.assert_array_equal(probs, np.full((10, 10, 10, 2), 0.25, np.float32))


def test_small_volume_padding():
    def forward(x):
        return jnp.ones(x.shape[:-1] + (1,), jnp.float32)

    vol = np.zeros((3, 5, 4, 2), np.float32)  # smaller than patch
    probs = sliding_window_probs(forward, vol, (8, 8, 8), 0.5, num_classes=1)
    assert probs.shape == (3, 5, 4, 1)
    np.testing.assert_array_equal(probs, np.ones((3, 5, 4, 1), np.float32))


def test_uncrop():
    lab = np.ones((2, 3, 4), np.uint8)
    full = uncrop_labels(lab, np.array([1, 2, 3]), np.array([5, 7, 9]))
    assert full.shape == (5, 7, 9)
    assert full.sum() == 2 * 3 * 4
    assert full[1:3, 2:5, 3:7].all()


def test_bf16_body_inference_mode():
    """infer.dtype=bfloat16 (the opt-in speed mode) keeps fp32 logits and
    fp32 stitching, and its thresholded output agrees with the fp32 run on
    nearly every voxel (the body dtype only perturbs logits slightly)."""
    from nas_3d_unet_tpu.infer.sliding import SlidingWindowPredictor
    from nas_3d_unet_tpu.models.genotype import init_alphas, parse_alphas
    from nas_3d_unet_tpu.models.unet import DerivedNet

    geno = parse_alphas(init_alphas(jax.random.PRNGKey(0), 2), 2)
    kwargs = dict(genotype=geno, in_channels=4, num_classes=3, base_channels=4,
                  depth=2, n_nodes=2, gn_groups=4, remat=False)
    net32 = DerivedNet(dtype_name="float32", **kwargs)
    net16 = DerivedNet(dtype_name="bfloat16", **kwargs)

    rng = np.random.default_rng(3)
    vol = rng.standard_normal((12, 10, 8, 4)).astype(np.float32)
    x0 = np.zeros((1, 8, 8, 8, 4), np.float32)
    params = net32.init(jax.random.PRNGKey(1), x0)  # same tree for both

    probs = {}
    for name, net in (("f32", net32), ("bf16", net16)):
        pred = SlidingWindowPredictor(net.apply, params, (8, 8, 8),
                                      overlap=0.5, batch_size=1, num_classes=3)
        p = np.asarray(pred.predict_volume(jnp.asarray(vol)))
        assert p.dtype == np.float32  # stitch contract holds in both modes
        probs[name] = p
    agree = np.mean((probs["f32"] > 0.5) == (probs["bf16"] > 0.5))
    assert agree > 0.98, agree
    np.testing.assert_allclose(probs["bf16"], probs["f32"], atol=0.15)
