"""Golden frozen-output test (SURVEY.md §4 "Golden tests").

A fixed-seed tiny derived net + fixed synthetic volume through the full
sliding-window inference path must reproduce the frozen fp32 output
EXACTLY (bit-for-bit) — the BASELINE.json north-star contract for the
stitching path.  The fixture is committed; regenerate after an intentional
numerics change with:

    python tests/test_golden.py regen
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "golden", "sliding_fp32.npz")


def _golden_setup():
    from nas_3d_unet_tpu.models.genotype import default_genotype
    from nas_3d_unet_tpu.models.unet import DerivedNet
    from nas_3d_unet_tpu.infer.sliding import SlidingWindowPredictor

    net = DerivedNet(genotype=default_genotype(2), in_channels=4, num_classes=3,
                     base_channels=4, depth=2, n_nodes=2, gn_groups=4,
                     remat=False, dtype_name="float32")
    x0 = jnp.zeros((1, 8, 8, 8, 4), jnp.float32)
    params = net.init(jax.random.PRNGKey(42), x0)
    predictor = SlidingWindowPredictor(net.apply, params, (8, 8, 8),
                                       overlap=0.5, batch_size=2, num_classes=3)
    vol = np.random.default_rng(123).standard_normal((12, 11, 10, 4)).astype(np.float32)
    return predictor, vol


def _compute():
    predictor, vol = _golden_setup()
    return predictor.predict_volume(vol)


def test_sliding_inference_matches_frozen_golden():
    # lazy backend check: calling jax.default_backend() at decorator time
    # would initialize the default (axon) backend before conftest/regen can
    # force CPU
    if jax.default_backend() != "cpu":
        pytest.skip("golden fixture frozen on the CPU backend")
    assert os.path.exists(_GOLDEN), "golden fixture missing — run: python tests/test_golden.py regen"
    want = np.load(_GOLDEN)["probs"]
    got = _compute()
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want)  # exact, not allclose


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        # reproduce the suite environment exactly: fp32 accumulation order on
        # XLA:CPU depends on the per-device thread pool, which depends on the
        # virtual device count conftest.py sets
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        os.makedirs(os.path.dirname(_GOLDEN), exist_ok=True)
        np.savez_compressed(_GOLDEN, probs=_compute())
        print(f"wrote {_GOLDEN}")
