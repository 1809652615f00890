"""Test env: force CPU with 8 virtual devices.

Only 1 real TPU chip exists in this environment (SURVEY.md §7 [ENV]); the
multi-device GSPMD tests run on a fake 8-device CPU mesh as SURVEY.md §4
prescribes.  CPU also keeps compile latency out of the test loop.

Note: the image's sitecustomize imports jax and registers the remote-TPU
("axon") PJRT plugin at interpreter start, so JAX_PLATFORMS is already
captured — we must flip the platform via jax.config, not os.environ.
"""

import os
import sys

import pytest

# Real-TPU lane: NAS3D_TPU_TESTS=1 keeps the default (axon TPU) platform so
# @pytest.mark.tpu tests exercise the real chip (Pallas parity, HBM fits,
# fenced timing).  Run it as: NAS3D_TPU_TESTS=1 pytest tests/ -m tpu -q
_TPU_LANE = os.environ.get("NAS3D_TPU_TESTS") == "1"

_flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_LANE and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs the real TPU chip "
                            "(run with NAS3D_TPU_TESTS=1, skipped on CPU)")
    config.addinivalue_line("markers", "slow: multi-minute test (cold "
                            "compile in subprocesses); deselect with -m 'not slow'")


def pytest_collection_modifyitems(config, items):
    if _TPU_LANE:
        return
    skip = pytest.mark.skip(reason="real-TPU lane disabled (set NAS3D_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)

# Persistent compilation cache: supernet fwd+bwd graphs take ~minutes to
# compile on CPU; caching makes repeated suite runs fast.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
