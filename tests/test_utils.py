"""Utility modules: profiling hooks, timing fences, logging."""

import json
import os

import jax
import jax.numpy as jnp
import pytest

from nas_3d_unet_tpu.utils.logging import MetricsLogger
from nas_3d_unet_tpu.utils.profiling import annotate, debug_nans, device_memory_stats, trace
from nas_3d_unet_tpu.utils.timing import fence, time_fn


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path, stdout=False)
    log.log(event="x", loss=1.5)
    log.log(event="y", dice_wt=0.9)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "x" and lines[0]["loss"] == 1.5
    assert "t" in lines[0]


def test_time_fn_and_fence():
    f = jax.jit(lambda x: x * 2 + 1)
    dt, out = time_fn(f, jnp.ones((8, 8)), iters=3, warmup=1)
    assert dt > 0
    assert fence(out) > 0


def test_trace_and_annotate(tmp_path):
    with trace(str(tmp_path / "prof")):
        with annotate("test_scope"):
            jax.block_until_ready(jnp.ones((4, 4)) @ jnp.ones((4, 4)))
    # trace directory written
    assert any(os.scandir(str(tmp_path / "prof")))


def test_debug_nans_catches():
    debug_nans(True)
    try:
        with pytest.raises(Exception):
            jax.jit(lambda x: jnp.log(x))(jnp.zeros(4) - 1.0).block_until_ready()
    finally:
        debug_nans(False)


def test_device_memory_stats_dict():
    assert isinstance(device_memory_stats(), dict)
