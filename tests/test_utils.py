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


def test_metrics_logger_tensorboard_mirror(tmp_path):
    """SURVEY.md §5 metrics row: JSONL + optional TensorBoard mirror.

    Round-trips the scalars through the event files (not just existence):
    tags are <event>/<field>, step comes from the record."""
    tf = pytest.importorskip("tensorflow")
    tb_dir = str(tmp_path / "tb")
    log = MetricsLogger(str(tmp_path / "m.jsonl"), stdout=False, tb_dir=tb_dir)
    log.log(event="epoch", step=3, loss=1.25, note="skipped-non-numeric")
    log.close()

    seen = {}
    for ev_file in os.listdir(tb_dir):
        for raw in tf.data.TFRecordDataset(os.path.join(tb_dir, ev_file)):
            ev = tf.compat.v1.Event.FromString(raw.numpy())
            for v in ev.summary.value:
                seen[v.tag] = (ev.step, tf.make_ndarray(v.tensor).item()
                               if v.HasField("tensor") else v.simple_value)
    assert seen["epoch/loss"] == (3, 1.25)
    assert not any(tag.endswith("/note") for tag in seen)


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
