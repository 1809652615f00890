"""Tracing / profiling / numerics-debug hooks (SURVEY.md §5 aux subsystems).

The reference has no tracing beyond tqdm prints.  Here:
  * `trace(dir)` — context manager around `jax.profiler` emitting a
    TensorBoard-loadable trace of device activity.
  * `annotate(name)` — named scope that shows up inside traces.
  * `start_server(port)` — live profiler endpoint for capture-on-demand.
  * `debug_nans(enable)` — flips `jax_debug_nans` (re-runs offending ops
    de-optimized and raises at the op that produced the first NaN).
  * `log_compiles(enable)` — prints every XLA compilation (catches
    accidental recompilation in hot loops, the classic jit perf bug).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device trace under `log_dir` (TensorBoard: profile plugin)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def start_server(port: int = 9999):
    """Start the live profiler server (connect with TensorBoard capture)."""
    return jax.profiler.start_server(port)


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def log_compiles(enable: bool = True) -> None:
    jax.config.update("jax_log_compiles", enable)


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """Live/peak HBM usage for a device (empty dict if unsupported)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
