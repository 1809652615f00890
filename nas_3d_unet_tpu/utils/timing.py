"""Timing that actually fences device work.

On the remote-TPU ("axon") platform in this environment,
``jax.block_until_ready`` can report buffers ready before the device work
has completed, which silently turns benchmarks into dispatch-latency
measurements (observed: a 476 ms train step "measured" at 2.5 ms).  The
only reliable fence is a host readback of a value that data-depends on the
computation.  Every benchmark in this repo must use ``fence`` / ``time_fn``.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


def fence(tree: Any) -> float:
    """Force completion of everything `tree` depends on; returns a checksum."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    acc = jnp.float32(0)
    for l in leaves[:4]:  # a few leaves suffice — they share the dependency chain
        acc = acc + jnp.sum(jnp.abs(l[(0,) * (l.ndim - 1)]).astype(jnp.float32))
    return float(acc)  # host readback = real fence


def time_fn(f: Callable, *args, iters: int = 10, warmup: int = 2) -> Tuple[float, Any]:
    """Mean seconds per call of `f(*args)`, fenced by value readback."""
    out = None
    for _ in range(warmup):
        out = f(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, out


def time_step_chain(step: Callable, state: Any, *batch, iters: int = 10,
                    warmup: int = 3) -> Tuple[float, Any]:
    """Time a donated-state training step by chaining `iters` steps."""
    metrics = None
    for _ in range(warmup):
        state, metrics = step(state, *batch)
    fence(metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, *batch)
    fence(metrics)
    dt = (time.perf_counter() - t0) / iters
    return dt, state
