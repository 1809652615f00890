"""Multi-host init ordering + rank-trimmed shardings (parallel/mesh.py).

`jax.distributed.initialize()` must run before ANY backend touch — even
`jax.process_count()` initializes and locks the local backend.  These tests
mock the boundary (a real multi-host launch needs a cluster) and assert the
call order contract that round-2's implementation violated.
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from nas_3d_unet_tpu.parallel.mesh import (
    make_mesh,
    maybe_initialize_distributed,
    put_batch,
    sharding_for_rank,
)


def test_noop_without_coordinator_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: called.append(True))
    maybe_initialize_distributed()
    assert not called


def test_initialize_called_before_backend_touch(monkeypatch):
    # env set, backend "not yet initialized": initialize() must be invoked,
    # and no backend-initializing call may precede it
    from jax._src import xla_bridge

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    order = []
    monkeypatch.setattr(xla_bridge, "backends_are_initialized",
                        lambda: (order.append("check"), False)[1])
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: order.append("init"))
    # guard: a backend probe before init would be the round-2 bug
    monkeypatch.setattr(jax, "process_count",
                        lambda: order.append("backend_touch") or 1)
    maybe_initialize_distributed()
    assert order == ["check", "init"]


def test_raises_when_backend_already_initialized(monkeypatch):
    # in the test process the CPU backend IS initialized (conftest), so the
    # real check fires: requesting multi-host init now must fail loudly
    # instead of silently running single-host
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    jax.devices()  # make certain the backend is up
    with pytest.raises(RuntimeError, match="already initialized"):
        maybe_initialize_distributed()


def test_idempotent_when_client_exists(monkeypatch):
    from jax._src import distributed as dist

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.setattr(dist.global_state, "client", object())
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: called.append(True))
    maybe_initialize_distributed()  # no raise, no re-init
    assert not called


# ---------------------------------------------------------------------------
# rank-trimmed shardings (class-mode labels are rank-4)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_sharding_for_rank_trims_spec():
    mesh = make_mesh()
    s5 = NamedSharding(mesh, P("data", None, None, None, None))
    s4 = sharding_for_rank(s5, 4)
    assert tuple(s4.spec) == ("data", None, None, None)
    assert sharding_for_rank(s5, 5) is s5
    assert sharding_for_rank(None, 4) is None


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_put_batch_mixed_ranks():
    # the ADVICE repro: rank-5 images + rank-4 int labels under one batch
    # sharding must place both (device_put with the full spec raises)
    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("data", None, None, None, None))
    x = np.zeros((8, 4, 4, 4, 4), np.float32)
    y = np.zeros((8, 4, 4, 4), np.int32)          # classes-mode labels
    xd, yd = put_batch((x, y), sharding)
    assert xd.sharding.is_equivalent_to(sharding, 5)
    assert tuple(yd.sharding.spec)[0] == "data"
