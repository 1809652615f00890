"""Step-exact pytree checkpointing with atomic writes.

The reference torch.save's dicts of weights/optimizer/epoch and supports
resume (SURVEY.md §5 checkpoint row).  Here a checkpoint is one msgpack file
(flax.serialization) holding the full training pytree — params, optimizer
state, step, RNG key, lr-controller state — written atomically
(tmp + os.replace) so a crash can never leave a torn file.  The RNG key is
part of the state, so resume is step-exact and parity-testable.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_CKPT_RE = re.compile(r"ckpt_(\d+)\.msgpack$")


def save_checkpoint(directory: str, step: int, state: Any, keep: int = 3,
                    metadata: Optional[dict] = None, best: bool = False) -> str:
    """Serialize `state` to directory/ckpt_{step}.msgpack atomically.

    `best=True` additionally publishes a stable `best.msgpack` copy.
    Host-local arrays only — callers must fully replicate / gather sharded
    state first (the train loop does).

    Multi-host: only process 0 writes (state is replicated, so every host
    holds identical bytes; concurrent writers to a shared filesystem would
    race on the tmp files and the prune).
    """
    if jax.process_index() != 0:
        return os.path.join(directory, f"ckpt_{step}.msgpack")
    os.makedirs(directory, exist_ok=True)
    state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    blob = serialization.to_bytes(state)
    path = os.path.join(directory, f"ckpt_{step}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)

    if metadata is not None:
        mtmp = os.path.join(directory, "metadata.json.tmp")
        with open(mtmp, "w") as f:
            json.dump({"step": step, **metadata}, f, indent=2)
        os.replace(mtmp, os.path.join(directory, "metadata.json"))

    if best:
        btmp = os.path.join(directory, "best.msgpack.tmp")
        with open(btmp, "wb") as f:
            f.write(blob)
        os.replace(btmp, os.path.join(directory, "best.msgpack"))

    # prune old step checkpoints (never the best copy)
    ckpts = sorted(_list_ckpts(directory))
    for s, p in ckpts[:-keep]:
        os.remove(p)
    return path


def _list_ckpts(directory: str):
    out = []
    for p in glob.glob(os.path.join(directory, "ckpt_*.msgpack")):
        m = _CKPT_RE.search(p)
        if m:
            out.append((int(m.group(1)), p))
    return out


def latest_checkpoint(directory: str) -> Optional[Tuple[int, str]]:
    ckpts = _list_ckpts(directory)
    return max(ckpts) if ckpts else None


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into a pytree of the same structure (`target` = template)."""
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(target, blob)
