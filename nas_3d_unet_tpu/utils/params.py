"""Parameter counting (reference helper.py `calc_param_size`, SURVEY.md §2)."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def count_params(tree: Any) -> int:
    """Total scalar parameter count of a pytree."""
    return int(sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(tree)
                   if hasattr(l, "shape")))


def param_size_mb(tree: Any) -> float:
    """Parameter size in MB (using each leaf's actual dtype)."""
    total = sum(np.prod(l.shape) * l.dtype.itemsize
                for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "shape"))
    return float(total) / 2**20
