"""Supernet and derived cells (the DAG bodies of the U-shape).

The reference builds cells as small DAGs of N nodes; each node sums
MixedOp-transformed outputs of prior states, with down-sampling (encoder)
and up-sampling (decoder) variants (SURVEY.md §2 "MixedOp", "Cell").

Supernet MixedOp: out = Σ_o w_o · op_o(x) with w = softmax(α) computed once
per step outside the cell.  Implemented as a stack + tensordot so XLA fuses
the weighted combine; per-cell `jax.checkpoint` (remat) keeps supernet
activation memory bounded (SURVEY.md §7 hard-part 2).

Derived cells instantiate only the genotype-chosen op per edge.

Resolution contract:
  SuperDownCell / DerivedDownCell: inputs s0, s1 → output at half s1's res.
    (s0 may be one level above s1; its 1³ preprocess conv then uses stride 2.)
  SuperUpCell / DerivedUpCell: skip at R, below at R/2 → output at R.
Channel contract: every state inside a cell carries `features` channels;
cell output concatenates the N node outputs → N·features channels.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.primitives import DOWN_OPS, NORMAL_OPS, UP_OPS, ConvNormAct, make_op
from .genotype import mid_index

Array = jax.Array


class MixedOp(nn.Module):
    """Softmax-weighted sum over a candidate op set (weights precomputed)."""

    features: int
    op_names: Sequence[str]
    norm: str = "group"
    gn_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, weights: Array) -> Array:
        # Weighted sum written as a chain of multiply-adds (NOT stack +
        # tensordot): XLA then fuses each w_o·op_o(x) into the producing
        # op's epilogue instead of materializing an (O, B, D, H, W, C)
        # buffer — the supernet's dominant activation-memory term
        # (SURVEY.md §7 hard-part 2).
        acc = None
        for o, name in enumerate(self.op_names):
            out = make_op(name, self.features, self.norm, self.gn_groups,
                          self.dtype, self.use_pallas)(x)
            term = weights[o].astype(out.dtype) * out
            acc = term if acc is None else acc + term
        return acc


class _CellBase(nn.Module):
    features: int
    n_nodes: int
    norm: str = "group"
    gn_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def _pre(self, x: Array, stride: int = 1) -> Array:
        """1³ conv projection of a cell input to `features` channels."""
        return ConvNormAct(self.features, 1, stride, 1, 1, self.norm,
                           self.gn_groups, self.dtype)(x)

    def _mixed(self, ops: Sequence[str]) -> "MixedOp":
        return MixedOp(self.features, ops, self.norm, self.gn_groups, self.dtype,
                       self.use_pallas)

    def _fixed(self, op_name: str) -> nn.Module:
        return make_op(op_name, self.features, self.norm, self.gn_groups,
                       self.dtype, self.use_pallas)


class SuperDownCell(_CellBase):
    """Encoder supernet cell: stride-2 DOWN_OPS input edges, NORMAL mid edges."""

    @nn.compact
    def __call__(self, s0: Array, s1: Array, w_in: Array, w_mid: Array) -> Array:
        s0 = self._pre(s0, stride=2 if s0.shape[1] != s1.shape[1] else 1)
        s1 = self._pre(s1, stride=1)
        nodes = []
        for i in range(self.n_nodes):
            acc = self._mixed(DOWN_OPS)(s0, w_in[2 * i])
            acc = acc + self._mixed(DOWN_OPS)(s1, w_in[2 * i + 1])
            for j in range(i):
                acc = acc + self._mixed(NORMAL_OPS)(nodes[j], w_mid[mid_index(i, j)])
            nodes.append(acc)
        return jnp.concatenate(nodes, axis=-1)


class SuperUpCell(_CellBase):
    """Decoder supernet cell: UP_OPS edges from `below`, NORMAL from `skip`."""

    @nn.compact
    def __call__(self, skip: Array, below: Array, w_skip: Array,
                 w_below: Array, w_mid: Array) -> Array:
        skip = self._pre(skip, stride=1)
        below = self._pre(below, stride=1)  # still at R/2; UP edges upsample
        nodes = []
        for i in range(self.n_nodes):
            acc = self._mixed(UP_OPS)(below, w_below[i])
            acc = acc + self._mixed(NORMAL_OPS)(skip, w_skip[i])
            for j in range(i):
                acc = acc + self._mixed(NORMAL_OPS)(nodes[j], w_mid[mid_index(i, j)])
            nodes.append(acc)
        return jnp.concatenate(nodes, axis=-1)


class DerivedDownCell(_CellBase):
    """Encoder cell with genotype-fixed edges.

    `gene`: per node, tuple of (src, op) with src ∈ {"in0","in1","n{j}"}.
    """

    gene: Tuple[Tuple[Tuple[str, str], ...], ...] = ()

    @nn.compact
    def __call__(self, s0: Array, s1: Array) -> Array:
        s0 = self._pre(s0, stride=2 if s0.shape[1] != s1.shape[1] else 1)
        s1 = self._pre(s1, stride=1)
        states = {"in0": s0, "in1": s1}
        nodes = []
        for i, node_gene in enumerate(self.gene):
            acc = None
            for src, op_name in node_gene:
                y = self._fixed(op_name)(states[src])
                acc = y if acc is None else acc + y
            states[f"n{i}"] = acc
            nodes.append(acc)
        return jnp.concatenate(nodes, axis=-1)


class DerivedUpCell(_CellBase):
    """Decoder cell with genotype-fixed edges.

    `gene` srcs ∈ {"skip","below","n{j}"}; edges from "below" use UP ops so
    every path from the R/2 input is upsampled to R.
    """

    gene: Tuple[Tuple[Tuple[str, str], ...], ...] = ()

    @nn.compact
    def __call__(self, skip: Array, below: Array) -> Array:
        states = {"skip": self._pre(skip, 1), "below": self._pre(below, 1)}
        nodes = []
        for i, node_gene in enumerate(self.gene):
            acc = None
            for src, op_name in node_gene:
                y = self._fixed(op_name)(states[src])
                acc = y if acc is None else acc + y
            states[f"n{i}"] = acc
            nodes.append(acc)
        return jnp.concatenate(nodes, axis=-1)
