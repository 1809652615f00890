"""Supernet and derived cells (the DAG bodies of the U-shape).

The reference builds cells as small DAGs of N nodes; each node sums
MixedOp-transformed outputs of prior states, with down-sampling (encoder)
and up-sampling (decoder) variants (SURVEY.md §2 "MixedOp", "Cell").

Supernet MixedOp: out = Σ_o w_o · op_o(x) with w = softmax(α) computed once
per step outside the cell.  Two exactly-equivalent implementations:
  * merge_ops=True (default): source-major — per source state, each
    conv-family candidate runs ONCE as a k·C-wide op covering all k outgoing
    edges (independent kernel slices, GN groups aligned to the split),
    parameter-free candidates compute once per source, and `none` (exactly
    w·0) is skipped.  At small C this widens the MXU lane axis k-fold and
    cuts op/pad/relayout count (SURVEY.md §2a item 3, the XLA-level fused
    MixedOp).
  * merge_ops=False: literal per-edge MixedOp chain (equivalence oracle).
Per-cell AND per-edge/per-op `nn.remat` keep supernet activation memory
bounded (SURVEY.md §7 hard-part 2 — 128³ search fits one chip only with
edge-level remat).

Derived cells instantiate only the genotype-chosen op per edge, with exact
graph-level merging of edges that share (source, op) — see _merged_edges.

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

from ..ops.packed import PX, packed_resize2x, px_concat, standard_layout
from ..ops.primitives import (
    DOWN_OPS,
    NORMAL_OPS,
    UP_OPS,
    ConvNormAct,
    Pool,
    _gn_groups_for,
    make_op,
)
from .genotype import mid_index


def _cat(nodes):
    """Channel concat of node outputs (PX-aware)."""
    if isinstance(nodes[0], PX):
        return px_concat(nodes)
    return jnp.concatenate(nodes, axis=-1)


def _tr(t, r_target: int):
    """Normalize a packed edge output to the cell's packing factor (free
    reshape); no-op for plain arrays and matching factors."""
    if isinstance(t, PX) and t.layout.r != r_target:
        return t.repack(r_target)
    return t

# Ops whose output channels can be widened so several edges sharing the same
# (source, op) run as ONE op with EXACTLY equivalent math (independent kernel
# slices + GN groups aligned to the channel split).  Separable convs are
# excluded: merging would share the depthwise kernel, changing the model.
# Parameter-free ops gain nothing from merging.
_MERGEABLE = {"conv3", "dil_conv3", "down_conv3", "down_dil_conv3",
              "up_transpose", "up_conv3"}

# Parameter-free ops: identical output on every edge leaving a source, so the
# supernet computes them ONCE per source (exact dedup).  "none" is handled
# separately — its weighted contribution is exactly zero and is skipped.
_NONPARAM = {"identity", "avg_pool3", "max_pool3", "down_avg_pool",
             "down_max_pool"}

Array = jax.Array


# ---------------------------------------------------------------------------
# Partial-channel (PC-DARTS-style) candidate evaluation — search-time only.
#
# With pc_k = K > 1, each supernet edge sends only C/K channels through the
# candidate ops; the remaining (K−1)/K bypass (resolution-matched on
# down/up edges) and a channel shuffle remixes groups so successive edges
# sample different channels.  The bilevel step is aggregate-bandwidth-bound
# (PERF_NOTES round-5 closure), so streamed bytes — and step time — drop
# roughly ∝ 1/K.  K = 1 is exact reference DARTS semantics (every candidate
# scored on every channel).  Edge selection still parses top-2 edges by α
# (no PC-DARTS edge-normalization β); quality is gated by the same
# signal-vs-noise contrast harness as the full-channel search.
# ---------------------------------------------------------------------------


def _pc_shuffle(t, k: int):
    """PC-DARTS channel shuffle over k groups: out[i·k+g] = in[g·(c/k)+i].

    Packed: a ZERO-cost layout-metadata permutation (PX.permute_channels) —
    downstream packed ops consume arbitrary layouts via trace-time weight
    scatters.  Unpacked: reshape-transpose, fused by XLA into the consumer."""
    if isinstance(t, PX):
        c = t.layout.c
        cp = c // k
        perm = tuple((j % k) * cp + j // k for j in range(c))
        return t.permute_channels(perm)
    *lead, c = t.shape
    cp = c // k
    return t.reshape(*lead, k, cp).swapaxes(-2, -1).reshape(*lead, c)


def _pc_upsample2x(x):
    """Parameter-free trilinear 2× upsample (UpSampleConv's front half)."""
    if isinstance(x, PX):
        std = x.to_standard()
        y = packed_resize2x(std.data, std.layout)
        return PX(y, standard_layout(2 * std.layout.r, std.layout.c),
                  2 * std.w_in)
    b, d, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * d, 2 * h, 2 * w, c), method="trilinear")


def _pc_bypass(xb, op_names: Sequence[str]):
    """Resolution-match the bypassed channels to the candidate outputs:
    stride-2 max pool on DOWN edges (PC-DARTS' reduction-cell choice,
    realized with the registry's pool primitive), parameter-free 2×
    upsample on UP edges, identity on NORMAL edges."""
    if any(n.startswith("down_") for n in op_names):
        return Pool("max", 2)(xb)
    if any(n.startswith("up_") for n in op_names):
        return _pc_upsample2x(xb)
    return xb


def _pc_split(x, cp: int, c: int):
    """(active C/K slice, bypass slice)."""
    if isinstance(x, PX):
        return x.slice_channels(0, cp), x.slice_channels(cp, c - cp)
    return x[..., :cp], x[..., cp:]


class _SourceOps(nn.Module):
    """All outgoing supernet edges of one source state, source-major.

    Exact restructuring of per-edge MixedOps (the math is unchanged):
      * conv-family candidates (_MERGEABLE) run as ONE op with k·C output
        channels covering all k outgoing edges — independent kernel slices
        and GN groups aligned to the channel split (same trick as
        _merged_edges), so at small C the matmul N dimension (the MXU's
        128-lane axis) widens k-fold and k−1 ops' pad/relayout overhead
        disappears;
      * parameter-free candidates compute once per source (every edge would
        produce the identical tensor);
      * `none` contributes exactly w·0 = 0 and is skipped (its α still
        couples through the softmax normalization);
      * separable convs keep per-edge parameters (merging would share the
        depthwise kernel and change the model).

    This module is the remat unit (wrapped by _CellBase._super_source): its
    saved residuals are only the k C-channel edge contributions — the same
    footprint as round-1's per-edge MixedOp remat; candidate outputs
    (including the k·C-wide ones) live only transiently.
    """

    op_names: Sequence[str]
    features: int
    n_edges: int
    norm: str = "group"
    gn_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    pc_k: int = 1             # partial-channel fraction (1 = full channels)

    @nn.compact
    def __call__(self, x: Array, weights: Array) -> tuple:
        """weights: (k, n_ops) softmax(α) rows, one per outgoing edge.
        Returns the k edge contributions, in edge order.  With pc_k > 1 each
        contribution is shuffle(concat(Σ_o w_o·op_o(x_active), bypass)) —
        the bypass is computed ONCE per source (it is edge-independent)."""
        k, c = self.n_edges, self.features
        K = self.pc_k
        cp = c // K if K > 1 else c
        if K > 1:
            xa, xb = _pc_split(x, cp, c)
            xb = _pc_bypass(xb, self.op_names)
        else:
            xa = x
        outs: list = [None] * k

        def acc(e: int, term: Array) -> None:
            outs[e] = term if outs[e] is None else outs[e] + term

        def op(name: str, feat: int, groups: int) -> nn.Module:
            return make_op(name, feat, self.norm, groups, self.dtype,
                           self.use_pallas)

        for o, op_name in enumerate(self.op_names):
            if op_name == "none":
                continue
            if op_name in _NONPARAM:
                y = op(op_name, cp, self.gn_groups)(xa)
                for e in range(k):
                    acc(e, weights[e, o].astype(y.dtype) * y)
            elif op_name in _MERGEABLE:
                g_eff = (_gn_groups_for(cp, self.gn_groups)
                         if self.norm != "none" else self.gn_groups)
                wide = op(op_name, k * cp, k * g_eff)(xa)
                for e in range(k):
                    sl = (wide.slice_channels(e * cp, cp)
                          if isinstance(wide, PX)
                          else wide[..., e * cp:(e + 1) * cp])
                    acc(e, weights[e, o].astype(sl.dtype) * sl)
            else:  # per-edge parameters (separable convs)
                for e in range(k):
                    y = op(op_name, cp, self.gn_groups)(xa)
                    acc(e, weights[e, o].astype(y.dtype) * y)
        if K > 1:
            outs = [_pc_shuffle(_cat([t, xb]), K) for t in outs]
        return tuple(outs)


class MixedOp(nn.Module):
    """Softmax-weighted sum over a candidate op set (weights precomputed)."""

    features: int
    op_names: Sequence[str]
    norm: str = "group"
    gn_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    pc_k: int = 1             # partial-channel fraction (1 = full channels)

    @nn.compact
    def __call__(self, x: Array, weights: Array) -> Array:
        # Weighted sum written as a chain of multiply-adds (NOT stack +
        # tensordot): XLA then fuses each w_o·op_o(x) into the producing
        # op's epilogue instead of materializing an (O, B, D, H, W, C)
        # buffer — the supernet's dominant activation-memory term
        # (SURVEY.md §7 hard-part 2).
        K = self.pc_k
        c = self.features
        cp = c // K if K > 1 else c
        if K > 1:
            x, xb = _pc_split(x, cp, c)
            xb = _pc_bypass(xb, self.op_names)
        acc = None
        for o, name in enumerate(self.op_names):
            out = make_op(name, cp, self.norm, self.gn_groups,
                          self.dtype, self.use_pallas)(x)
            term = weights[o].astype(out.dtype) * out
            acc = term if acc is None else acc + term
        if K > 1:
            return _pc_shuffle(_cat([acc, xb]), K)
        return acc


class _CellBase(nn.Module):
    features: int
    n_nodes: int
    norm: str = "group"
    gn_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    merge_ops: bool = False
    remat_edges: bool = False  # supernet: remat each MixedOp (peak-memory cap)
    pc_k: int = 1              # supernet partial-channel fraction (search only)

    def _pre(self, x: Array, stride: int = 1) -> Array:
        """1³ conv projection of a cell input to `features` channels."""
        return ConvNormAct(self.features, 1, stride, 1, 1, self.norm,
                           self.gn_groups, self.dtype)(x)

    def _mixed(self, ops: Sequence[str]) -> nn.Module:
        # Always remat-wrap so the param tree is flag-independent; when
        # disabled the everything-saveable policy makes it a memory no-op.
        # Edge-level remat nests inside the cell-level remat: the supernet
        # evaluates EVERY candidate op per edge, and without it a cell's
        # backward rematerializes all edges' op outputs at once (OOM at
        # 128³ — SURVEY.md §7 hard-part 2).
        policy = None if self.remat_edges else jax.checkpoint_policies.everything_saveable
        Wrapped = nn.remat(MixedOp, policy=policy)
        return Wrapped(self.features, ops, self.norm, self.gn_groups, self.dtype,
                       self.use_pallas, self.pc_k)

    def _fixed(self, op_name: str) -> nn.Module:
        return make_op(op_name, self.features, self.norm, self.gn_groups,
                       self.dtype, self.use_pallas)

    def _super_source(self, x: Array, src_name: str, op_names: Sequence[str],
                      weight_rows: Sequence[Array]) -> list:
        """Remat-wrapped _SourceOps over one source's outgoing edges.

        `weight_rows[e]` is the softmax(α) row of the e-th outgoing edge.
        Returns the per-edge weighted-sum contributions, in edge order.
        The remat boundary sits around the WHOLE source (not per candidate
        op) so only the k C-channel contributions persist as residuals —
        per-op remat would save every k·C-wide candidate output and OOM at
        128³ (measured: 24.3 GiB vs the 15.75 GiB HBM).
        """
        policy = None if self.remat_edges else jax.checkpoint_policies.everything_saveable
        Wrapped = nn.remat(_SourceOps, policy=policy)
        mod = Wrapped(op_names, self.features, len(weight_rows), self.norm,
                      self.gn_groups, self.dtype, self.use_pallas, self.pc_k,
                      name=f"src_{src_name}")
        return list(mod(x, jnp.stack(weight_rows)))

    def _merged_edges(self, gene):
        """Graph-level op merging (TPU lane-utilisation optimization).

        Edges that share (source state, op name) are computed as ONE op with
        k·C output channels, then split — mathematically identical to k
        separate ops because (a) the conv kernels are independent slices of
        the wider kernel and (b) GroupNorm groups are scaled k× so every
        group stays inside one edge's channel block.  At small C this k-fold
        widens the matmul N dimension (the MXU's 128-lane axis), and each
        merge removes one op's pad/relayout overhead.  Enabled via
        merge_ops; k==1 groups take the ordinary path.

        Returns {(src, op): chunk-iterator} for groups with k >= 2.
        """
        from collections import Counter

        counts = Counter()
        for node_gene in gene:
            for src, op_name in node_gene:
                if op_name in _MERGEABLE:
                    counts[(src, op_name)] += 1

        merged = {}
        c = self.features
        g_eff = _gn_groups_for(c, self.gn_groups) if self.norm != "none" else self.gn_groups
        for (src, op_name), k in counts.items():
            if k < 2:
                continue
            op = make_op(op_name, k * c, self.norm, k * g_eff,
                         self.dtype, self.use_pallas)
            merged[(src, op_name)] = {"op": op, "next": 0, "out": None}
        return merged

    def _edge(self, merged, states, src: str, op_name: str) -> Array:
        key = (src, op_name)
        if key not in merged:
            return self._fixed(op_name)(states[src])
        slot = merged[key]
        if slot["out"] is None:
            slot["out"] = slot["op"](states[src])  # one wide op, computed once
        c = self.features
        i = slot["next"]
        slot["next"] += 1
        out = slot["out"]
        if isinstance(out, PX):
            return out.slice_channels(i * c, c)
        return out[..., i * c:(i + 1) * c]


class SuperDownCell(_CellBase):
    """Encoder supernet cell: stride-2 DOWN_OPS input edges, NORMAL mid edges.

    merge_ops=True (default via SuperNet) computes edges source-major via
    _super_source — exactly equivalent to the per-edge MixedOp path but with
    k-fold wider convs and deduped parameter-free ops.
    """

    @nn.compact
    def __call__(self, s0: Array, s1: Array, w_in: Array, w_mid: Array) -> Array:
        s0 = self._pre(s0, stride=2 if s0.shape[1] != s1.shape[1] else 1)
        s1 = self._pre(s1, stride=1)
        n = self.n_nodes
        if not self.merge_ops:  # reference per-edge path (equivalence oracle)
            nodes = []
            for i in range(n):
                acc = self._mixed(DOWN_OPS)(s0, w_in[2 * i])
                acc = acc + self._mixed(DOWN_OPS)(s1, w_in[2 * i + 1])
                for j in range(i):
                    acc = acc + self._mixed(NORMAL_OPS)(nodes[j], w_mid[mid_index(i, j)])
                nodes.append(acc)
            return _cat(nodes)

        accs: list = [None] * n

        def add(i: int, t: Array) -> None:
            accs[i] = t if accs[i] is None else accs[i] + t

        for e, t in enumerate(self._super_source(
                s0, "in0", DOWN_OPS, [w_in[2 * i] for i in range(n)])):
            add(e, t)
        for e, t in enumerate(self._super_source(
                s1, "in1", DOWN_OPS, [w_in[2 * i + 1] for i in range(n)])):
            add(e, t)
        nodes = []
        for j in range(n):
            node = accs[j]  # complete: sources are in0/in1 and n_<j
            nodes.append(node)
            tgts = list(range(j + 1, n))
            if tgts:
                rows = [w_mid[mid_index(i, j)] for i in tgts]
                for i, t in zip(tgts, self._super_source(node, f"n{j}",
                                                         NORMAL_OPS, rows)):
                    add(i, t)
        return _cat(nodes)


class SuperUpCell(_CellBase):
    """Decoder supernet cell: UP_OPS edges from `below`, NORMAL from `skip`.

    Same source-major merging as SuperDownCell under merge_ops=True.
    """

    @nn.compact
    def __call__(self, skip: Array, below: Array, w_skip: Array,
                 w_below: Array, w_mid: Array) -> Array:
        skip = self._pre(skip, stride=1)
        below = self._pre(below, stride=1)  # still at R/2; UP edges upsample
        r_cell = skip.layout.r if isinstance(skip, PX) else None
        n = self.n_nodes
        if not self.merge_ops:  # reference per-edge path (equivalence oracle)
            nodes = []
            for i in range(n):
                acc = self._mixed(UP_OPS)(below, w_below[i])
                if r_cell is not None:
                    acc = _tr(acc, r_cell)
                acc = acc + self._mixed(NORMAL_OPS)(skip, w_skip[i])
                for j in range(i):
                    acc = acc + self._mixed(NORMAL_OPS)(nodes[j], w_mid[mid_index(i, j)])
                nodes.append(acc)
            return _cat(nodes)

        accs: list = [None] * n

        def add(i: int, t: Array) -> None:
            if r_cell is not None:
                t = _tr(t, r_cell)
            accs[i] = t if accs[i] is None else accs[i] + t

        for e, t in enumerate(self._super_source(
                below, "below", UP_OPS, [w_below[i] for i in range(n)])):
            add(e, t)
        for e, t in enumerate(self._super_source(
                skip, "skip", NORMAL_OPS, [w_skip[i] for i in range(n)])):
            add(e, t)
        nodes = []
        for j in range(n):
            node = accs[j]
            nodes.append(node)
            tgts = list(range(j + 1, n))
            if tgts:
                rows = [w_mid[mid_index(i, j)] for i in tgts]
                for i, t in zip(tgts, self._super_source(node, f"n{j}",
                                                         NORMAL_OPS, rows)):
                    add(i, t)
        return _cat(nodes)


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
        merged = self._merged_edges(self.gene) if self.merge_ops else {}
        nodes = []
        for i, node_gene in enumerate(self.gene):
            acc = None
            for src, op_name in node_gene:
                y = self._edge(merged, states, src, op_name)
                acc = y if acc is None else acc + y
            states[f"n{i}"] = acc
            nodes.append(acc)
        return _cat(nodes)


class DerivedUpCell(_CellBase):
    """Decoder cell with genotype-fixed edges.

    `gene` srcs ∈ {"skip","below","n{j}"}; edges from "below" use UP ops so
    every path from the R/2 input is upsampled to R.
    """

    gene: Tuple[Tuple[Tuple[str, str], ...], ...] = ()

    @nn.compact
    def __call__(self, skip: Array, below: Array) -> Array:
        states = {"skip": self._pre(skip, 1), "below": self._pre(below, 1)}
        r_cell = (states["skip"].layout.r
                  if isinstance(states["skip"], PX) else None)
        merged = self._merged_edges(self.gene) if self.merge_ops else {}
        nodes = []
        for i, node_gene in enumerate(self.gene):
            acc = None
            for src, op_name in node_gene:
                y = self._edge(merged, states, src, op_name)
                if r_cell is not None:
                    y = _tr(y, r_cell)
                acc = y if acc is None else acc + y
            states[f"n{i}"] = acc
            nodes.append(acc)
        return _cat(nodes)
