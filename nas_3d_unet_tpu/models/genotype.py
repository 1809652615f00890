"""Architecture parameters (α) and their discrete decode (genotype).

The reference holds one α tensor per cell type (down/up), decodes the final
architecture with an argmax/top-k parse, and pickles the resulting genotype
for the derived trainer (SURVEY.md §2 "Supernet", "Genotype").  Here the
genotype is a plain JSON document (pickle is unsafe and non-portable) and α
is a pytree of small fp32 tensors that rides along in the jitted search step.

Edge bookkeeping for a cell with N intermediate nodes:
  down cell   states: in0, in1 (both spatial res R) → nodes at R/2.
              * input edges  (2·N): node i ← {in0, in1}, ops from DOWN_OPS
              * mid edges (N·(N−1)/2): node i ← node j<i, ops from NORMAL_OPS
  up cell     states: skip (res R, encoder), below (res R/2, decoder).
              * below edges (N): node i ← below, ops from UP_OPS (2× upsample)
              * skip edges  (N): node i ← skip, ops from NORMAL_OPS
              * mid edges (N·(N−1)/2): NORMAL_OPS
Mid-edge flat index for (node i ← node j): i·(i−1)/2 + j.

α is shared across all cells of the same kind, as in the reference.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.primitives import DOWN_OPS, NORMAL_OPS, UP_OPS

Alphas = Dict[str, jax.Array]

# Edges per node are capped at 2 in the decoded architecture (DARTS-style).
EDGES_PER_NODE = 2


def mid_index(i: int, j: int) -> int:
    """Flat index of the mid edge node_i ← node_j (j < i)."""
    return i * (i - 1) // 2 + j


def num_mid_edges(n_nodes: int) -> int:
    return n_nodes * (n_nodes - 1) // 2


def alpha_shapes(n_nodes: int) -> Dict[str, Tuple[int, int]]:
    m = num_mid_edges(n_nodes)
    return {
        "down_in": (2 * n_nodes, len(DOWN_OPS)),
        "down_mid": (m, len(NORMAL_OPS)),
        "up_below": (n_nodes, len(UP_OPS)),
        "up_skip": (n_nodes, len(NORMAL_OPS)),
        "up_mid": (m, len(NORMAL_OPS)),
    }


def init_alphas(rng: jax.Array, n_nodes: int, scale: float = 1e-3) -> Alphas:
    """Near-uniform init: small gaussian logits, as in DARTS."""
    shapes = alpha_shapes(n_nodes)
    keys = jax.random.split(rng, len(shapes))
    return {
        name: scale * jax.random.normal(k, shape, dtype=jnp.float32)
        for (name, shape), k in zip(sorted(shapes.items()), keys)
    }


@dataclass(frozen=True)
class Genotype:
    """Decoded architecture: per cell kind, per node, the chosen (src, op) pairs.

    Sources: down cell — "in0" | "in1" | "n{j}";  up cell — "skip" | "below" | "n{j}".
    """

    n_nodes: int
    down: Tuple[Tuple[Tuple[str, str], ...], ...]
    up: Tuple[Tuple[Tuple[str, str], ...], ...]

    def to_json(self) -> str:
        return json.dumps(
            {"n_nodes": self.n_nodes,
             "down": [[list(e) for e in node] for node in self.down],
             "up": [[list(e) for e in node] for node in self.up]},
            indent=2,
        )

    @staticmethod
    def from_json(text: str) -> "Genotype":
        raw = json.loads(text)
        to_tup = lambda nodes: tuple(tuple((str(s), str(o)) for s, o in node) for node in nodes)
        return Genotype(n_nodes=int(raw["n_nodes"]), down=to_tup(raw["down"]), up=to_tup(raw["up"]))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @staticmethod
    def load(path: str) -> "Genotype":
        with open(path) as f:
            return Genotype.from_json(f.read())

    def validate(self) -> None:
        for kind, nodes, in_srcs, in_ops in (
            ("down", self.down, ("in0", "in1"), DOWN_OPS),
            ("up", self.up, ("skip", "below"), None),
        ):
            if len(nodes) != self.n_nodes:
                raise ValueError(f"{kind}: expected {self.n_nodes} nodes")
            for i, node in enumerate(nodes):
                if len(node) != EDGES_PER_NODE:
                    raise ValueError(f"{kind} node {i}: expected {EDGES_PER_NODE} edges")
                srcs = [s for s, _ in node]
                if len(set(srcs)) != len(srcs):
                    raise ValueError(f"{kind} node {i}: duplicate sources {srcs}")
                for src, op in node:
                    if src.startswith("n"):
                        j = int(src[1:])
                        if not 0 <= j < i:
                            raise ValueError(f"{kind} node {i}: bad source {src}")
                        if op not in NORMAL_OPS:
                            raise ValueError(f"{kind} node {i}: {op} not a normal op")
                    elif kind == "down":
                        if src not in in_srcs or op not in DOWN_OPS:
                            raise ValueError(f"down node {i}: bad edge ({src}, {op})")
                    else:
                        if src == "skip" and op not in NORMAL_OPS:
                            raise ValueError(f"up node {i}: skip edge op {op} not normal")
                        if src == "below" and op not in UP_OPS:
                            raise ValueError(f"up node {i}: below edge op {op} not an up op")
                        if src not in in_srcs:
                            raise ValueError(f"up node {i}: bad source {src}")


def default_genotype(n_nodes: int = 3) -> Genotype:
    """A sensible hand-written architecture (used as the flagship derived net
    when no search has been run; conv-dominated so benchmarks measure the
    MXU path).  Node 0 reads both inputs; node i>0 reads input 0 and the
    previous node."""
    down = []
    up = []
    for i in range(n_nodes):
        if i == 0:
            down.append((("in0", "down_conv3"), ("in1", "down_sep_conv3")))
            up.append((("below", "up_transpose"), ("skip", "conv3")))
        else:
            down.append((("in1", "down_conv3"), (f"n{i-1}", "conv3")))
            up.append((("skip", "sep_conv3"), (f"n{i-1}", "conv3")))
    g = Genotype(n_nodes=n_nodes, down=tuple(down), up=tuple(up))
    g.validate()
    return g


def _edge_strength(row: np.ndarray, op_names, exclude_none: bool) -> Tuple[float, str]:
    """(score, best_op) for one edge: softmax over its op set, 'none' excluded."""
    probs = np.exp(row - row.max())
    probs /= probs.sum()
    best_score, best_op = -1.0, op_names[0]
    for k, name in enumerate(op_names):
        if exclude_none and name == "none":
            continue
        if probs[k] > best_score:
            best_score, best_op = float(probs[k]), name
    return best_score, best_op


def parse_alphas(alphas: Alphas, n_nodes: int) -> Genotype:
    """Decode α → genotype: per node keep the top-2 strongest incoming edges,
    each labelled with its argmax non-`none` op (the DARTS parse the
    reference uses — SURVEY.md §2 "Genotype")."""
    a = {k: np.asarray(v, dtype=np.float64) for k, v in alphas.items()}

    down_nodes: List[Tuple[Tuple[str, str], ...]] = []
    for i in range(n_nodes):
        cands = []
        for k, src in enumerate(("in0", "in1")):
            s, op = _edge_strength(a["down_in"][2 * i + k], DOWN_OPS, False)
            cands.append((src, op, s))
        for j in range(i):
            s, op = _edge_strength(a["down_mid"][mid_index(i, j)], NORMAL_OPS, True)
            cands.append((f"n{j}", op, s))
        cands.sort(key=lambda t: -t[2])
        down_nodes.append(tuple((src, op) for src, op, _ in cands[:EDGES_PER_NODE]))

    up_nodes: List[Tuple[Tuple[str, str], ...]] = []
    for i in range(n_nodes):
        s_skip, op_skip = _edge_strength(a["up_skip"][i], NORMAL_OPS, True)
        s_below, op_below = _edge_strength(a["up_below"][i], UP_OPS, False)
        cands = [("skip", op_skip, s_skip), ("below", op_below, s_below)]
        for j in range(i):
            s, op = _edge_strength(a["up_mid"][mid_index(i, j)], NORMAL_OPS, True)
            cands.append((f"n{j}", op, s))
        cands.sort(key=lambda t: -t[2])
        up_nodes.append(tuple((src, op) for src, op, _ in cands[:EDGES_PER_NODE]))

    g = Genotype(n_nodes=n_nodes, down=tuple(down_nodes), up=tuple(up_nodes))
    g.validate()
    return g
