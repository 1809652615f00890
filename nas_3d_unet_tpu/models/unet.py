"""U-shaped supernet and derived network.

Reference topology (SURVEY.md §2 "Supernet", §3.5): stem conv → L down cells
→ L up cells with encoder-decoder skip connections → 1³ head conv → region
logits.  α is shared across cells of the same kind.

TPU-first choices:
  * channels-last (B, D, H, W, C); activations in `dtype` (bf16 by default
    for training), params and head logits in fp32.
  * per-cell `nn.remat` bounds supernet memory (every candidate op executes
    on every edge — SURVEY.md §7 hard-part 2).
  * channel plan: node channels double per level (c·2^l); cell output is
    N·c_l, so spatial shrink ×8 vs channel growth ×2 keeps FLOPs pyramidal
    and MXU-tiles full at depth.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.packed import PX
from ..ops.primitives import ConvNormAct, PackedConvK
from .cell import DerivedDownCell, DerivedUpCell, SuperDownCell, SuperUpCell
from .genotype import Genotype

Array = jax.Array


def _dtype_of(name: str) -> jnp.dtype:
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


class _UNetBase(nn.Module):
    in_channels: int = 4
    num_classes: int = 3
    base_channels: int = 16
    depth: int = 3
    n_nodes: int = 3
    norm: str = "group"
    gn_groups: int = 8
    dtype_name: str = "float32"
    remat: bool = True
    # supernet edge-level remat; None -> follow `remat`.  Packed 64-cubed
    # searches fit HBM with remat fully off (6.9x faster); 128-cubed needs
    # at least edge remat (measured OOM at 20.9G/15.75G without).
    remat_edges: bool | None = None
    use_pallas: bool = False
    merge_ops: bool = True    # exact graph-level op merging (derived + supernet)
    packed: bool = False      # lane-packed execution (ops/packed.py)
    # Return head logits still packed (a PX) instead of (B,D,H,W,K).  The
    # training loss consumes the packed form directly (metrics/dice.py
    # _dice_ce_loss_packed) — the unpacked K=3 head tensor tiles at 3/128
    # lanes, so materializing it costs ~42× its logical bytes per pass.
    # Inference/eval keep the default (unpacked) contract.  Params are
    # identical across the flag.
    unpack_head: bool = True

    @property
    def compute_dtype(self) -> jnp.dtype:
        return _dtype_of(self.dtype_name)

    def _remat(self, cls):
        # Always wrap in nn.remat so the param tree is independent of the
        # remat flag (checkpoints stay loadable); remat=False keeps all
        # residuals via policy, making the wrapper a memory no-op.
        policy = None if self.remat else jax.checkpoint_policies.everything_saveable
        return nn.remat(cls, policy=policy)

    def _stem(self, x: Array) -> Array:
        return ConvNormAct(self.n_nodes * self.base_channels, 3, 1, 1, 1,
                           self.norm, self.gn_groups, self.compute_dtype)(x)

    def _pack_input(self, x: Array) -> "PX":
        """Choose the level-0 packing factor: the largest r ∈ {8,4,2,1}
        such that every level's W is divisible by its r_l = r >> l."""
        w = x.shape[3]
        r0 = 8
        while r0 > 1:
            ok = all((w >> l) % max(1, r0 >> l) == 0 and (w >> l) > 0
                     for l in range(self.depth + 1))
            if ok:
                break
            r0 //= 2
        return PX.pack(x, r0)

    def _head(self, x) -> Array:
        # head in fp32: logits feed the fp32 loss / stitching paths
        x = x.astype(jnp.float32)
        if isinstance(x, PX):
            # name matches nn.Conv's auto-name so the param tree (and the
            # name-derived init RNG stream) is identical across the flag
            y = PackedConvK(self.num_classes, 1, 1, 1, jnp.float32,
                            use_bias=True, name="Conv_0")(x)
            return y.unpack() if self.unpack_head else y.to_standard()
        return nn.Conv(self.num_classes, (1, 1, 1), padding="SAME",
                       dtype=jnp.float32, param_dtype=jnp.float32)(x)

    def _cell_kwargs(self, level: int) -> Dict[str, Any]:
        return dict(
            features=self.base_channels * (2 ** level),
            n_nodes=self.n_nodes,
            norm=self.norm,
            gn_groups=self.gn_groups,
            dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
        )

    def _derived_cell_kwargs(self, level: int) -> Dict[str, Any]:
        kw = self._cell_kwargs(level)
        kw["merge_ops"] = self.merge_ops
        return kw


class SuperNet(_UNetBase):
    """DARTS supernet: forward takes architecture weights (softmaxed α).

    pc_k > 1 enables PC-DARTS-style partial-channel candidate evaluation
    (models/cell.py module docstring): C/pc_k channels per edge through the
    candidate ops, the rest bypassed + channel-shuffled.  Search-time only —
    derived nets are rebuilt from the genotype at full channels."""

    pc_k: int = 1

    @nn.compact
    def __call__(self, x: Array, arch_weights: Dict[str, Array]) -> Array:
        if self.pc_k > 1 and self.base_channels % self.pc_k:
            raise ValueError(
                f"partial_channels={self.pc_k} must divide "
                f"base_channels={self.base_channels}")
        w = arch_weights
        x = x.astype(self.compute_dtype)
        if self.packed:
            x = self._pack_input(x)
        stem = self._stem(x)

        Down = self._remat(SuperDownCell)
        Up = self._remat(SuperUpCell)
        redges = self.remat if self.remat_edges is None else self.remat_edges

        feats = [stem]
        s_pp, s_p = stem, stem
        for level in range(1, self.depth + 1):
            out = Down(remat_edges=redges, merge_ops=self.merge_ops,
                       pc_k=self.pc_k, **self._cell_kwargs(level))(
                s_pp, s_p, w["down_in"], w["down_mid"])
            s_pp, s_p = s_p, out
            feats.append(out)

        below = feats[-1]
        for level in range(self.depth - 1, -1, -1):
            below = Up(remat_edges=redges, merge_ops=self.merge_ops,
                       pc_k=self.pc_k, **self._cell_kwargs(level))(
                feats[level], below, w["up_skip"], w["up_below"], w["up_mid"])

        return self._head(below)


class DerivedNet(_UNetBase):
    """Fixed-architecture network rebuilt from a genotype (SURVEY.md §2
    "Derived net"): same U-shape, each MixedOp replaced by its chosen op."""

    genotype: Genotype = None  # required

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.genotype
        x = x.astype(self.compute_dtype)
        if self.packed:
            x = self._pack_input(x)
        stem = self._stem(x)

        Down = self._remat(DerivedDownCell)
        Up = self._remat(DerivedUpCell)

        feats = [stem]
        s_pp, s_p = stem, stem
        for level in range(1, self.depth + 1):
            out = Down(gene=g.down, **self._derived_cell_kwargs(level))(s_pp, s_p)
            s_pp, s_p = s_p, out
            feats.append(out)

        below = feats[-1]
        for level in range(self.depth - 1, -1, -1):
            below = Up(gene=g.up, **self._derived_cell_kwargs(level))(feats[level], below)

        return self._head(below)


def arch_weights_from_alphas(alphas: Dict[str, Array]) -> Dict[str, Array]:
    """softmax over the op axis of every α tensor (fp32)."""
    return {k: jax.nn.softmax(v.astype(jnp.float32), axis=-1) for k, v in alphas.items()}


def make_supernet(model_cfg, num_classes: int) -> SuperNet:
    return SuperNet(
        in_channels=model_cfg.in_channels,
        num_classes=num_classes,
        base_channels=model_cfg.base_channels,
        depth=model_cfg.depth,
        n_nodes=model_cfg.n_nodes,
        norm=model_cfg.norm,
        gn_groups=model_cfg.gn_groups,
        dtype_name=model_cfg.dtype,
        remat=model_cfg.remat,
        remat_edges=getattr(model_cfg, "remat_edges", None),
        use_pallas=model_cfg.use_pallas,
        merge_ops=getattr(model_cfg, "merge_ops", True),
        packed=getattr(model_cfg, "packed", False),
    )


def make_derived(model_cfg, num_classes: int, genotype: Genotype,
                 dtype_override: str | None = None) -> DerivedNet:
    return DerivedNet(
        genotype=genotype,
        in_channels=model_cfg.in_channels,
        num_classes=num_classes,
        base_channels=model_cfg.base_channels,
        depth=model_cfg.depth,
        n_nodes=model_cfg.n_nodes,
        norm=model_cfg.norm,
        gn_groups=model_cfg.gn_groups,
        dtype_name=dtype_override or model_cfg.dtype,
        remat=model_cfg.remat,
        use_pallas=model_cfg.use_pallas,
        merge_ops=getattr(model_cfg, "merge_ops", True),
        packed=getattr(model_cfg, "packed", False),
    )
