"""Typed configuration tree.

The reference keeps all hyperparameters in a single ``config.yml`` read with
PyYAML at the top of each entry script (SURVEY.md §2 "Config loader").  Here
the same surface is a tree of frozen dataclasses, loadable from YAML with
dotted CLI overrides, and versioned into checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

try:  # PyYAML is in the base image (SURVEY.md §7 [ENV]); gate anyway.
    import yaml

    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False


@dataclass(frozen=True)
class DataConfig:
    """Paths + preprocessing/patching knobs (SURVEY.md §2 preprocessor/generator)."""

    raw_dir: str = "data/brats_raw"           # contains HGG/ and LGG/ patient dirs
    processed_dir: str = "data/brats_h5"      # per-patient HDF5 output
    modalities: Tuple[str, ...] = ("t1", "t1ce", "t2", "flair")
    seg_suffix: str = "seg"
    patch_size: Tuple[int, int, int] = (128, 128, 128)
    # The CODE default is the HBM-safe batch 1 (any caller without a config
    # file gets a config that always fits at 128³).  The SHIPPED config.yml
    # opts into batch_size: 2 + train.microbatch: 1 — the measured per-chip
    # optimum at 128³ (11.33 vs 11.07 b1 / 9.97 b2 full-batch patches/s,
    # PERF_NOTES round-4 grad-accum A/B; plateau flat through b4).  SEARCH
    # inherits this unless search.batch_size overrides (the remat-off 128³
    # supernet is HBM-critical — keep search at b1).  Scale further via
    # parallel.data_parallel, not bigger batches.
    batch_size: int = 1
    val_fraction: float = 0.2
    # augmentation
    flip_prob: float = 0.5                    # per spatial axis
    intensity_shift: float = 0.1              # additive jitter, std-units
    intensity_scale: float = 0.1              # multiplicative jitter amplitude
    # label encoding: "regions" = sigmoid over (WT, TC, ET); "classes" = softmax over 4
    label_mode: str = "regions"
    num_classes: int = 0                      # 0 = auto: 3 (regions) / 4 (classes)
    seed: int = 0

    def __post_init__(self):
        if self.label_mode not in ("regions", "classes"):
            raise ValueError(f"label_mode must be 'regions' or 'classes', "
                             f"got {self.label_mode!r}")
        required = 3 if self.label_mode == "regions" else 4
        if self.num_classes == 0:
            object.__setattr__(self, "num_classes", required)
        elif self.num_classes != required:
            raise ValueError(
                f"label_mode={self.label_mode!r} requires num_classes="
                f"{required}, got {self.num_classes}")


@dataclass(frozen=True)
class ModelConfig:
    """Supernet / derived-net shape (SURVEY.md §2 Cell/Supernet rows)."""

    in_channels: int = 4                      # BraTS modalities
    base_channels: int = 16                   # node channels at full resolution
    depth: int = 3                            # number of down cells (and up cells)
    n_nodes: int = 3                          # intermediate nodes per cell
    norm: str = "group"                       # "group" | "instance" | "none"
    gn_groups: int = 8
    remat: bool = False                       # jax.checkpoint per cell
    # Packed execution fits 128-cubed searches AND derived training in HBM
    # with remat fully off (round 3: search 0.93 s/step vs 1.30 with cell
    # remat).  Set remat=true for larger bases/patches; `remat_edges`
    # (supernet edge-level remat, None follows `remat`) caps peak memory
    # further when cells alone do not fit.
    remat_edges: bool | None = None
    # compute dtype for activations; params/accum stay fp32
    dtype: str = "bfloat16"
    # Pallas kernels vs lax reference path.  MEASURED SLOWER end-to-end on
    # this jaxlib (853 vs 477 ms/step round 1; pallas DMA maxes at ~250 GB/s
    # vs XLA's ~1 TB/s streaming — PERF_NOTES.md round-3 DMA probe): keep
    # False except for kernel testing / re-evaluation on newer toolchains.
    use_pallas: bool = False
    merge_ops: bool = True                    # exact op merging in derived cells
    # lane-packed execution (ops/packed.py): the measured-fastest path on
    # TPU (3.8× round 1 on the derived step); ~parity on CPU
    packed: bool = True


@dataclass(frozen=True)
class SearchConfig:
    """DARTS bilevel search (SURVEY.md §2 "Search driver")."""

    epochs: int = 50
    steps_per_epoch: int = 250
    w_lr: float = 3e-4
    w_weight_decay: float = 1e-4
    alpha_lr: float = 3e-4
    alpha_weight_decay: float = 1e-3
    unrolled: bool = False                    # second-order DARTS (ref: first-order)
    xi: float = 0.0                           # virtual-step lr; 0 -> use w_lr
    # augment the α-step (val) batch too?  The reference applies no val-side
    # augmentation (SURVEY.md §3.2), so default off; on = lower-variance α
    # grads are NOT guaranteed — measure before enabling.
    augment_val: bool = False
    warmup_epochs: int = 5                    # epochs of w-only updates before alpha
    # PC-DARTS-style partial-channel candidate evaluation: only C/K of each
    # edge's channels run through the candidate ops; the rest bypass
    # (resolution-matched on down/up edges) and a channel shuffle remixes —
    # FREE in packed execution (a layout-metadata permutation).  1 = exact
    # reference DARTS semantics.  The bilevel step is bandwidth-bound
    # (PERF_NOTES round-5), so K>1 cuts step time roughly ∝ 1/K; edge
    # parsing stays top-2-by-alpha (no edge-normalization betas).  Must
    # divide model.base_channels.
    partial_channels: int = 1
    # 0 = inherit data.batch_size.  The bilevel step is the HBM-critical
    # config (remat-off supernet holds TWO batches' residuals); the shipped
    # config pins search to batch 1 while derived training runs b2+mb1.
    batch_size: int = 0
    val_steps: int = 8                        # α-split eval batches per epoch
    checkpoint_dir: str = "ckpt/search"
    checkpoint_every: int = 1                 # epochs
    tensorboard: bool = False                 # mirror metrics to <ckpt>/tb
    seed: int = 0


@dataclass(frozen=True)
class TrainConfig:
    """Derived-architecture training (SURVEY.md §2 "Derived trainer")."""

    epochs: int = 300
    steps_per_epoch: int = 250
    # device-side step loop: each dispatch scans this many train steps
    # (amortizes the ~1-4 ms/dispatch axon relay gap; 1 = plain per-step
    # dispatch).  Must divide steps_per_epoch.
    steps_per_call: int = 1
    # gradient accumulation: 0 = full-batch gradient (default); m > 0 scans
    # the batch in size-m slices, each through its own fwd+bwd (b1-shaped
    # conv graphs, one slice's residuals live at a time).  Mathematically
    # the same update (loss is a per-sample mean); recovers the measured
    # batch-1 per-patch efficiency when a single chip must run batch > 1
    # (PERF_NOTES round-4 grad-accumulation A/B).  Must divide batch_size.
    microbatch: int = 0
    lr: float = 3e-4
    weight_decay: float = 1e-4
    lr_patience: int = 30                     # plateau epochs before lr drop
    lr_factor: float = 0.5
    min_lr: float = 1e-6
    checkpoint_dir: str = "ckpt/train"
    checkpoint_every: int = 1
    genotype_path: str = "ckpt/search/genotype.json"
    tensorboard: bool = False                 # mirror metrics to <ckpt>/tb
    seed: int = 0


@dataclass(frozen=True)
class InferConfig:
    """Sliding-window whole-volume inference (SURVEY.md §2 "Sliding-window predictor")."""

    patch_size: Tuple[int, int, int] = (128, 128, 128)
    overlap: float = 0.5                      # stride = patch * (1 - overlap)
    batch_size: int = 2                       # 4 exceeds 16 GB HBM at 128³ fp32
    threshold: float = 0.5                    # region-prob threshold
    # activation dtype of the network BODY during inference.  "float32"
    # (default) keeps the bit-for-bit fp32 stitching contract vs the numpy
    # oracle; "bfloat16" runs the conv body in bf16 (same as training) for
    # ~2x throughput — the head, logits, and overlap stitch stay fp32, but
    # logits are no longer bit-identical to the fp32 run.
    dtype: str = "float32"
    output_dir: str = "predictions"
    checkpoint_dir: str = "ckpt/train"


@dataclass(frozen=True)
class ParallelConfig:
    """GSPMD mesh layout (SURVEY.md §2b, §5 comm-backend row)."""

    data_axis: str = "data"
    spatial_axis: str = "spatial"             # optional volume-axis sharding
    data_parallel: int = -1                   # -1 = all devices
    spatial_parallel: int = 1


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    search: SearchConfig = field(default_factory=SearchConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    infer: InferConfig = field(default_factory=InferConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)


_SECTIONS = {
    "data": DataConfig,
    "model": ModelConfig,
    "search": SearchConfig,
    "train": TrainConfig,
    "infer": InferConfig,
    "parallel": ParallelConfig,
}


def _coerce(cls: type, raw: dict) -> Any:
    """Build a dataclass from a raw dict, coercing lists to tuples."""
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, val in raw.items():
        if key not in fields:
            raise KeyError(f"unknown config key {cls.__name__}.{key}")
        if isinstance(val, list):
            val = tuple(val)
        kwargs[key] = val
    return cls(**kwargs)


def config_from_dict(raw: dict) -> Config:
    sections = {}
    for name, cls in _SECTIONS.items():
        if name in raw and raw[name] is not None:
            sections[name] = _coerce(cls, raw[name])
    extra = set(raw) - set(_SECTIONS)
    if extra:
        raise KeyError(f"unknown config sections: {sorted(extra)}")
    return Config(**sections)


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None) -> Config:
    """Load YAML config; apply dotted-path overrides like {"model.depth": 4}."""
    raw: dict = {}
    if path is not None:
        if not _HAVE_YAML:  # pragma: no cover
            raise RuntimeError("PyYAML unavailable; cannot load YAML config")
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
    cfg = config_from_dict(raw)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg


def apply_overrides(cfg: Config, overrides: dict) -> Config:
    """Apply {"section.key": value} overrides, returning a new Config."""
    raw = cfg.to_dict()
    # to_dict() carries the mode-resolved num_classes; a label_mode override
    # must re-trigger auto-resolution unless num_classes is set explicitly
    if "data.label_mode" in overrides and "data.num_classes" not in overrides:
        raw["data"]["num_classes"] = 0
    for dotted, val in overrides.items():
        section, _, key = dotted.partition(".")
        if not key or section not in raw:
            raise KeyError(f"bad override path {dotted!r}")
        if key not in raw[section]:
            raise KeyError(f"unknown config key {dotted!r}")
        raw[section][key] = val
    return config_from_dict(raw)
