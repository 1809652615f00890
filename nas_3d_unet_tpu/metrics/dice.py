"""Dice loss / metrics and BraTS label↔region mapping.

The reference computes a smoothed soft Dice loss per channel and reports the
Dice coefficient for the three nested BraTS regions — whole tumor (WT),
tumor core (TC), enhancing tumor (ET) — and remaps region probabilities back
to BraTS labels {0, 1, 2, 4} for submission-format output (SURVEY.md §2
"Loss/metrics/utils", "Sliding-window predictor").

BraTS label semantics:
    0 = background, 1 = necrotic/non-enhancing core (NCR/NET),
    2 = peritumoral edema (ED), 4 = GD-enhancing tumor (ET).
Regions (nested):
    WT = {1, 2, 4},  TC = {1, 4},  ET = {4}.

All reductions here accumulate in float32 regardless of input dtype so that
bf16 training still gets stable loss values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

# Channel order for region-mode labels/predictions.
REGIONS = ("WT", "TC", "ET")
SMOOTH = 1.0


def labels_to_regions(labels: jnp.ndarray) -> jnp.ndarray:
    """BraTS label volume (..., ) int → region one-hot (..., 3) float32.

    Channels follow REGIONS order: WT, TC, ET.
    """
    wt = (labels > 0).astype(jnp.float32)
    tc = ((labels == 1) | (labels == 4)).astype(jnp.float32)
    et = (labels == 4).astype(jnp.float32)
    return jnp.stack([wt, tc, et], axis=-1)


def labels_to_regions_np(labels: np.ndarray) -> np.ndarray:
    """Pure-numpy twin of `labels_to_regions` (bitwise-identical fp32 0/1).

    Used on the host collate path: PatientCache stores the raw uint8 BraTS
    label volume (1 B/voxel) instead of the fp32 region one-hot (12 B/voxel)
    and PatchGenerator converts per PATCH here — comparisons and the 0/1
    cast are exact, so batches match the old full-volume-fp32 storage bit
    for bit (tests/test_pipeline.py pins this)."""
    wt = (labels > 0).astype(np.float32)
    tc = ((labels == 1) | (labels == 4)).astype(np.float32)
    et = (labels == 4).astype(np.float32)
    return np.stack([wt, tc, et], axis=-1)


def labels_to_class_indices_np(labels: np.ndarray) -> np.ndarray:
    """Pure-numpy twin of `labels_to_class_indices` (same int32 result)."""
    return np.where(labels == 4, 3, labels).astype(np.int32)


def region_masks_to_labels(wt: jnp.ndarray, tc: jnp.ndarray,
                           et: jnp.ndarray) -> jnp.ndarray:
    """Nested region decode: boolean WT/TC/ET masks → BraTS labels {0,1,2,4}
    (uint8).  A voxel is ET(4) if the ET mask fires; else core(1) if TC
    fires; else edema(2) if WT fires; else background.  Matches the
    reference's remap step (SURVEY.md §3.4).  Single source of the nesting
    rule — shared by the host probs route below and the on-device decode
    (infer/sliding.py)."""
    out = jnp.where(et, 4, jnp.where(tc & wt, 1, jnp.where(wt, 2, 0)))
    return out.astype(jnp.uint8)


def regions_to_labels(region_probs: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Region probabilities (..., 3) → BraTS labels {0,1,2,4} (uint8)."""
    return region_masks_to_labels(region_probs[..., 0] > threshold,
                                  region_probs[..., 1] > threshold,
                                  region_probs[..., 2] > threshold)


def _flatten_spatial(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) → (B, V, C) in float32."""
    b, c = x.shape[0], x.shape[-1]
    return x.astype(jnp.float32).reshape(b, -1, c)


def soft_dice_loss(probs: jnp.ndarray, targets: jnp.ndarray, smooth: float = SMOOTH) -> jnp.ndarray:
    """Smoothed soft Dice loss, mean over batch and channels.

    probs/targets: (B, D, H, W, C) with probs already in [0, 1].
    loss = 1 - (2·Σpy + s) / (Σp + Σy + s), summed over voxels per (b, c).
    """
    p = _flatten_spatial(probs)
    y = _flatten_spatial(targets)
    inter = jnp.sum(p * y, axis=1)
    denom = jnp.sum(p, axis=1) + jnp.sum(y, axis=1)
    dice = (2.0 * inter + smooth) / (denom + smooth)
    return jnp.mean(1.0 - dice)


def dice_ce_loss(logits, targets: jnp.ndarray, smooth: float = SMOOTH) -> jnp.ndarray:
    """Dice + cross-entropy on sigmoid region logits (SURVEY.md §2 "Derived trainer").

    Region channels are independent (nested regions), so CE is per-channel
    binary cross-entropy with logits; Dice is computed on sigmoid probs.

    `logits` may be a packed activation (ops.packed.PX) — the loss then runs
    entirely in the packed layout.  Rationale (round-3 profile): a
    (B,D,H,W,3) tensor tiles as T(8,128) with 3 of 128 lanes used, so every
    elementwise pass and reduction over unpacked logits touches ~42× the
    logical bytes; the f32[2M,3] loss reductions alone were ~3.3 ms/step.
    Packed (r·3 lanes) the same math reads ~r× fewer physical bytes.  Voxel
    terms are identical, only the reduction order changes.
    """
    from ..ops.packed import PX  # local import: metrics must stay torch-free and cycle-free

    if isinstance(logits, PX):
        return _dice_ce_loss_packed(logits, targets, smooth)
    logits32 = logits.astype(jnp.float32)
    dice = soft_dice_loss(jax.nn.sigmoid(logits32), targets, smooth)
    bce = jnp.mean(optax.sigmoid_binary_cross_entropy(logits32, targets.astype(jnp.float32)))
    return dice + bce


def _dice_ce_loss_packed(px, targets: jnp.ndarray, smooth: float = SMOOTH) -> jnp.ndarray:
    """dice_ce_loss on packed (standard-layout) logits without unpacking.

    Per-(b, channel) sums become converting reduces to (B, r·C) followed by
    a one-hot channel fold — the same trick packed GroupNorm uses."""
    from ..ops.packed import pack, standard_layout

    lay = px.layout
    r, c = lay.r, lay.c
    assert lay.idx == standard_layout(r, c).idx, "packed loss needs standard layout"
    lg = px.data.astype(jnp.float32)                       # (B,D,H,Wp,rC)
    yp = pack(targets.astype(jnp.float32), r)              # free reshape
    fold = np.zeros((r * c, c), np.float32)                # δ-major fold
    fold[np.arange(r * c), np.arange(r * c) % c] = 1.0
    fold_j = jnp.asarray(fold)

    p = jax.nn.sigmoid(lg)
    inter = jnp.sum(p * yp, axis=(1, 2, 3)) @ fold_j       # (B, C)
    sum_p = jnp.sum(p, axis=(1, 2, 3)) @ fold_j
    sum_y = jnp.sum(yp, axis=(1, 2, 3)) @ fold_j
    dice = (2.0 * inter + smooth) / (sum_p + sum_y + smooth)
    dice_loss = jnp.mean(1.0 - dice)
    bce = jnp.mean(optax.sigmoid_binary_cross_entropy(lg, yp))
    return dice_loss + bce


def softmax_dice_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                         smooth: float = SMOOTH) -> jnp.ndarray:
    """Dice + CE for mutually-exclusive class labels (label_mode="classes").

    logits: (B, D, H, W, K) over BraTS class indices {0..K-1} (4 maps to
    index 3); labels: (B, D, H, W) int class indices.
    """
    num_classes = logits.shape[-1]
    logits32 = logits.astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    probs = jax.nn.softmax(logits32, axis=-1)
    dice = soft_dice_loss(probs, onehot, smooth)
    ce = jnp.mean(optax.softmax_cross_entropy(logits32.reshape(-1, num_classes),
                                              onehot.reshape(-1, num_classes)))
    return dice + ce


def get_loss_fn(label_mode: str):
    """Training loss for a label encoding: sigmoid-region or softmax-class.

    "regions" → `dice_ce_loss` on (B,D,H,W,3) region one-hots;
    "classes" → `softmax_dice_ce_loss` on (B,D,H,W) int class indices.
    """
    if label_mode == "regions":
        return dice_ce_loss
    if label_mode == "classes":
        return softmax_dice_ce_loss
    raise ValueError(f"unknown label_mode {label_mode!r}")


def class_logits_to_regions(logits: jnp.ndarray) -> jnp.ndarray:
    """Class logits (..., 4) → hard region one-hot (..., 3) via argmax decode."""
    labels = class_indices_to_labels(jnp.argmax(logits, axis=-1))
    return labels_to_regions(labels.astype(jnp.int32))


# BraTS stores labels {0,1,2,4}; class-index form packs 4 → 3.
def labels_to_class_indices(labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(labels == 4, 3, labels).astype(jnp.int32)


def class_indices_to_labels(idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(idx == 3, 4, idx).astype(jnp.uint8)


def region_dice(pred_regions: jnp.ndarray, true_regions: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Hard Dice coefficient per region channel.

    pred/true: (..., 3) binary {0,1} region masks (any leading dims).
    Returns (3,) float32 — Dice for WT, TC, ET.  When both masks are empty
    the score is 1.0 (the convention BraTS evaluation uses for absent ET).
    """
    p = pred_regions.astype(jnp.float32).reshape(-1, pred_regions.shape[-1])
    y = true_regions.astype(jnp.float32).reshape(-1, true_regions.shape[-1])
    inter = jnp.sum(p * y, axis=0)
    denom = jnp.sum(p, axis=0) + jnp.sum(y, axis=0)
    return jnp.where(denom > 0, 2.0 * inter / (denom + eps), 1.0)
