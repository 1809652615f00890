"""Sliding-window whole-volume inference with overlap stitching.

Reference algorithm (SURVEY.md §2 "Sliding-window predictor", §3.4): cover
the preprocessed volume with a grid of overlapping patches (stride < patch),
run batched forwards, accumulate per-voxel probability sums and visit
counts, then divide once — overlap *averaging*.

TPU-first design:
  * The whole loop lives in ONE jitted function per (volume-shape, #patches)
    signature: patches are gathered with `lax.dynamic_slice` and accumulated
    with read-modify-write `lax.dynamic_update_slice` inside a `lax.scan` —
    no host↔device round-trip per batch (the reference crosses the boundary
    twice per batch, SURVEY.md §3.4).
  * Bit-for-bit fp32 contract (SURVEY.md §6): accumulation is a fixed,
    sequential patch order in fp32, with a single division at the end, so
    the stitched output is exactly reproducible and matches the numpy
    oracle in tests.  Forward passes inside a batch are independent
    (vmapped/batched), which does not affect per-voxel accumulation order
    because each voxel's contributions are still added in grid order.
  * Padded grid entries (to fill the last batch) carry weight 0.0: adding
    0.0 in fp32 is exact, so padding never perturbs the stitched result.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def grid_starts(dim: int, patch: int, stride: int) -> List[int]:
    """1-D window start positions: stride steps, final window end-aligned."""
    if dim < patch:
        raise ValueError(f"dim {dim} < patch {patch}; pad the volume first")
    starts = list(range(0, dim - patch + 1, max(1, stride)))
    if starts[-1] != dim - patch:
        starts.append(dim - patch)
    return starts


def grid_coords(shape: Sequence[int], patch: Sequence[int], stride: Sequence[int]) -> np.ndarray:
    """(N, 3) int32 array of patch start coordinates in scan order (D, H, W)."""
    ds = grid_starts(shape[0], patch[0], stride[0])
    hs = grid_starts(shape[1], patch[1], stride[1])
    ws = grid_starts(shape[2], patch[2], stride[2])
    coords = [(d, h, w) for d in ds for h in hs for w in ws]
    return np.asarray(coords, dtype=np.int32)


@partial(jax.jit,
         static_argnames=("forward_fn", "patch", "batch_size", "num_classes",
                          "batch_sharding", "volume_sharding"))
def _stitch(
    volume: Array,            # (D, H, W, C) fp32, already padded to >= patch
    coords: Array,            # (Nb, B, 3) int32, batched patch starts
    weights: Array,           # (Nb, B) fp32, 0.0 for padded grid entries
    forward_fn: Callable,     # (B, p, p, p, C) -> (B, p, p, p, K) fp32 probs
    patch: Tuple[int, int, int],
    batch_size: int,
    num_classes: int,
    batch_sharding=None,      # NamedSharding: shard the patch batch (DP infer)
    volume_sharding=None,     # NamedSharding over D: spatial (CP-analog) infer
) -> Tuple[Array, Array]:
    """Scan over coord batches; accumulate prob sums and counts on device."""
    d, h, w, _ = volume.shape
    sum_buf = jnp.zeros((d, h, w, num_classes), dtype=jnp.float32)
    cnt_buf = jnp.zeros((d, h, w, 1), dtype=jnp.float32)
    if volume_sharding is not None:
        # Spatial sharding (SURVEY.md §5 long-context row, inference side):
        # the whole-volume accumulation buffers — the largest tensors of the
        # stitch, bigger than any activation for large volumes — live sharded
        # over the mesh's spatial axis.  GSPMD turns every dynamic-slice
        # patch gather and read-modify-write update into the necessary
        # halo collectives; per-voxel arithmetic (and thus the bit-exact
        # fp32 contract) is unchanged.
        sum_buf = jax.lax.with_sharding_constraint(sum_buf, volume_sharding)
        cnt_buf = jax.lax.with_sharding_constraint(cnt_buf, volume_sharding)

    def gather_patch(c):
        return jax.lax.dynamic_slice(
            volume, (c[0], c[1], c[2], 0), (*patch, volume.shape[-1]))

    def body(carry, batch):
        sums, cnts = carry
        cs, ws = batch
        patches = jax.vmap(gather_patch)(cs)              # (B, p, p, p, C)
        if batch_sharding is not None:
            # GSPMD data-parallel inference: the patch batch (and thus the
            # model forward) shards over the mesh; per-patch math is
            # unchanged, so results stay bit-identical to single-device
            patches = jax.lax.with_sharding_constraint(patches, batch_sharding)
        probs = forward_fn(patches).astype(jnp.float32)   # (B, p, p, p, K)

        def add_one(i, bufs):
            sums, cnts = bufs
            c = cs[i]
            wgt = ws[i]
            idx = (c[0], c[1], c[2], 0)
            cur = jax.lax.dynamic_slice(sums, idx, (*patch, num_classes))
            sums = jax.lax.dynamic_update_slice(sums, cur + wgt * probs[i], idx)
            curc = jax.lax.dynamic_slice(cnts, idx, (*patch, 1))
            cnts = jax.lax.dynamic_update_slice(
                cnts, curc + wgt * jnp.ones_like(curc), idx)
            return sums, cnts

        sums, cnts = jax.lax.fori_loop(0, batch_size, add_one, (sums, cnts))
        return (sums, cnts), None

    (sum_buf, cnt_buf), _ = jax.lax.scan(body, (sum_buf, cnt_buf), (coords, weights))
    return sum_buf, cnt_buf


def _stitch_sums(
    forward_fn: Callable[[Array], Array],
    volume,
    patch_size: Sequence[int],
    overlap: float,
    batch_size: int,
    num_classes: int,
    batch_sharding=None,
    volume_sharding=None,
) -> Tuple[Array, Array, Tuple[int, int, int]]:
    """Shared prep + stitch: pad, grid, scan; returns device (sums, cnts)
    plus the unpadded volume shape."""
    on_device = isinstance(volume, jax.Array)
    if on_device:
        volume = volume.astype(jnp.float32)
    else:
        volume = np.asarray(volume, dtype=np.float32)
    orig_shape = volume.shape[:3]
    patch = tuple(int(p) for p in patch_size)
    stride = tuple(max(1, int(round(p * (1.0 - overlap)))) for p in patch)

    # pad (end-only) so every dim fits at least one patch
    pad = [max(0, p - s) for p, s in zip(patch, orig_shape)]
    if any(pad):
        pads = [(0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)]
        volume = jnp.pad(volume, pads) if on_device else np.pad(volume, pads)
    shape = volume.shape[:3]

    coords = grid_coords(shape, patch, stride)            # (N, 3)
    n = coords.shape[0]
    n_batches = math.ceil(n / batch_size)
    n_pad = n_batches * batch_size - n
    weights = np.ones((n,), dtype=np.float32)
    if n_pad:
        coords = np.concatenate([coords, np.repeat(coords[-1:], n_pad, axis=0)])
        weights = np.concatenate([weights, np.zeros((n_pad,), np.float32)])
    coords = coords.reshape(n_batches, batch_size, 3)
    weights = weights.reshape(n_batches, batch_size)

    vol_dev = (jax.device_put(volume, volume_sharding)
               if volume_sharding is not None else jnp.asarray(volume))
    sums, cnts = _stitch(
        vol_dev, jnp.asarray(coords), jnp.asarray(weights),
        forward_fn=forward_fn, patch=patch, batch_size=batch_size,
        num_classes=num_classes, batch_sharding=batch_sharding,
        volume_sharding=volume_sharding)
    return sums, cnts, orig_shape


def sliding_window_probs(
    forward_fn: Callable[[Array], Array],
    volume: np.ndarray,
    patch_size: Sequence[int],
    overlap: float = 0.5,
    batch_size: int = 4,
    num_classes: int = 3,
    batch_sharding=None,
    volume_sharding=None,
) -> np.ndarray:
    """Whole-volume averaged probabilities, (D, H, W, K) fp32.

    `forward_fn` maps a patch batch (B, p, p, p, C) to *probabilities*
    (B, p, p, p, K); it is traced inside the jitted stitcher.
    `volume` is the preprocessed (D, H, W, C) image — a numpy array, or a
    jax Array already staged on device (the patient-prefetch path in
    infer/predict.py overlaps that transfer with the previous patient's
    compute); zero-padding on either path is exact, so the bit-for-bit
    contract is unaffected.

    This is the bit-for-bit fp32 contract path (host-side single divide,
    golden-tested) — it reads the full fp32 sum/count buffers back to the
    host.  When only the LABEL volume is needed, `sliding_window_labels`
    decodes on device and moves ~30× fewer bytes.
    """
    sums, cnts, orig_shape = _stitch_sums(
        forward_fn, volume, patch_size, overlap, batch_size, num_classes,
        batch_sharding, volume_sharding)
    probs = np.asarray(sums) / np.asarray(cnts)           # single divide
    return probs[: orig_shape[0], : orig_shape[1], : orig_shape[2]]


@partial(jax.jit, static_argnames=("threshold", "label_mode", "crop"))
def _decode_labels(sums: Array, cnts: Array, threshold: float,
                   label_mode: str, crop: Tuple[int, int, int]) -> Array:
    """Device-side label decode from stitched sums/counts, (D, H, W) uint8.

    regions: a region fires where the mean prob exceeds the threshold,
    evaluated as `sums > threshold·cnts`.  For the default 0.5 (any power
    of two) the product is exact in fp32, so this computes the EXACT
    mathematical predicate `sums/cnts > t` with no rounding at all; the
    host probs path rounds the division first, so on a voxel lying within
    an ulp of the threshold the two routes can differ — the device route
    is the more faithful one.  Non-power-of-two thresholds round the
    product once and carry the same measure-zero boundary caveat in the
    other direction.  Nesting rule shared with the host route
    (metrics/dice.py region_masks_to_labels).

    classes: argmaxes the sums directly — the per-voxel count is
    class-independent and positive, so this is the argmax of the exact
    means.  The host route argmaxes ROUNDED quotients, which can collapse
    two nearly-equal classes the exact comparison separates; again a
    measure-zero boundary where the device route is the more faithful.
    Then index 3 → BraTS label 4 (metrics/dice.py class_indices_to_labels).
    """
    from ..metrics.dice import class_indices_to_labels, region_masks_to_labels

    sums = jax.lax.slice(sums, (0, 0, 0, 0), (*crop, sums.shape[-1]))
    cnts = jax.lax.slice(cnts, (0, 0, 0, 0), (*crop, 1))
    if label_mode == "classes":
        return class_indices_to_labels(jnp.argmax(sums, axis=-1))
    fire = sums > jnp.float32(threshold) * cnts           # (D, H, W, 3)
    return region_masks_to_labels(fire[..., 0], fire[..., 1], fire[..., 2])


def sliding_window_labels(
    forward_fn: Callable[[Array], Array],
    volume: np.ndarray,
    patch_size: Sequence[int],
    overlap: float = 0.5,
    batch_size: int = 4,
    num_classes: int = 3,
    batch_sharding=None,
    volume_sharding=None,
    threshold: float = 0.5,
    label_mode: str = "regions",
) -> Array:
    """Whole-volume BraTS labels decoded ON DEVICE, (D, H, W) uint8.

    Same stitch as `sliding_window_probs`, but the divide/threshold/argmax
    and the {0,1,2,4} remap run on device, so the only device→host traffic
    is the final 1-byte-per-voxel label volume (~30× fewer bytes than the
    fp32 sum+count buffers — the round-3 measured wall-time dominator on
    tunneled hosts).  Returns a device array; callers `np.asarray` it once
    (infer/predict.py keeps it on device for the Dice reduction first)."""
    sums, cnts, orig_shape = _stitch_sums(
        forward_fn, volume, patch_size, overlap, batch_size, num_classes,
        batch_sharding, volume_sharding)
    return _decode_labels(sums, cnts, threshold=float(threshold),
                          label_mode=label_mode, crop=tuple(orig_shape))


class SlidingWindowPredictor:
    """Convenience wrapper binding a model apply-fn + params."""

    def __init__(self, apply_fn, params, patch_size, overlap=0.5, batch_size=4,
                 num_classes=3, batch_sharding=None, volume_sharding=None,
                 label_mode="regions"):
        """`batch_sharding`: optional NamedSharding over the patch-batch axis
        for GSPMD data-parallel inference (batch_size must be a multiple of
        the data-axis size).  `volume_sharding`: optional NamedSharding over
        the volume D axis — spatial (CP-analog) inference for whole-volume
        buffers that exceed one chip's HBM.  `label_mode`: "regions" →
        sigmoid region probabilities (K=3); "classes" → softmax class
        probabilities (K=4)."""
        self.patch_size = tuple(patch_size)
        self.overlap = overlap
        self.batch_size = batch_size
        self.num_classes = num_classes
        self.batch_sharding = batch_sharding
        self.volume_sharding = volume_sharding
        self.label_mode = label_mode
        self._params = params
        self._apply = apply_fn

    def forward_probs(self, patches: Array) -> Array:
        logits = self._apply(self._params, patches)
        if self.label_mode == "classes":
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    def predict_volume(self, volume: np.ndarray) -> np.ndarray:
        return sliding_window_probs(
            self.forward_probs, volume, self.patch_size, self.overlap,
            self.batch_size, self.num_classes, self.batch_sharding,
            self.volume_sharding)

    def predict_labels(self, volume, threshold: float = 0.5) -> Array:
        """(D, H, W) uint8 BraTS labels, decoded on device (see
        sliding_window_labels for the transfer-count rationale and the
        exactness argument vs the probs path)."""
        return sliding_window_labels(
            self.forward_probs, volume, self.patch_size, self.overlap,
            self.batch_size, self.num_classes, self.batch_sharding,
            self.volume_sharding, threshold=threshold,
            label_mode=self.label_mode)
