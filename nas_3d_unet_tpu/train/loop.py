"""Derived-model training: one jitted Dice+CE step, eval, plateau LR, resume.

Reference loop (SURVEY.md §3.3): per step crop+augment on host, transfer,
forward/backward, Adam step; per epoch a val loop drives ReduceLROnPlateau
and best-checkpoint selection by val dice.

TPU-first: the train step is ONE jitted graph — device-side augmentation
(RNG folded from the state key), bf16 activations with fp32 params/accum,
donated state buffers (no reallocation per step).  Host work is only the
numpy patch crop, overlapped via the Prefetcher.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data.pipeline import PatchGenerator, PatientCache, Prefetcher, augment_batch, split_patients
from ..metrics.dice import (class_indices_to_labels, class_logits_to_regions,
                            get_loss_fn, labels_to_regions, region_dice)
from ..utils.logging import MetricsLogger
from ..utils.params import count_params
from ..utils.timing import fence
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint

Array = jax.Array


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Array  # int32 scalar
    rng: Array   # PRNG key


def make_optimizer(lr: float, weight_decay: float,
                   flat: bool = True) -> optax.GradientTransformation:
    """AdamW with the LR exposed as mutable state (for plateau scheduling).

    `flat` wraps the update in optax.flatten: the ~100-leaf param pytree is
    ravelled to ONE vector so the whole AdamW update compiles to a couple of
    large fusions instead of per-leaf tiny ops (the round-3 step profile
    counted ~391 sub-0.1 ms ops, a dispatch-bound bucket).  Numerics are
    unchanged (AdamW is elementwise); only the opt-state pytree shape
    differs, so checkpoints are not portable across the flag."""
    def build(learning_rate, weight_decay):
        tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        return optax.flatten(tx) if flat else tx

    return optax.inject_hyperparams(build)(learning_rate=lr,
                                           weight_decay=weight_decay)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    hp = dict(opt_state.hyperparams)
    old = hp["learning_rate"]
    new = jnp.asarray(lr, dtype=jnp.asarray(old).dtype)
    if isinstance(old, jax.Array):
        # keep the old leaf's placement — under a multi-host mesh the
        # hyperparams leaf is replicated over the GLOBAL mesh, and swapping
        # in an uncommitted host-local scalar would change the jitted step's
        # input sharding (recompile) and mix local/global arrays
        new = jax.device_put(new, old.sharding)
    hp["learning_rate"] = new
    return opt_state._replace(hyperparams=hp)


def _make_step_body(apply_fn: Callable, tx: optax.GradientTransformation,
                    augment: Optional[dict], label_mode: str,
                    microbatch: int = 0):
    """The un-jitted step body shared by the single-step and scan drivers.

    `microbatch` > 0 computes the gradient by lax.scan over size-`microbatch`
    slices of the batch (scan-of-grads, NOT grad-of-scan): each iteration
    runs its own fwd+bwd, so only ONE microbatch's residuals are live at a
    time and the conv graphs inside are microbatch-shaped.  Both Dice and
    CE are means over per-sample terms, so the accumulated mean gradient is
    mathematically identical to the full-batch gradient (equal-size slices;
    only fp32 reduction order differs).  Motivation (PERF_NOTES round 3/4):
    at batch 2 XLA's full-batch graph pays a 12.5% per-patch tax — layout
    copies + conv streaming under HBM pressure — that the batch-1 graph
    does not; accumulation buys b>1 semantics at b1 graph efficiency for
    one extra params-sized buffer.  Augmentation stays full-batch (it is
    per-sample keyed), so the augmented data is bit-identical either way.
    Under GSPMD data parallelism the grouping is strided so every scan
    slice shards evenly over the data axis (see accum_grads); pick
    `microbatch` as a multiple of the data-axis size (equivalently: b/m
    must divide the per-device batch) to keep the reshape collective-free.
    """
    compute_loss = get_loss_fn(label_mode)

    def full_grads(params, x: Array, y: Array):
        def loss_fn(p):
            return compute_loss(apply_fn(p, x), y)

        return jax.value_and_grad(loss_fn)(params)

    def accum_grads(params, x: Array, y: Array):
        b = x.shape[0]
        if b % microbatch != 0:
            raise ValueError(
                f"train.microbatch={microbatch} must divide batch size {b}")
        k = b // microbatch
        # STRIDED grouping (sample j → slice j % k), not contiguous: under
        # GSPMD batch sharding the device shards are contiguous blocks of
        # b/n, so a contiguous size-m slice would live on only ⌈m/(b/n)⌉
        # devices and idle the rest each scan iteration.  The strided
        # reshape (m, k) splits the sharded axis by k (clean local reshape
        # when k divides the per-device batch), and the swap puts the scan
        # axis first with every slice keeping an equal per-device share.
        # Grouping is arbitrary for a mean, so this stays exact; at m=1 the
        # swap is a free axis-1 transpose and the layout is unchanged.
        xm = jnp.swapaxes(x.reshape(microbatch, k, *x.shape[1:]), 0, 1)
        ym = jnp.swapaxes(y.reshape(microbatch, k, *y.shape[1:]), 0, 1)

        def mb_loss(p, xi, yi):
            return compute_loss(apply_fn(p, xi), yi)

        vg = jax.value_and_grad(mb_loss)

        def scan_body(carry, xy):
            loss_sum, g_sum = carry
            loss_i, g_i = vg(params, *xy)
            return (loss_sum + loss_i,
                    jax.tree_util.tree_map(jnp.add, g_sum, g_i)), None

        zero = (jnp.zeros((), jnp.float32),
                jax.tree_util.tree_map(jnp.zeros_like, params))
        (loss_sum, g_sum), _ = jax.lax.scan(scan_body, zero, (xm, ym))
        inv = jnp.float32(1.0 / k)
        return loss_sum * inv, jax.tree_util.tree_map(lambda g: g * inv, g_sum)

    def body(state: TrainState, x: Array, y: Array) -> Tuple[TrainState, Array]:
        rng, k_aug = jax.random.split(state.rng)
        if augment is not None:
            x, y = augment_batch(k_aug, x, y, **augment)

        use_accum = microbatch and microbatch < x.shape[0]
        loss, grads = (accum_grads if use_accum else full_grads)(state.params, x, y)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        return new_state, loss

    return body


def make_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                    augment: Optional[dict] = None, label_mode: str = "regions",
                    microbatch: int = 0):
    """Build the jitted train step: (state, x, y) → (state, metrics).

    `augment`: None, or dict(flip_prob=…, intensity_shift=…, intensity_scale=…)
    to fold device-side augmentation into the graph.
    `label_mode`: "regions" (y = (B,D,H,W,3) one-hots, sigmoid loss) or
    "classes" (y = (B,D,H,W) int indices, softmax loss).
    `microbatch`: 0 = full-batch gradient; >0 = gradient accumulation over
    size-`microbatch` slices (see `_make_step_body`).
    """
    body = _make_step_body(apply_fn, tx, augment, label_mode, microbatch)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x: Array, y: Array) -> Tuple[TrainState, Dict[str, Array]]:
        state, loss = body(state, x, y)
        return state, {"loss": loss}

    return train_step


def make_train_step_n(apply_fn: Callable, tx: optax.GradientTransformation,
                      augment: Optional[dict] = None, label_mode: str = "regions",
                      microbatch: int = 0):
    """Device-side step loop: ONE dispatch runs n train steps via lax.scan.

    (state, xs, ys) → (state, {"loss": (n,)}) where xs/ys carry a leading
    step axis.  Each scan iteration is bitwise the single-step body (same
    RNG split chain), so n scanned steps == n sequential `make_train_step`
    calls; the win is dispatch amortization — on the axon remote platform
    each dispatch pays a ~1–4 ms relay gap (PERF_NOTES: 92.07 ms wall vs
    88.15 ms device span at round 3), which a multi-step call pays once per
    n steps instead of once per step.  The n staged input batches cost
    n·(patch³·(in+K)·4B) HBM (~15 MB each at 128³) — negligible next to
    activations.
    """
    body = _make_step_body(apply_fn, tx, augment, label_mode, microbatch)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step_n(state: TrainState, xs: Array, ys: Array) -> Tuple[TrainState, Dict[str, Array]]:
        def scan_body(st, xy):
            st, loss = body(st, *xy)
            return st, loss

        state, losses = jax.lax.scan(scan_body, state, (xs, ys))
        return state, {"loss": losses}

    return train_step_n


def make_eval_step(apply_fn: Callable, threshold: float = 0.5,
                   label_mode: str = "regions"):
    """Jitted eval: loss + hard per-region dice on a patch batch.

    Dice is always reported per BraTS region (WT/TC/ET); in class mode the
    argmax class decode is converted to regions first, so the metric is
    comparable across label encodings.
    """
    loss_fn_ = get_loss_fn(label_mode)

    @jax.jit
    def eval_step(params, x: Array, y: Array) -> Dict[str, Array]:
        logits = apply_fn(params, x)
        loss = loss_fn_(logits, y)
        if label_mode == "regions":
            pred = (jax.nn.sigmoid(logits.astype(jnp.float32)) > threshold).astype(jnp.float32)
            true = y
        else:  # classes: argmax → BraTS labels → region one-hots
            pred = class_logits_to_regions(logits)
            true = labels_to_regions(class_indices_to_labels(y).astype(jnp.int32))
        dice = region_dice(pred, true)
        return {"loss": loss, "dice_wt": dice[0], "dice_tc": dice[1], "dice_et": dice[2]}

    return eval_step


class PlateauController:
    """Host-side ReduceLROnPlateau on mean val dice (higher is better)."""

    def __init__(self, patience: int, factor: float, min_lr: float):
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.best = -np.inf
        self.bad_epochs = 0

    def update(self, metric: float, lr: float) -> Tuple[float, bool]:
        """Returns (new_lr, is_best)."""
        if metric > self.best:
            self.best = metric
            self.bad_epochs = 0
            return lr, True
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            return max(lr * self.factor, self.min_lr), False
        return lr, False

    def state_dict(self) -> dict:
        return {"best": float(self.best), "bad_epochs": self.bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.best = d["best"]
        self.bad_epochs = d["bad_epochs"]


def warn_stream_geometry_mismatch(meta: dict, logger: MetricsLogger,
                                  **current) -> None:
    """Detect a resume whose stream geometry differs from the original run.

    Trajectory-exact resume positions the counter-based data streams from
    the restored global step, which silently assumes steps_per_epoch /
    val_steps (and for search, warmup_epochs) are the same as in the run
    that wrote the checkpoint; a mismatch shifts the streams — and through
    the plateau controller the whole trajectory — with no error.  The
    geometry is persisted in checkpoint metadata; on mismatch we warn
    loudly rather than raise (changing the geometry is a legitimate,
    deliberate choice — it just forfeits trajectory-exactness)."""
    for key, now in current.items():
        was = meta.get(key)
        if was is not None and int(was) != int(now):
            import warnings

            msg = (f"resume with {key}={now} but the checkpoint was written "
                   f"with {key}={was}: the counter-based data streams are "
                   "positioned by the restored step, so this resume is NOT "
                   "trajectory-exact vs an uninterrupted run")
            warnings.warn(msg)
            logger.log(event="warn", msg=msg)


class Trainer:
    """Derived-model training driver (reference `Training`, SURVEY.md §2)."""

    def __init__(self, net, cfg, data_paths, log_path: Optional[str] = None,
                 device_augment: bool = True, sharding=None):
        """`net`: a flax module with (params, x)→logits apply; `cfg`: Config."""
        self.net = net
        self.cfg = cfg
        self.sharding = sharding
        tc, dc = cfg.train, cfg.data
        self.tx = make_optimizer(tc.lr, tc.weight_decay)
        aug = (dict(flip_prob=dc.flip_prob, intensity_shift=dc.intensity_shift,
                    intensity_scale=dc.intensity_scale) if device_augment else None)
        # packed nets keep the head packed through the training loss (the
        # unpacked K=3 logits tensor is ~42x lane-padded — models/unet.py
        # unpack_head); eval/inference keep the unpacked contract
        train_net = net
        if (getattr(net, "packed", False) and dc.label_mode == "regions"
                and getattr(net, "unpack_head", True)):
            train_net = net.clone(unpack_head=False)
        self.steps_per_call = max(1, int(getattr(tc, "steps_per_call", 1)))
        mb = int(getattr(tc, "microbatch", 0))
        # accum_grads' strided grouping is collective-free only when the
        # slice count k = b/m divides the per-device batch, i.e. the
        # data-axis size divides the microbatch.  A violating config is
        # still exact but GSPMD reshards every scan slice — the very
        # per-patch tax accumulation exists to remove — so fall back to the
        # full-batch gradient (same update, fp reduction order aside).
        if mb and sharding is not None:
            from ..parallel.mesh import batch_partitions

            n_data = batch_partitions(sharding)
            if n_data > 1 and mb < dc.batch_size and mb % n_data != 0:
                import warnings

                warnings.warn(
                    f"train.microbatch={mb} is not a multiple of the data-axis "
                    f"size {n_data}; the accumulation reshape would reshard "
                    "every scan slice. Falling back to the full-batch "
                    "gradient (numerically the same update).")
                mb = 0
        self.microbatch = mb
        if self.steps_per_call > 1:
            self.train_step_n = make_train_step_n(train_net.apply, self.tx,
                                                  augment=aug,
                                                  label_mode=dc.label_mode,
                                                  microbatch=mb)
        self.train_step = make_train_step(train_net.apply, self.tx, augment=aug,
                                          label_mode=dc.label_mode, microbatch=mb)
        self.eval_step = make_eval_step(net.apply, label_mode=dc.label_mode)
        self.plateau = PlateauController(tc.lr_patience, tc.lr_factor, tc.min_lr)
        self.logger = MetricsLogger(
            log_path,
            tb_dir=(os.path.join(tc.checkpoint_dir, "tb")
                    if getattr(tc, "tensorboard", False) else None))
        self.host_augment = not device_augment

        train_paths, val_paths = split_patients(data_paths, dc.val_fraction, dc.seed)
        self.train_cache = PatientCache(train_paths, dc.label_mode)
        self.val_cache = PatientCache(val_paths or train_paths, dc.label_mode)
        self.patch = dc.patch_size
        self.batch = dc.batch_size
        # Multi-host: the GLOBAL batch is data.batch_size; each process
        # generates only its local slice (README multi-host contract step 3;
        # parallel/mesh.py put_global_batch stitches the slices).  Host
        # streams get a large-prime seed stride so no host's stream collides
        # with another's (or with the +1 val-stream offset); process 0 keeps
        # the exact single-host streams.
        from ..parallel.mesh import local_batch_size
        self.local_batch = local_batch_size(self.batch)
        self._host_seed_offset = 100003 * jax.process_index()
        if jax.process_count() > 1 and self.steps_per_call > 1:
            raise ValueError(
                "train.steps_per_call > 1 is single-host only: the scan "
                "driver stacks already-placed global batches eagerly, which "
                "multi-process JAX cannot execute outside jit")
        # per-epoch (lr, mean_dice, is_best) record — cheap observability,
        # and the multi-host test asserts the LR trajectory is identical on
        # every process (the plateau input is a replicated scalar)
        self.history: list = []

    def init_state(self, rng: Array) -> TrainState:
        k_init, k_state = jax.random.split(rng)
        x0 = jnp.zeros((self.batch, *self.patch, self.cfg.model.in_channels), jnp.float32)
        params = self.net.init(k_init, x0)
        opt_state = self.tx.init(params)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.asarray(0, jnp.int32), rng=k_state)

    def resume_or_init(self, rng: Array) -> TrainState:
        state = self.init_state(rng)
        self._resume_meta: dict = {}
        ckpt = latest_checkpoint(self.cfg.train.checkpoint_dir)
        if ckpt is not None:
            step, path = ckpt
            state = load_checkpoint(path, state)
            # restore the plateau controller too — otherwise the first
            # post-resume epoch always looks like a new best and can
            # overwrite the true best checkpoint
            import json as _json
            meta_path = os.path.join(self.cfg.train.checkpoint_dir, "metadata.json")
            if os.path.exists(meta_path):
                meta = _json.load(open(meta_path))
                self._resume_meta = meta
                if "plateau" in meta:
                    self.plateau.load_state_dict(meta["plateau"])
            self.logger.log(event="resume", step=step, path=path)
        return state

    def _generators(self, seed: int):
        dc = self.cfg.data
        seed = seed + self._host_seed_offset
        gtrain = PatchGenerator(self.train_cache, self.patch, self.local_batch,
                                seed=seed,
                                augment=self.host_augment, flip_prob=dc.flip_prob,
                                intensity_shift=dc.intensity_shift,
                                intensity_scale=dc.intensity_scale)
        gval = PatchGenerator(self.val_cache, self.patch, self.local_batch,
                              seed=seed + 1, augment=False)
        return gtrain, gval

    def train(self, epochs: Optional[int] = None, steps_per_epoch: Optional[int] = None,
              val_steps: int = 8) -> TrainState:
        tc = self.cfg.train
        epochs = epochs if epochs is not None else tc.epochs
        steps_per_epoch = steps_per_epoch if steps_per_epoch is not None else tc.steps_per_epoch

        n_call = self.steps_per_call
        if steps_per_epoch % n_call != 0:
            raise ValueError(
                f"train.steps_per_call={n_call} must divide "
                f"steps_per_epoch={steps_per_epoch} (the multi-step scan "
                "graph has a fixed step count; a remainder would compile a "
                "second graph — minutes per cold axon compile)")

        state = self.resume_or_init(jax.random.PRNGKey(tc.seed))
        if jax.process_count() > 1 and self.sharding is not None:
            # every process initialized (or loaded) identical host-local
            # state from the same seed/checkpoint; commit it as ONE global
            # replicated pytree so the jitted step sees global arrays only
            from jax.sharding import NamedSharding as _NS

            from ..parallel.mesh import replicate
            if isinstance(self.sharding, _NS):
                state = replicate(self.sharding.mesh, state)
        warn_stream_geometry_mismatch(self._resume_meta, self.logger,
                                      steps_per_epoch=steps_per_epoch,
                                      val_steps=val_steps)
        self.logger.log(event="model", params=count_params(state.params))
        start_epoch = int(state.step) // steps_per_epoch
        # counter-based streams (data/pipeline.py): positioning by the
        # restored global step makes resume TRAJECTORY-exact — the resumed
        # run consumes the same batches an uninterrupted run would have
        # (device augment already rides in state.rng, so host sampling was
        # the only divergence source)
        gtrain, gval = self._generators(tc.seed)
        gtrain.set_step(int(state.step))
        gval.set_step(start_epoch * val_steps)
        prefetch = Prefetcher(gtrain, depth=2, sharding=self.sharding)
        try:
            for epoch in range(start_epoch, epochs):
                t0 = time.perf_counter()
                losses = []
                for _ in range(steps_per_epoch // n_call):
                    if n_call == 1:
                        x, y = prefetch.next()
                        state, metrics = self.train_step(state, x, y)
                        losses.append(metrics["loss"])
                    else:
                        # stage n batches with a leading step axis; the
                        # stack is a small on-device op (inputs are tiny
                        # next to activations) and the scan call replaces
                        # n dispatches with one
                        xb, yb = zip(*(prefetch.next() for _ in range(n_call)))
                        state, metrics = self.train_step_n(
                            state, self._stack_steps(xb), self._stack_steps(yb))
                        losses.extend(list(metrics["loss"]))
                # block_until_ready returns early on the axon platform; the
                # logged throughput must fence via host value readback.
                fence(losses[-1])
                dt = time.perf_counter() - t0
                pps = steps_per_epoch * self.batch / dt

                # the eval batches are GLOBAL (each host contributes its
                # slice), so the jitted eval metrics are replicated scalars:
                # every process computes the SAME mean_dice and therefore
                # takes the SAME plateau-LR branch — replicated opt_state
                # stays bit-identical across hosts by construction
                val = self.evaluate(state.params, gval, val_steps)
                mean_dice = float(np.mean([val["dice_wt"], val["dice_tc"], val["dice_et"]]))
                lr = get_learning_rate(state.opt_state)
                new_lr, is_best = self.plateau.update(mean_dice, lr)
                if new_lr != lr:
                    state = state.replace(opt_state=set_learning_rate(state.opt_state, new_lr))
                self.history.append({"epoch": epoch, "mean_dice": mean_dice,
                                     "lr": new_lr, "is_best": is_best})

                self.logger.log(event="epoch", epoch=epoch,
                                train_loss=float(np.mean([float(l) for l in losses])),
                                val_loss=val["loss"], dice_wt=val["dice_wt"],
                                dice_tc=val["dice_tc"], dice_et=val["dice_et"],
                                mean_dice=mean_dice, lr=new_lr, patches_per_sec=pps)

                if (epoch + 1) % tc.checkpoint_every == 0 or is_best:
                    save_checkpoint(tc.checkpoint_dir, int(state.step), state,
                                    metadata={"epoch": epoch, "mean_dice": mean_dice,
                                              "plateau": self.plateau.state_dict(),
                                              "steps_per_epoch": steps_per_epoch,
                                              "val_steps": val_steps,
                                              "config": self.cfg.to_dict()},
                                    best=is_best)
        finally:
            prefetch.close()
        return state

    def _stack_steps(self, arrs):
        """Stack n batches along a new leading step axis for the scan driver.

        Under a DP mesh the per-batch arrays carry the batch sharding; the
        stacked array must NOT have the 'data' axis land on the step axis
        (sharding_for_rank trims from the front), so re-place it with a
        None-prefixed spec: (step=replicated, batch='data', ...)."""
        stacked = jnp.stack(arrs)
        if self.sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import sharding_for_rank

            batch_sh = sharding_for_rank(self.sharding, stacked.ndim - 1)
            if isinstance(batch_sh, NamedSharding):
                spec = P(*((None,) + tuple(batch_sh.spec)))
                stacked = jax.device_put(
                    stacked, NamedSharding(batch_sh.mesh, spec))
        return stacked

    def evaluate(self, params, gval: PatchGenerator, val_steps: int) -> Dict[str, float]:
        accum: Dict[str, list] = {}
        for _ in range(val_steps):
            x, y = gval.next()
            if self.sharding is not None:
                # eval batches must carry the same mesh sharding as training
                # or they silently run on device 0 only under a DP mesh;
                # per-leaf rank-trimmed (class-mode labels are rank-4).
                # Multi-host, the hosts' slices assemble into ONE global
                # eval batch — the returned metrics are replicated scalars,
                # which is what makes the plateau-LR decision identical on
                # every process.
                from ..parallel.mesh import put_global_batch

                x, y = put_global_batch((np.asarray(x), np.asarray(y)), self.sharding)
            m = self.eval_step(params, jnp.asarray(x), jnp.asarray(y))
            for k, v in m.items():
                accum.setdefault(k, []).append(float(v))
        return {k: float(np.mean(v)) for k, v in accum.items()}
