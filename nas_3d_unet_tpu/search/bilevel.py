"""DARTS bilevel search: one jitted step doing the α-update and the w-update.

Reference loop (SURVEY.md §3.2): per step, (1) α-step — dice loss of the
supernet on a val-split batch, backward, α-optimizer step; (2) w-step —
dice loss on a train-split batch, backward, w-optimizer step.  First-order
approximation (no second-order unroll).  Two Adam optimizers.  Epoch loop
logs dice, checkpoints {w, α, optimizer states}, and finally decodes
softmax(α) into a genotype.

TPU-first: both phases live in ONE jitted graph with donated state
(SURVEY.md §1 north-star: "runs as a single jitted graph") — the reference
crosses the host↔device boundary twice per step and launches two separate
backward graphs; here XLA schedules both passes back-to-back on device with
no host sync between them.  The w-step sees the *updated* α (sequential
semantics, matching the reference's update order).

Warmup epochs (w-only updates while α stays frozen) are standard DARTS
practice to avoid collapsing to parameter-free ops early; the warmup step
is a separate jitted function so neither graph carries dead branches.
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
from ..metrics.dice import get_loss_fn
from ..models.genotype import Genotype, init_alphas, parse_alphas
from ..models.unet import arch_weights_from_alphas
from ..utils.logging import MetricsLogger
from ..utils.params import count_params
from ..utils.timing import fence
from ..train.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from ..train.loop import make_eval_step

Array = jax.Array


@struct.dataclass
class SearchState:
    params: Any        # supernet weights w
    w_opt: Any
    alphas: Any        # architecture parameters α (dict of fp32 tensors)
    a_opt: Any
    step: Array
    rng: Array


def make_search_step(apply_fn: Callable, w_tx: optax.GradientTransformation,
                     a_tx: optax.GradientTransformation,
                     augment: Optional[dict] = None, label_mode: str = "regions",
                     augment_val: bool = False):
    """(state, x_tr, y_tr, x_val, y_val) → (state, metrics), fully jitted.

    `augment_val`: also augment the α-step (val) batch.  The reference runs
    no val-side augmentation (SURVEY.md §3.2), so the default keeps α grads
    on clean batches; flipping it is a logged config choice, not implicit.
    """
    loss = get_loss_fn(label_mode)

    def loss_fn(params, alphas, x, y):
        logits = apply_fn(params, x, arch_weights_from_alphas(alphas))
        return loss(logits, y)

    @partial(jax.jit, donate_argnums=(0,))
    def search_step(state: SearchState, x_tr: Array, y_tr: Array,
                    x_val: Array, y_val: Array) -> Tuple[SearchState, Dict[str, Array]]:
        rng, k1, k2 = jax.random.split(state.rng, 3)
        if augment is not None:
            x_tr, y_tr = augment_batch(k1, x_tr, y_tr, **augment)
            if augment_val:
                x_val, y_val = augment_batch(k2, x_val, y_val, **augment)

        # (1) architecture step on the val batch
        val_loss, a_grads = jax.value_and_grad(loss_fn, argnums=1)(
            state.params, state.alphas, x_val, y_val)
        a_updates, a_opt = a_tx.update(a_grads, state.a_opt, state.alphas)
        alphas = optax.apply_updates(state.alphas, a_updates)

        # (2) weight step on the train batch, under the updated α
        train_loss, w_grads = jax.value_and_grad(loss_fn, argnums=0)(
            state.params, alphas, x_tr, y_tr)
        w_updates, w_opt = w_tx.update(w_grads, state.w_opt, state.params)
        params = optax.apply_updates(state.params, w_updates)

        new_state = SearchState(params=params, w_opt=w_opt, alphas=alphas,
                                a_opt=a_opt, step=state.step + 1, rng=rng)
        return new_state, {"train_loss": train_loss, "val_loss": val_loss}

    return search_step


def make_search_step_unrolled(apply_fn: Callable, w_tx: optax.GradientTransformation,
                              a_tx: optax.GradientTransformation, xi: float,
                              augment: Optional[dict] = None,
                              label_mode: str = "regions",
                              augment_val: bool = False):
    """Second-order DARTS step (the reference runs first-order; this is the
    paper's unrolled objective, exact rather than finite-difference):

        ∇_α L_val(w − ξ·∇_w L_train(w, α), α)

    JAX differentiates straight through the inner gradient (reverse-over-
    reverse Hessian-vector products), so no finite-difference approximation
    is needed.  ~2× the compute/memory of the first-order step.
    """

    loss = get_loss_fn(label_mode)

    def loss_fn(params, alphas, x, y):
        logits = apply_fn(params, x, arch_weights_from_alphas(alphas))
        return loss(logits, y)

    @partial(jax.jit, donate_argnums=(0,))
    def search_step(state: SearchState, x_tr: Array, y_tr: Array,
                    x_val: Array, y_val: Array) -> Tuple[SearchState, Dict[str, Array]]:
        rng, k1, k2 = jax.random.split(state.rng, 3)
        if augment is not None:
            x_tr, y_tr = augment_batch(k1, x_tr, y_tr, **augment)
            if augment_val:
                x_val, y_val = augment_batch(k2, x_val, y_val, **augment)

        def val_after_virtual_step(alphas):
            g_w = jax.grad(loss_fn, argnums=0)(state.params, alphas, x_tr, y_tr)
            w_virt = jax.tree_util.tree_map(lambda p, g: p - xi * g,
                                            state.params, g_w)
            return loss_fn(w_virt, alphas, x_val, y_val)

        val_loss, a_grads = jax.value_and_grad(val_after_virtual_step)(state.alphas)
        a_updates, a_opt = a_tx.update(a_grads, state.a_opt, state.alphas)
        alphas = optax.apply_updates(state.alphas, a_updates)

        train_loss, w_grads = jax.value_and_grad(loss_fn, argnums=0)(
            state.params, alphas, x_tr, y_tr)
        w_updates, w_opt = w_tx.update(w_grads, state.w_opt, state.params)
        params = optax.apply_updates(state.params, w_updates)

        new_state = SearchState(params=params, w_opt=w_opt, alphas=alphas,
                                a_opt=a_opt, step=state.step + 1, rng=rng)
        return new_state, {"train_loss": train_loss, "val_loss": val_loss}

    return search_step


def make_warmup_step(apply_fn: Callable, w_tx: optax.GradientTransformation,
                     augment: Optional[dict] = None, label_mode: str = "regions"):
    """w-only update (α frozen) for the warmup epochs."""
    loss = get_loss_fn(label_mode)

    def loss_fn(params, alphas, x, y):
        logits = apply_fn(params, x, arch_weights_from_alphas(alphas))
        return loss(logits, y)

    @partial(jax.jit, donate_argnums=(0,))
    def warmup_step(state: SearchState, x_tr: Array, y_tr: Array
                    ) -> Tuple[SearchState, Dict[str, Array]]:
        rng, k1 = jax.random.split(state.rng)
        if augment is not None:
            x_tr, y_tr = augment_batch(k1, x_tr, y_tr, **augment)
        train_loss, w_grads = jax.value_and_grad(loss_fn)(
            state.params, state.alphas, x_tr, y_tr)
        w_updates, w_opt = w_tx.update(w_grads, state.w_opt, state.params)
        params = optax.apply_updates(state.params, w_updates)
        new_state = SearchState(params=params, w_opt=w_opt, alphas=state.alphas,
                                a_opt=state.a_opt, step=state.step + 1, rng=rng)
        return new_state, {"train_loss": train_loss, "val_loss": jnp.float32(0)}

    return warmup_step


def alpha_summary(alphas: Dict[str, Array]) -> Dict[str, float]:
    """Mean softmax entropy per α group — the standard search-health signal."""
    out = {}
    for name, a in alphas.items():
        p = jax.nn.softmax(a, axis=-1)
        ent = -jnp.sum(p * jnp.log(p + 1e-9), axis=-1)
        out[f"entropy_{name}"] = float(jnp.mean(ent))
    return out


class Searcher:
    """Supernet search driver (reference `Searching`, SURVEY.md §2/§3.2)."""

    def __init__(self, supernet, cfg, data_paths, log_path: Optional[str] = None,
                 device_augment: bool = True, sharding=None):
        self.cfg = cfg
        self.sharding = sharding
        sc, dc = cfg.search, cfg.data
        # partial-channel search (search.partial_channels > 1): clone the
        # supernet with pc_k set so EVERY consumer below (step, warmup,
        # eval, init) sees the same architecture/param tree
        pc_k = int(getattr(sc, "partial_channels", 1) or 1)
        if pc_k > 1:
            supernet = supernet.clone(pc_k=pc_k)
        self.net = supernet
        # flatten: one fused update over the ~100-leaf supernet param tree
        # instead of per-leaf tiny ops (see train.loop.make_optimizer)
        self.w_tx = optax.flatten(
            optax.adamw(sc.w_lr, weight_decay=sc.w_weight_decay))
        self.a_tx = optax.adamw(sc.alpha_lr, weight_decay=sc.alpha_weight_decay)
        aug = (dict(flip_prob=dc.flip_prob, intensity_shift=dc.intensity_shift,
                    intensity_scale=dc.intensity_scale) if device_augment else None)
        self.augment_val = bool(getattr(sc, "augment_val", False))
        # packed supernets keep the head packed through both loss passes
        # (train/loop.py has the rationale); the α-split eval keeps the
        # unpacked contract for the region-dice decode
        step_net = supernet
        if (getattr(supernet, "packed", False) and dc.label_mode == "regions"
                and getattr(supernet, "unpack_head", True)):
            step_net = supernet.clone(unpack_head=False)
        if getattr(sc, "unrolled", False):
            xi = sc.xi if getattr(sc, "xi", 0.0) > 0 else sc.w_lr
            self.search_step = make_search_step_unrolled(
                step_net.apply, self.w_tx, self.a_tx, xi, aug, dc.label_mode,
                self.augment_val)
        else:
            self.search_step = make_search_step(step_net.apply, self.w_tx,
                                                self.a_tx, aug, dc.label_mode,
                                                self.augment_val)
        self.warmup_step = make_warmup_step(step_net.apply, self.w_tx, aug,
                                            dc.label_mode)

        def _super_apply(bundle, x):
            params, aw = bundle
            return supernet.apply(params, x, aw)

        # supernet eval on the α-split: loss + hard per-region dice with the
        # CURRENT architecture weights frozen (reference `Searching.validate`,
        # SURVEY.md §2 "Search driver")
        self.eval_step = make_eval_step(_super_apply, label_mode=dc.label_mode)
        self.logger = MetricsLogger(
            log_path,
            tb_dir=(os.path.join(sc.checkpoint_dir, "tb")
                    if getattr(sc, "tensorboard", False) else None))

        # the search splits its data into a w-part and an α-part
        w_paths, a_paths = split_patients(data_paths, dc.val_fraction, dc.seed)
        self.w_cache = PatientCache(w_paths, dc.label_mode)
        self.a_cache = PatientCache(a_paths or w_paths, dc.label_mode)
        self.patch = dc.patch_size
        # search.batch_size overrides data.batch_size (0 = inherit): the
        # bilevel step is the HBM-critical config — the remat-off supernet
        # holds residuals for BOTH the w- and α-batch — so the shipped
        # config pins search to b1 while derived training runs b2+mb1
        self.batch = getattr(sc, "batch_size", 0) or dc.batch_size
        # Multi-host: global batch = the configured batch; each process
        # generates only its local slice (README multi-host contract step 3;
        # see train/loop.py for the same pattern + rationale)
        from ..parallel.mesh import local_batch_size
        self.local_batch = local_batch_size(self.batch, "search batch size")
        self._host_seed_offset = 100003 * jax.process_index()

    def init_state(self, rng: Array) -> SearchState:
        k_init, k_alpha, k_state = jax.random.split(rng, 3)
        alphas = init_alphas(k_alpha, self.cfg.model.n_nodes)
        x0 = jnp.zeros((self.batch, *self.patch, self.cfg.model.in_channels), jnp.float32)
        params = self.net.init(k_init, x0, arch_weights_from_alphas(alphas))
        return SearchState(params=params, w_opt=self.w_tx.init(params),
                           alphas=alphas, a_opt=self.a_tx.init(alphas),
                           step=jnp.asarray(0, jnp.int32), rng=k_state)

    def resume_or_init(self, rng: Array) -> SearchState:
        state = self.init_state(rng)
        self._resume_meta: dict = {}
        ckpt = latest_checkpoint(self.cfg.search.checkpoint_dir)
        if ckpt is not None:
            step, path = ckpt
            state = load_checkpoint(path, state)
            import json as _json
            meta_path = os.path.join(self.cfg.search.checkpoint_dir,
                                     "metadata.json")
            if os.path.exists(meta_path):
                self._resume_meta = _json.load(open(meta_path))
            self.logger.log(event="resume", step=step, path=path)
        return state

    def search(self, epochs: Optional[int] = None,
               steps_per_epoch: Optional[int] = None) -> Tuple[SearchState, Genotype]:
        sc = self.cfg.search
        epochs = epochs if epochs is not None else sc.epochs
        steps_per_epoch = steps_per_epoch if steps_per_epoch is not None else sc.steps_per_epoch

        state = self.resume_or_init(jax.random.PRNGKey(sc.seed))
        if jax.process_count() > 1 and self.sharding is not None:
            # commit the identical host-local state as ONE global replicated
            # pytree (see train/loop.py for the rationale)
            from jax.sharding import NamedSharding as _NS

            from ..parallel.mesh import replicate
            if isinstance(self.sharding, _NS):
                state = replicate(self.sharding.mesh, state)
        from ..train.loop import warn_stream_geometry_mismatch
        warn_stream_geometry_mismatch(self._resume_meta, self.logger,
                                      steps_per_epoch=steps_per_epoch,
                                      val_steps=sc.val_steps,
                                      warmup_epochs=sc.warmup_epochs)
        self.logger.log(event="model", params=count_params(state.params),
                        alphas=count_params(state.alphas))
        start_epoch = int(state.step) // steps_per_epoch
        # counter-based streams positioned at the restored step make resume
        # TRAJECTORY-exact (data/pipeline.py).  g_w advances every step;
        # g_a/g_eval only on non-warmup steps/epochs, so their counters are
        # aligned to the non-warm work completed so far.
        non_warm_epochs = max(0, start_epoch - sc.warmup_epochs)
        hseed = sc.seed + self._host_seed_offset
        g_w = PatchGenerator(self.w_cache, self.patch, self.local_batch,
                             seed=hseed + 101, augment=False,
                             start_step=int(state.step))
        g_a = PatchGenerator(self.a_cache, self.patch, self.local_batch,
                             seed=hseed + 202, augment=False,
                             start_step=non_warm_epochs * steps_per_epoch)
        # dedicated eval generator: g_a is being drained by the pf_a thread,
        # and numpy Generators are not thread-safe — sharing it would race
        # and break seeded reproducibility
        g_eval = PatchGenerator(self.a_cache, self.patch, self.local_batch,
                                seed=hseed + 303, augment=False,
                                start_step=non_warm_epochs * sc.val_steps)
        pf_w = Prefetcher(g_w, depth=2, sharding=self.sharding)
        pf_a = Prefetcher(g_a, depth=2, sharding=self.sharding)
        genotype = None
        try:
            for epoch in range(start_epoch, epochs):
                warm = epoch < sc.warmup_epochs
                t0 = time.perf_counter()
                tr_losses, va_losses = [], []
                for _ in range(steps_per_epoch):
                    x_tr, y_tr = pf_w.next()
                    if warm:
                        state, m = self.warmup_step(state, x_tr, y_tr)
                    else:
                        x_val, y_val = pf_a.next()
                        state, m = self.search_step(state, x_tr, y_tr, x_val, y_val)
                    tr_losses.append(m["train_loss"])
                    va_losses.append(m["val_loss"])
                # block_until_ready returns early on the axon platform; the
                # logged throughput must fence via host value readback.
                fence(tr_losses[-1])
                dt = time.perf_counter() - t0
                pps = steps_per_epoch * self.batch / dt

                genotype = parse_alphas(jax.device_get(state.alphas),
                                        self.cfg.model.n_nodes)
                rec = dict(event="epoch", epoch=epoch, warmup=warm,
                           augment_val=self.augment_val,
                           train_loss=float(np.mean([float(v) for v in tr_losses])),
                           val_loss=float(np.mean([float(v) for v in va_losses])),
                           patches_per_sec=pps, **alpha_summary(state.alphas))
                if not warm:
                    val = self.evaluate(state, g_eval, self.cfg.search.val_steps)
                    rec.update(eval_loss=val["loss"], dice_wt=val["dice_wt"],
                               dice_tc=val["dice_tc"], dice_et=val["dice_et"])
                self.logger.log(**rec)

                if (epoch + 1) % sc.checkpoint_every == 0 or epoch == epochs - 1:
                    save_checkpoint(sc.checkpoint_dir, int(state.step), state,
                                    metadata={"epoch": epoch,
                                              "steps_per_epoch": steps_per_epoch,
                                              "val_steps": sc.val_steps,
                                              "warmup_epochs": sc.warmup_epochs,
                                              "config": self.cfg.to_dict()})
                    # process-0 only: multi-host runs share the filesystem and
                    # would race on the file (save_checkpoint guards likewise)
                    if jax.process_index() == 0:
                        genotype.save(os.path.join(sc.checkpoint_dir, "genotype.json"))
        finally:
            pf_w.close()
            pf_a.close()
        return state, genotype

    def evaluate(self, state: SearchState, gen: PatchGenerator,
                 val_steps: int) -> Dict[str, float]:
        """Frozen-α supernet eval on the α-split: loss + per-region dice."""
        aw = arch_weights_from_alphas(state.alphas)
        accum: Dict[str, list] = {}
        for _ in range(val_steps):
            x, y = gen.next()
            if self.sharding is not None:
                # eval batches carry the training mesh sharding (device-0-only
                # eval under a DP mesh is silent and wrong); per-leaf
                # rank-trimmed (class-mode labels are rank-4); multi-host the
                # hosts' slices assemble into one global batch
                from ..parallel.mesh import put_global_batch

                x, y = put_global_batch((np.asarray(x), np.asarray(y)), self.sharding)
            m = self.eval_step((state.params, aw), jnp.asarray(x), jnp.asarray(y))
            for k, v in m.items():
                accum.setdefault(k, []).append(float(v))
        return {k: float(np.mean(v)) for k, v in accum.items()}
