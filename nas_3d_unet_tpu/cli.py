"""Command-line interface: preprocess / search / train / predict.

The reference exposes four entry scripts (`preprocess.py`, `search.py`,
`train.py`, `predict.py`) each reading `config.yml` (SURVEY.md §1-§3).
Here they are subcommands of one CLI with dotted config overrides:

    python -m nas_3d_unet_tpu preprocess -c config.yml
    python -m nas_3d_unet_tpu search     -c config.yml -o search.epochs=5
    python -m nas_3d_unet_tpu train      -c config.yml
    python -m nas_3d_unet_tpu predict    -c config.yml -o infer.overlap=0.25
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys
from typing import List, Optional

import jax

# Persistent compile cache by default: cold remote (axon) compiles of the
# jitted steps take minutes; cached reruns take seconds.  Overridable via
# JAX_CACHE_DIR; disable with JAX_CACHE_DIR="".
_cache_dir = os.environ.get("JAX_CACHE_DIR",
                            os.path.expanduser("~/.cache/jax_tpu"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _parse_overrides(pairs: List[str]) -> dict:
    out = {}
    for pair in pairs or []:
        key, _, val = pair.partition("=")
        if not _:
            raise SystemExit(f"bad override {pair!r}; expected section.key=value")
        try:
            out[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            out[key] = val  # plain string
    return out


def _load_cfg(args):
    from .utils.config import load_config

    return load_config(args.config, _parse_overrides(args.override))


def _mesh_and_sharding(cfg):
    """Data-parallel mesh over all devices (1-device mesh is a no-op)."""
    from .parallel.mesh import batch_sharding, make_mesh, maybe_initialize_distributed

    maybe_initialize_distributed()
    mesh = make_mesh(cfg.parallel.data_parallel, cfg.parallel.spatial_parallel)
    return mesh, batch_sharding(mesh, spatial=cfg.parallel.spatial_parallel > 1)


def cmd_preprocess(args) -> int:
    cfg = _load_cfg(args)
    from .data.preprocess import preprocess_dataset

    outs = preprocess_dataset(cfg.data.raw_dir, cfg.data.processed_dir,
                              cfg.data.modalities, cfg.data.seg_suffix,
                              workers=args.workers)
    print(json.dumps({"event": "preprocess_done", "patients": len(outs),
                      "out_dir": cfg.data.processed_dir}))
    return 0


def cmd_search(args) -> int:
    cfg = _load_cfg(args)
    from .data.pipeline import dataset_paths
    from .models.unet import make_supernet
    from .search.bilevel import Searcher

    mesh, sharding = _mesh_and_sharding(cfg)
    paths = dataset_paths(cfg.data.processed_dir)
    net = make_supernet(cfg.model, cfg.data.num_classes)
    log = os.path.join(cfg.search.checkpoint_dir, "metrics.jsonl")
    with mesh:
        searcher = Searcher(net, cfg, paths, log_path=log, sharding=sharding)
        _, genotype = searcher.search()
    print(json.dumps({"event": "search_done",
                      "genotype": os.path.join(cfg.search.checkpoint_dir, "genotype.json")}))
    return 0


def cmd_train(args) -> int:
    cfg = _load_cfg(args)
    from .data.pipeline import dataset_paths
    from .models.genotype import Genotype, default_genotype
    from .models.unet import make_derived
    from .train.loop import Trainer

    mesh, sharding = _mesh_and_sharding(cfg)
    if os.path.exists(cfg.train.genotype_path):
        genotype = Genotype.load(cfg.train.genotype_path)
    else:
        print(json.dumps({"event": "warn",
                          "msg": f"genotype {cfg.train.genotype_path} not found; "
                                 "using default_genotype"}))
        genotype = default_genotype(cfg.model.n_nodes)
    net = make_derived(cfg.model, cfg.data.num_classes, genotype)
    paths = dataset_paths(cfg.data.processed_dir)
    log = os.path.join(cfg.train.checkpoint_dir, "metrics.jsonl")
    with mesh:
        trainer = Trainer(net, cfg, paths, log_path=log, sharding=sharding)
        trainer.train()
    print(json.dumps({"event": "train_done", "ckpt_dir": cfg.train.checkpoint_dir}))
    return 0


def cmd_predict(args) -> int:
    cfg = _load_cfg(args)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .infer.predict import predict_dataset
    from .infer.sliding import SlidingWindowPredictor
    from .models.genotype import Genotype, default_genotype
    from .models.unet import make_derived
    from .parallel.mesh import DATA_AXIS, SPATIAL_AXIS, make_mesh, maybe_initialize_distributed
    from .train.checkpoint import latest_checkpoint, load_checkpoint
    from .train.loop import TrainState, make_optimizer

    if os.path.exists(cfg.train.genotype_path):
        genotype = Genotype.load(cfg.train.genotype_path)
    else:
        genotype = default_genotype(cfg.model.n_nodes)
    # fp32 body by default (the bit-for-bit stitching contract); bf16 body
    # is the opt-in ~2x speed mode (infer.dtype) — head/logits/stitch stay
    # fp32 either way (models/unet.py fp32 head)
    net = make_derived(cfg.model, cfg.data.num_classes, genotype,
                       dtype_override=cfg.infer.dtype)

    ckpt_dir = cfg.infer.checkpoint_dir
    best = os.path.join(ckpt_dir, "best.msgpack")
    found = latest_checkpoint(ckpt_dir)
    path = best if os.path.exists(best) else (found[1] if found else None)
    if path is None:
        raise SystemExit(f"no checkpoint under {ckpt_dir}")

    tx = make_optimizer(cfg.train.lr, cfg.train.weight_decay)
    x0 = jnp.zeros((1, *cfg.infer.patch_size, cfg.model.in_channels), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0)
    template = TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(0))
    state = load_checkpoint(path, template)

    # Sharded inference (BASELINE.json configs[4]): patch batches shard over
    # the data axis; with parallel.spatial_parallel > 1 the whole-volume
    # stitch buffers — the largest tensors of the stage — shard over the
    # spatial axis (infer/sliding.py keeps both paths bit-identical).
    maybe_initialize_distributed()
    mesh = make_mesh(cfg.parallel.data_parallel, cfg.parallel.spatial_parallel)
    bs, vs = None, None
    if mesh.devices.size > 1:
        n_data = mesh.shape[DATA_AXIS]
        if cfg.infer.batch_size % n_data == 0:
            bs = NamedSharding(mesh, P(DATA_AXIS, None, None, None, None))
        else:
            print(json.dumps({"event": "warn",
                              "msg": f"infer.batch_size {cfg.infer.batch_size} "
                                     f"not divisible by data axis {n_data}; "
                                     "running patch batches unsharded"}))
        if cfg.parallel.spatial_parallel > 1:
            vs = NamedSharding(mesh, P(SPATIAL_AXIS, None, None, None))

    predictor = SlidingWindowPredictor(
        net.apply, state.params, cfg.infer.patch_size, cfg.infer.overlap,
        cfg.infer.batch_size, cfg.data.num_classes,
        batch_sharding=bs, volume_sharding=vs,
        label_mode=cfg.data.label_mode)
    results = predict_dataset(predictor, cfg.data.processed_dir,
                              cfg.infer.output_dir, cfg.infer.threshold)
    dices = [r["dice"] for r in results if "dice" in r]
    if dices:
        import numpy as np
        mean = {k: float(np.mean([d[k] for d in dices])) for k in ("WT", "TC", "ET")}
        print(json.dumps({"event": "predict_done", "patients": len(results),
                          "mean_dice": mean}))
    else:
        print(json.dumps({"event": "predict_done", "patients": len(results)}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="nas_3d_unet_tpu",
                                description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("preprocess", cmd_preprocess), ("search", cmd_search),
                     ("train", cmd_train), ("predict", cmd_predict)):
        sp = sub.add_parser(name)
        sp.add_argument("-c", "--config", default=None, help="YAML config path")
        sp.add_argument("-o", "--override", action="append", default=[],
                        help="dotted config override, e.g. model.depth=4")
        sp.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (raises at the first NaN)")
        if name == "preprocess":
            sp.add_argument("-w", "--workers", type=int, default=0)
        sp.set_defaults(fn=fn)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "debug_nans", False):
        from .utils.profiling import debug_nans

        debug_nans(True)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
