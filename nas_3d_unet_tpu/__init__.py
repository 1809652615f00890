"""nas_3d_unet_tpu — TPU-native NAS framework for 3D U-Net segmentation.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
reference repo ``woodywff/nas_3d_unet`` (PyTorch DARTS-style NAS for 3D
U-Net BraTS brain-tumor segmentation; see SURVEY.md — the reference
checkout was unavailable, so structural citations are to SURVEY.md
sections rather than reference file:line).

Layout (TPU-first, not a port):
    io/        pure-numpy NIfTI-1 reader/writer, HDF5 patient store
    data/      offline preprocessing + online patch pipeline
    ops/       candidate-op registry; ops/pallas: MXU-tiled kernels
    models/    MixedOp, down/up cells, supernet + derived net, genotype
    search/    single-jitted-graph DARTS bilevel search step
    train/     jitted Dice+CE train loop, checkpointing
    infer/     jitted sliding-window whole-volume inference + stitching
    metrics/   soft dice loss, region dice (WT/TC/ET), label remap
    parallel/  Mesh / NamedSharding setup, GSPMD data parallelism
    utils/     config, logging, rng
"""

__version__ = "0.1.0"
