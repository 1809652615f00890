from .mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicate,
    shard_batch,
    maybe_initialize_distributed,
)
