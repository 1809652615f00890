from .primitives import (  # noqa: F401
    NORMAL_OPS,
    DOWN_OPS,
    UP_OPS,
    make_op,
    ConvNormAct,
)
