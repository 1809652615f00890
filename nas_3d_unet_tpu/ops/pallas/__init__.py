from .conv3d import conv3d, pointwise_conv, conv_transpose2x  # noqa: F401
