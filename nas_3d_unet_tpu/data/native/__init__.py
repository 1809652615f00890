from ._native import available, union_bbox_native, zscore_native  # noqa: F401
