from .config import Config, load_config  # noqa: F401
from .params import count_params, param_size_mb  # noqa: F401
