from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint  # noqa: F401
from .loop import Trainer, TrainState, make_train_step, make_eval_step  # noqa: F401
