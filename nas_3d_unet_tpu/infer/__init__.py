from .sliding import grid_starts, sliding_window_probs, SlidingWindowPredictor  # noqa: F401
from .predict import predict_patient, predict_dataset  # noqa: F401
