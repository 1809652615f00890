from .sliding import (grid_starts, sliding_window_labels,  # noqa: F401
                      sliding_window_probs, SlidingWindowPredictor)
from .predict import predict_patient, predict_dataset  # noqa: F401
