from .losses import masked_cross_entropy, accuracy, mse, rollout_mse
from .optim import adam, rprop
from .loop import (TrainState, make_train_step, make_train_step_dp,
                   MetricsLogger, fit)

__all__ = [
    "masked_cross_entropy", "accuracy", "mse", "rollout_mse", "adam", "rprop",
    "TrainState", "make_train_step", "make_train_step_dp",
    "MetricsLogger", "fit",
]
