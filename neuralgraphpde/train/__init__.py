from .losses import masked_cross_entropy, accuracy, mse, rollout_mse
from .optim import adam, rprop
from .loop import (TrainState, make_train_step, make_train_step_dp,
                   MetricsLogger, fit, StepHeartbeat, abort_on_stall)

__all__ = [
    "masked_cross_entropy", "accuracy", "mse", "rollout_mse", "adam", "rprop",
    "TrainState", "make_train_step", "make_train_step_dp",
    "MetricsLogger", "fit", "StepHeartbeat", "abort_on_stall",
]
