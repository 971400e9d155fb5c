from .optim import make_optimizer, OptimizerConfig
from .step import TrainState, make_train_step, init_train_state

__all__ = [
    "make_optimizer",
    "OptimizerConfig",
    "TrainState",
    "make_train_step",
    "init_train_state",
]
