from omnifusion_tpu.training.schedule import cosine_warm_restarts
from omnifusion_tpu.training.trainer import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    make_optimizer,
)
from omnifusion_tpu.training.checkpoint import CheckpointManager

__all__ = [
    "cosine_warm_restarts",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_optimizer",
    "CheckpointManager",
]
