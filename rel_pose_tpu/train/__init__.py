from .state import TrainState
from .optim import make_optimizer, onecycle_schedule
from .step import make_train_step, make_eval_step, make_forward_fn
from .checkpoint import (
    save_checkpoint, load_checkpoint, checkpoint_path, AsyncCheckpointer,
    find_resume_checkpoint, ensure_output_dirs,
)
from .logger import Logger

__all__ = [
    "TrainState", "make_optimizer", "onecycle_schedule",
    "make_train_step", "make_eval_step", "make_forward_fn",
    "save_checkpoint", "load_checkpoint", "checkpoint_path",
    "AsyncCheckpointer",
    "find_resume_checkpoint", "ensure_output_dirs", "Logger",
]
