from .convert import (
    convert_torch_state_dict,
    export_torch_state_dict,
    load_torch_checkpoint,
    load_torch_checkpoint_with_optimizer,
)
from .profiling import StepTimer, trace
from .platform import apply_platform_env

__all__ = [
    "convert_torch_state_dict", "export_torch_state_dict",
    "load_torch_checkpoint", "load_torch_checkpoint_with_optimizer",
    "StepTimer", "trace", "apply_platform_env",
]
