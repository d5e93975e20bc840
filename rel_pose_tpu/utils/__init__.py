from .convert import (
    convert_torch_state_dict,
    export_torch_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "convert_torch_state_dict", "export_torch_state_dict",
    "load_torch_checkpoint",
]
