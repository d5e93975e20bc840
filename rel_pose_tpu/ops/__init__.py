from .posenc import quadratic_positional_encoding, l1_positional_encoding
from .image import (
    nearest_resize,
    preprocess_images,
    scale_intrinsics,
)
from .essential import (
    cross_attention_init,
    essential_cross_attention,
    essential_cross_attention_pair,
    noess_cross_attention,
)

__all__ = [
    "quadratic_positional_encoding", "l1_positional_encoding",
    "nearest_resize", "preprocess_images", "scale_intrinsics",
    "cross_attention_init", "essential_cross_attention",
    "essential_cross_attention_pair",
    "noess_cross_attention",
]
