from .init import trunc_normal, variance_scaling, xavier_uniform, lecun_normal
from .layers import (
    linear_init, linear_apply,
    layernorm_init, layernorm_apply,
    batchnorm_init, batchnorm_apply,
    conv2d_init, conv2d_apply,
    mlp_init, mlp_apply,
    max_pool_2d,
)
from .resnet import resnet18_trunk_init, resnet18_trunk_apply
from .extractor import residual_block_init, residual_block_apply
from .transformer import vit_block_init, vit_block_apply

__all__ = [
    "trunc_normal", "variance_scaling", "xavier_uniform", "lecun_normal",
    "linear_init", "linear_apply", "layernorm_init", "layernorm_apply",
    "batchnorm_init", "batchnorm_apply", "conv2d_init", "conv2d_apply",
    "mlp_init", "mlp_apply", "max_pool_2d",
    "resnet18_trunk_init", "resnet18_trunk_apply",
    "residual_block_init", "residual_block_apply",
    "vit_block_init", "vit_block_apply",
]
