from .quaternion import (
    quat_multiply,
    quat_conjugate,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    rotation_from_viewpoint,
    geodesic_angle_from_matrices,
)
from .lie import (
    se3_identity,
    se3_identity_like,
    se3_compose,
    se3_inverse,
    se3_log,
    se3_exp,
    so3_log,
    so3_exp,
)
from .losses import geodesic_loss
from .epipolar import (
    essential_from_pose,
    fundamental_from_essential,
    compute_correspond_epilines,
)

__all__ = [
    "quat_multiply", "quat_conjugate", "quat_rotate", "quat_to_matrix",
    "matrix_to_quat", "rotation_from_viewpoint", "geodesic_angle_from_matrices",
    "se3_identity", "se3_identity_like", "se3_compose", "se3_inverse",
    "se3_log", "se3_exp", "so3_log", "so3_exp",
    "geodesic_loss",
    "essential_from_pose", "fundamental_from_essential",
    "compute_correspond_epilines",
]
