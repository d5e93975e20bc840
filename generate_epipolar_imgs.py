#!/usr/bin/env python
"""Epipolar geometry visualization (parity with
``/root/reference/generate_epipolar_imgs.py``).

Draws a grid of colored points on image 1 and their epipolar lines on
image 2 given a relative pose: E = [t]x R, F = K2^-T E K1^-1.  The pose is
conjugated by a pi rotation about x (habitat -> OpenCV convention,
reference :166-168).  Pure-JAX geometry from ``rel_pose_tpu.geom`` replaces
the reference's scipy/torch mix; cv2 draws the overlays.
"""

import numpy as np
import cv2

from rel_pose_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax.numpy as jnp

from rel_pose_tpu.geom.quaternion import quat_to_matrix, matrix_to_quat
from rel_pose_tpu.geom.epipolar import (
    essential_from_pose, fundamental_from_essential,
    compute_correspond_epilines, epiline_slope_intercept,
)

### start inputs
curr_path1 = "demo/matterport_1.png"
curr_path2 = "demo/matterport_2.png"
# format x,y,z,qx,qy,qz,qw
rel_pose_input = np.array([2.17275, 0.1722, -0.87071, 0.00044, 0.54702,
                           0.10733, 0.83021])

out_path1_points = "demo/matterport_1_epipolar_points.png"
out_path2_lines = "demo/matterport_2_epipolar_lines.png"

INTRINSICS = np.array([[517.97, 0, 320],
                       [0, 517.97, 240],
                       [0, 0, 1]], dtype=np.float64)

radius = 20
line_width = 15
epipolar_points_x = 3
epipolar_points_y = 3
### end inputs


def conjugate_by_x_rotation(pose, theta=np.pi):
    """pose' = T^-1 @ pose @ T with T = rot_x(theta) as 4x4 (reference
    ``transform_helper``/``apply_transform``, :32-66)."""
    T = np.eye(4)
    T[:3, :3] = np.array([
        [1, 0, 0],
        [0, np.cos(theta), -np.sin(theta)],
        [0, np.sin(theta), np.cos(theta)],
    ])
    M = np.eye(4)
    M[:3, :3] = np.asarray(quat_to_matrix(jnp.asarray(pose[3:])))
    M[:3, 3] = pose[:3]
    M2 = np.linalg.inv(T) @ M @ T
    out = np.zeros(7)
    out[3:] = np.asarray(matrix_to_quat(jnp.asarray(M2[:3, :3])))
    out[:3] = M2[:3, 3]
    return out


def get_epipolar(point_h, pose):
    """Point (3,) homogeneous in image 1 + 7-D pose -> epipolar line slope &
    intercept in image 2 (reference :107-131)."""
    E = np.asarray(essential_from_pose(jnp.asarray(pose)))
    F = np.asarray(fundamental_from_essential(
        jnp.asarray(E), jnp.asarray(INTRINSICS), jnp.asarray(INTRINSICS)))
    line = np.asarray(compute_correspond_epilines(
        jnp.asarray(point_h[None]), jnp.asarray(F)))[0]
    m, b = epiline_slope_intercept(jnp.asarray(line))
    return float(m), float(b)


colors = [
    np.array([197, 27, 125]),        # pink
    np.array([215, 48, 39]),         # red
    np.array([252, 141, 89]) - 60,   # light_orange
    np.array([175, 141, 195]),       # light_purple
    np.array([145, 191, 219]),       # light_blue
    np.array([161, 215, 106]) + 20,  # light_green
    np.array([77, 146, 33]) + 20,    # green
    np.array([118, 42, 131]) + 20,   # purple
    np.array([240, 10, 20]),         # red
]


def main():
    startx = -1 + 2 / (epipolar_points_x + 1)
    stopx = 1
    stepx = 2 / (epipolar_points_x + 1)
    starty = -1 + 2 / (epipolar_points_y + 1)
    stopy = 1
    stepy = 2 / (epipolar_points_y + 1)

    def color_for(y1, y2):
        pctx = (y1 - startx) / (stopx - startx)
        pcty = (y2 - starty) / (stopy - starty)
        idx = int(pctx * (epipolar_points_x - 1) * epipolar_points_x
                  + pcty * epipolar_points_y)
        c = colors[idx]
        return (int(c[0]), int(c[1]), int(c[2]))

    # dots on image 1
    image_bg = cv2.imread(curr_path1)
    for y1 in np.arange(startx, stopx, stepx):
        for y2 in np.arange(starty, stopy, stepy):
            y1_img = int((y1 + 1) / 2 * image_bg.shape[1])
            y2_img = int((y2 + 1) / 2 * image_bg.shape[0])
            cv2.circle(image_bg, (y1_img, y2_img), radius,
                       color_for(y1, y2), -1)
    cv2.imwrite(out_path1_points, image_bg)

    rel_pose = conjugate_by_x_rotation(np.copy(rel_pose_input))

    # epipolar lines on image 2
    image_bg = np.array(cv2.imread(curr_path2))
    image_epipolar = image_bg * 0
    img_width = image_bg.shape[1]
    for y1 in np.arange(startx, stopx, stepx):
        for y2 in np.arange(starty, stopy, stepy):
            y = np.array([(y1 + 1) / 2 * image_bg.shape[1],
                          (y2 + 1) / 2 * image_bg.shape[0], 1.0])
            m, b = get_epipolar(y, rel_pose)
            x0, y0 = 0, int(b)
            x_end, y_end = int(img_width), int(b + m * img_width)
            cv2.line(image_epipolar, (x0, y0), (x_end, y_end),
                     color_for(y1, y2), line_width)

    image = cv2.addWeighted(image_epipolar, 0.6, image_bg, 0.8, 0)
    cv2.imwrite(out_path2_lines, image)
    print("wrote", out_path1_points, "and", out_path2_lines)


if __name__ == "__main__":
    main()
