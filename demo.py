#!/usr/bin/env python
"""Single-pair pose prediction demo (CLI parity with
``/root/reference/demo.py``).

Predicts the relative SE(3) pose between two images using a trained ViTEss
checkpoint (native ``.ckpt`` or a reference PyTorch ``.pth``, converted on
the fly).  Output format matches the reference exactly, including the
Matterport postprocessing quirks (DEPTH_SCALE undo + the ``[4,5,3,6]``
"yzxw -> xyzw" quaternion reorder, ``demo.py:89-92``).

Example:
  python demo.py --ckpt pretrained_models/matterport.pth \
      --img1 demo/matterport_1.png --img2 demo/matterport_2.png
"""

import argparse

import numpy as np

from rel_pose_tpu.config import add_model_flags, model_config_from_args
from rel_pose_tpu.utils.platform import apply_platform_env

apply_platform_env()
from rel_pose_tpu.data.base import image_read
from rel_pose_tpu.ops.image import nearest_resize


def load_params(ckpt, cfg):
    """Load (params, bn_state) from a native .ckpt or a reference .pth."""
    from rel_pose_tpu.infer import load_checkpoint_params
    return load_checkpoint_params(ckpt, cfg)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datapath")
    parser.add_argument("--weights")
    parser.add_argument("--image_size", default=[384, 512])
    parser.add_argument("--img1", required=True)
    parser.add_argument("--img2", required=True)
    parser.add_argument("--ckpt", required=True)
    add_model_flags(parser)
    args = parser.parse_args()
    args.fusion_transformer = True  # forced, as in demo.py:46

    import jax.numpy as jnp
    from rel_pose_tpu.train.step import make_forward_fn

    cfg = model_config_from_args(args)

    print("predicting pose on %s and %s using model %s"
          % (args.img1, args.img2, args.ckpt))

    is_matterport = "matterport" in args.ckpt
    if is_matterport:
        intrinsics = np.array([[517.97, 517.97, 320, 240]] * 2,
                              dtype=np.float32)
    else:
        intrinsics = np.array([[128, 128, 128, 128]] * 2, dtype=np.float32)

    params, bn_state = load_params(args.ckpt, cfg)

    images = np.stack([image_read(args.img1), image_read(args.img2)])
    # uint8 end-to-end (consistent with the eval CLIs): the model casts
    # in-graph, bitwise-identical to feeding floats
    images = np.ascontiguousarray(images.transpose(0, 3, 1, 2))[None]
    images = jnp.asarray(images)
    if is_matterport:
        images = nearest_resize(images, (384, 512))

    fwd = make_forward_fn(cfg)
    poses = np.asarray(fwd(params, bn_state, images,
                           jnp.asarray(intrinsics)[None]))

    preds = poses[0, 1].copy()
    pr_copy = preds.copy()
    if is_matterport:
        DEPTH_SCALE = 5
        preds[:3] = preds[:3] * DEPTH_SCALE
        # "yzxw -> xyzw" reorder (demo.py:92)
        preds[3:] = np.array([pr_copy[4], pr_copy[5], pr_copy[3], pr_copy[6]])

    np.set_printoptions(suppress=True, precision=5)
    if is_matterport:
        print("predicted R&t, as quaternion, in format x,y,z,qx,qy,qz,qw:")
        print(preds)
    else:
        print("predicted R, as quaternion in format qx,qy,qz,qw")
        print(preds[3:])


if __name__ == "__main__":
    main()


########## Expected outputs (reference golden values, demo.py:104-122) #######
#
# Matterport pair demo/matterport_1.png demo/matterport_2.png
#   pred: [ 2.17275  0.1722  -0.87071  0.00044  0.54702  0.10733  0.83021]
#   gt:   [ 2.73153  0.25285 -1.35598  0.00000  0.56102  0.10905  0.82059]
#
# InteriorNet-T pair demo/interiornet_t_1.png demo/interiornet_t_2.png
#   pred: [ 0.62947 -0.11058 -0.12595  0.75873]
#   gt:   [ 0.62734 -0.12698 -0.11345  0.75990]
#
# StreetLearn-T pair demo/streetlearn_t_1.png demo/streetlearn_t_2.png
#   pred: [ 0.39714  0.25738  0.18597  0.86108]
#   gt:   [ 0.39073  0.27050  0.19321  0.85838]
