"""rel_pose_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for relative
camera-pose prediction, with the full capability surface of crockwell/rel_pose
("The 8-Point Algorithm as an Inductive Bias for Relative Pose Prediction by
ViTs", 3DV 2022).

Layer map (bottom-up):
  geom/     pure-JAX SE(3)/SO(3) Lie groups, quaternions, epipolar geometry
            (replaces the reference's lietorch C++/CUDA dep + scipy rotations)
  nn/       functional NN primitives (conv, BN, LN, MLP, ResNet-18 trunk)
  ops/      TPU compute ops: Pallas fused kernels, positional encodings,
            jitted image preprocessing
  models/   ViTEss: pair-of-images -> SE3 relative pose
  data/     host-side dataset readers (Matterport / InteriorNet / StreetLearn)
  parallel/ device-mesh + sharding utilities (pjit data parallelism over ICI,
            replacing DDP/NCCL)
  train/    training runtime: optax optimizer, train step, checkpoints, logger
  utils/    config dataclasses, torch->jax checkpoint conversion, profiling
"""

__version__ = "0.1.0"

# Public API (lazy — importing the package must not pull in jax for tools
# that only need metadata)


def __getattr__(name):
    if name in ("ModelConfig", "TrainConfig"):
        from . import config
        return getattr(config, name)
    if name in ("vitess_init", "vitess_forward", "normalize_preds"):
        from . import models
        return getattr(models, name)
    if name == "geodesic_loss":
        from .geom import geodesic_loss
        return geodesic_loss
    if name in ("PosePredictor", "load_checkpoint_params"):
        from . import infer
        return getattr(infer, name)
    raise AttributeError(f"module 'rel_pose_tpu' has no attribute {name!r}")
