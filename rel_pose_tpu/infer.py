"""Load-once / predict-many inference API — the serving layer.

The reference exposes single-pair inference only through ``demo.py``'s CLI
(``/root/reference/demo.py:30-101``) and batched inference only inside the
eval CLIs' loops (``/root/reference/test_matterport.py:96-150``); production
deployment wants an importable predictor that loads a checkpoint once,
compiles the forward once, and then serves arbitrary batches.

``PosePredictor`` wraps the same plumbing the CLIs use (``make_forward_fn``
+ the checkpoint loaders), adding the serving conveniences:

  * one fixed compiled batch shape (``batch_size=...``): requests are
    padded/chunked to it, so a fixed-resolution request stream compiles
    exactly once (the compiled shape also depends on the input H x W —
    see :meth:`PosePredictor.warmup`);
  * automatic data-parallel sharding over all local TPU chips when the
    batch divides them (eval-mode BN makes DP inference result-identical);
  * uint8 images end-to-end (4x less host->device traffic; the model's
    in-graph cast is bitwise-identical for 0-255 integers);
  * the dataset output conventions as explicit helpers
    (``matterport_eval_pose`` / ``matterport_demo_pose``) instead of
    inlined postprocessing.

Example::

    from rel_pose_tpu.infer import PosePredictor, MATTERPORT_INTRINSICS
    pred = PosePredictor.from_checkpoint(
        "out.ckpt", intrinsics=MATTERPORT_INTRINSICS,
        image_size=(384, 512), batch_size=256)
    poses = pred.predict_batch(images)        # (B, 2, 3, H, W) -> (B, 2, 7)
    pose = pred.predict(img1, img2)           # HWC BGR pair   -> (2, 7)
"""

import numpy as np

from .config import ModelConfig

# Camera intrinsics (fx, fy, cx, cy) baked into the reference CLIs:
# Matterport (ref test_matterport.py:114, demo.py:52), InteriorNet /
# StreetLearn 256x256 panorama crops (ref demo.py:55,
# test_streetlearn_interiornet.py:161).
MATTERPORT_INTRINSICS = np.array([517.97, 517.97, 320.0, 240.0], np.float32)
INTERIORNET_STREETLEARN_INTRINSICS = np.array(
    [128.0, 128.0, 128.0, 128.0], np.float32)

# Matterport metadata stores translations divided by 5 (ref base.py:21);
# both reference CLIs multiply it back out of the prediction.
DEPTH_SCALE = 5.0


def matterport_eval_pose(pose):
    """Model output -> the eval CLI's Matterport convention: quaternion
    W-last -> W-first (swap elements 3 and 6) and translation * DEPTH_SCALE
    (ref ``test_matterport.py:151-153``)."""
    pose = np.asarray(pose)
    out = pose.copy()
    out[..., 3] = pose[..., 6]
    out[..., 6] = pose[..., 3]
    out[..., :3] = pose[..., :3] * DEPTH_SCALE
    return out


def matterport_demo_pose(pose):
    """Model output -> the demo CLI's Matterport convention: translation *
    DEPTH_SCALE and the ``[4, 5, 3, 6]`` "yzxw -> xyzw" quaternion reorder
    (ref ``demo.py:89-92`` — a different reorder than the eval CLI's)."""
    pose = np.asarray(pose)
    out = pose.copy()
    out[..., :3] = pose[..., :3] * DEPTH_SCALE
    out[..., 3:] = np.stack(
        [pose[..., 4], pose[..., 5], pose[..., 3], pose[..., 6]], axis=-1)
    return out


def load_checkpoint_params(ckpt, cfg):
    """(params, bn_state) from a native ``.ckpt`` or a reference PyTorch
    ``.pth`` (converted on the fly, ``utils/convert.py``)."""
    if str(ckpt).endswith(".pth"):
        from .utils.convert import load_torch_checkpoint
        return load_torch_checkpoint(str(ckpt), cfg)
    import jax
    from .models import vitess_init
    from .train.checkpoint import load_params_only
    params, state = vitess_init(jax.random.PRNGKey(0), cfg)
    return load_params_only(str(ckpt), params, state)


class PosePredictor:
    """Batched relative-pose inference with a single compiled forward.

    Parameters
    ----------
    params, bn_state : the model pytrees (e.g. from
        :func:`load_checkpoint_params` or ``vitess_init``).
    cfg : ModelConfig (defaults to the reference architecture).
    intrinsics : default camera intrinsics — ``(4,)`` (fx, fy, cx, cy),
        ``(2, 4)`` per-image, or ``(B, 2, 4)`` per-pair; overridable per
        call.  No silent default: predictions depend on it through the
        epipolar positional encoding (ref ``src/model.py:100-109``).
    batch_size : fixed compiled batch.  Calls are padded/chunked to it,
        so a fixed-resolution request stream triggers one XLA
        compilation (per distinct input H x W).  ``None`` compiles per
        distinct request shape (fine for offline use; set it for
        serving).
    image_size : optional in-graph nearest-resize target (H, W) applied
        before the model, mirroring the eval CLIs' 384x512 Matterport
        resize (the model itself then resizes to its 224x224 input, ref
        ``src/model.py:125``).  ``None`` feeds images at their native
        resolution (the InteriorNet/StreetLearn convention).
    shard : shard each batch over all local devices when divisible
        (requires ``batch_size``; result-identical — eval-mode BN).
    """

    def __init__(self, params, bn_state, cfg=None, *, intrinsics=None,
                 batch_size=None, image_size=None, shard=True):
        import jax
        from .train.step import make_forward_fn

        self.cfg = cfg if cfg is not None else ModelConfig()
        self.batch_size = batch_size
        self.image_size = tuple(image_size) if image_size else None
        self._default_intr = (None if intrinsics is None
                              else np.asarray(intrinsics, np.float32))

        mesh = None
        local = jax.local_devices()
        if (shard and batch_size is not None and len(local) > 1
                and batch_size % len(local) == 0):
            from .parallel import (make_mesh, batch_sharding,
                                   replicated_sharding)
            mesh = make_mesh(devices=local)
            rs, bs = replicated_sharding(mesh), batch_sharding(mesh)
            params, bn_state = jax.tree.map(
                lambda x: jax.device_put(x, rs), (params, bn_state))
            self._place = lambda t: jax.tree.map(
                lambda x: jax.device_put(x, bs), t)
        else:
            self._place = lambda t: t
        self.mesh = mesh
        self.params, self.bn_state = params, bn_state
        self._fwd = make_forward_fn(self.cfg, mesh=mesh)

    @classmethod
    def from_checkpoint(cls, ckpt, cfg=None, **kwargs):
        """Build a predictor from a native ``.ckpt`` or reference ``.pth``."""
        cfg = cfg if cfg is not None else ModelConfig()
        params, bn_state = load_checkpoint_params(ckpt, cfg)
        return cls(params, bn_state, cfg, **kwargs)

    # ------------------------------------------------------------------
    def _as_images(self, images):
        """Accept (B,2,3,H,W) / (2,3,H,W) arrays or a list of (img1, img2)
        HWC-BGR pairs (``data.base.image_read`` output); return
        (B,2,3,H,W) uint8 (integer input) or float32."""
        if isinstance(images, (list, tuple)):
            images = np.stack(
                [np.stack([np.transpose(np.asarray(im), (2, 0, 1))
                           for im in pair]) for pair in images])
        images = np.asarray(images)
        if images.ndim == 4:
            images = images[None]
        if images.ndim != 5 or images.shape[1] != 2 or images.shape[2] != 3:
            raise ValueError(
                f"expected images (B, 2, 3, H, W), got {images.shape}")
        dtype = (np.uint8 if np.issubdtype(images.dtype, np.integer)
                 else np.float32)
        return np.ascontiguousarray(images.astype(dtype, copy=False))

    def _intr_for(self, batch, intrinsics):
        intr = (self._default_intr if intrinsics is None
                else np.asarray(intrinsics, np.float32))
        if intr is None:
            raise ValueError(
                "no intrinsics: pass intrinsics= here or at construction "
                "(e.g. infer.MATTERPORT_INTRINSICS or "
                "infer.INTERIORNET_STREETLEARN_INTRINSICS)")
        if intr.ndim == 1:
            intr = np.tile(intr[None], (2, 1))
        if intr.ndim == 2:
            intr = np.tile(intr[None], (batch, 1, 1))
        if intr.shape != (batch, 2, 4):
            raise ValueError(f"intrinsics shape {intr.shape} does not "
                             f"broadcast to ({batch}, 2, 4)")
        return intr

    def _run(self, images, intr):
        import jax.numpy as jnp
        from .ops.image import nearest_resize
        images, intr = self._place((jnp.asarray(images), jnp.asarray(intr)))
        if self.image_size is not None:
            images = nearest_resize(images, self.image_size)
        return np.asarray(self._fwd(self.params, self.bn_state, images,
                                    intr))

    # ------------------------------------------------------------------
    def predict_batch(self, images, intrinsics=None):
        """(B, 2, 3, H, W) images (or list of HWC pairs) -> (B, 2, 7) poses
        in the model's native convention (tx ty tz qx qy qz qw, pose 0
        pinned to the identity — ref ``src/model.py:145-159``)."""
        images = self._as_images(images)
        B = images.shape[0]
        if B == 0:
            return np.zeros((0, 2, 7), np.float32)
        intr = self._intr_for(B, intrinsics)
        K = self.batch_size
        if K is None:
            return self._run(images, intr)
        out = []
        for s in range(0, B, K):
            img_c, intr_c = images[s:s + K], intr[s:s + K]
            n = img_c.shape[0]
            if n < K:  # pad the ragged tail: one compiled shape, ever
                img_c = np.concatenate(
                    [img_c, np.repeat(img_c[-1:], K - n, 0)])
                intr_c = np.concatenate(
                    [intr_c, np.repeat(intr_c[-1:], K - n, 0)])
            out.append(self._run(img_c, intr_c)[:n])
        return np.concatenate(out)

    __call__ = predict_batch

    def predict(self, img1, img2, intrinsics=None):
        """One HWC-BGR image pair -> (2, 7) pose."""
        return self.predict_batch([(img1, img2)], intrinsics)[0]

    def warmup(self, height=None, width=None, dtype=np.uint8):
        """Trigger the (slow, one-time) XLA compilation with a dummy batch
        so the first real request is served at steady-state latency.

        The compiled shape is the *input* resolution: with ``image_size``
        set, the dummy defaults to it (the in-graph resize then maps any
        warmup choice onto the same compiled model shape); without it the
        compiled shape IS the native request resolution, so ``height`` /
        ``width`` are required and must match the resolution real
        requests will arrive at — warming up at any other size would
        leave the first real request paying the full compile anyway.

        The compiled *dtype* matters the same way: integer request arrays
        run as uint8 and float arrays as float32 (``_as_images``), each a
        distinct compilation.  ``dtype`` defaults to uint8 (the raw-image
        convention); pass ``dtype=np.float32`` when real requests will
        arrive pre-converted to float."""
        if height is None or width is None:
            if self.image_size is None:
                raise ValueError(
                    "warmup(height, width): pass the expected native "
                    "request resolution — image_size is not set, so the "
                    "compiled shape is the raw input shape (e.g. "
                    "warmup(256, 256) for InteriorNet/StreetLearn-style "
                    "traffic)")
            height, width = self.image_size
        B = self.batch_size or 1
        dummy = np.zeros((B, 2, 3, height, width), dtype)
        # Warmup only needs shapes, not real intrinsics: fall back to a
        # dummy when none are stored or when the stored default is
        # per-pair (B0, 2, 4) and cannot tile to the warmup batch.
        intr = self._default_intr
        if intr is None or (intr.ndim == 3 and intr.shape[0] != B):
            intr = np.ones(4, np.float32)
        self._run(dummy, self._intr_for(B, intr))
        return self
