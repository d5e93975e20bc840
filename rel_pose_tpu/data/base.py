"""Dataset base classes (host-side, pure numpy).

Functional equivalent of the reference's ``RGBDDataset``
(``/root/reference/src/data_readers/base.py``): each sample is
``(images (2, 3, H, W) uint8 BGR 0-255, poses (2, 7), intrinsics (2, 4))``
with pose 0 = identity and pose 1 = the relative pose (W-last quaternion).
Images are uint8 (the reference's ColorJitter output domain is PIL uint8
too); the model casts in-graph — 4x less host->device traffic.

Image decode uses cv2 when available (BGR, identical to the reference) and
falls back to PIL with an RGB->BGR flip.
"""

import numpy as np

try:
    import cv2
    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False
    from PIL import Image


def image_read(path):
    """Decode an image file to (H, W, 3) uint8 BGR (cv2.imread semantics)."""
    if _HAVE_CV2:
        img = cv2.imread(path)
        if img is None:
            raise IOError(f"failed to read image: {path}")
        return img
    img = np.asarray(Image.open(path).convert("RGB"))
    return img[:, :, ::-1].copy()


class RGBDDataset:
    """Base reader.  Subclasses implement ``_build_dataset`` returning
    ``{'images': [...], 'poses': [...], 'intrinsics': [...]}``."""

    #: whether __getitem__ should skip unreadable samples by advancing the
    #: index (reference behavior for InteriorNet/StreetLearn,
    #: ``base.py:70-97``)
    skip_bad_samples = False

    def __init__(self, name, datapath, reshape_size=(384, 512), subepoch=None,
                 is_training=True, streetlearn_interiornet_type="",
                 use_mini_dataset=False, augment=True, rng=None):
        from .augmentation import RGBDAugmentor

        self.root = datapath
        self.name = name
        self.streetlearn_interiornet_type = streetlearn_interiornet_type
        self.use_mini_dataset = use_mini_dataset
        self.is_training = is_training
        # NOTE: the reference applies the photometric augmentor to ALL splits
        # including validation (base.py:66,92 call it unconditionally); we
        # keep that semantic by default but let callers disable the
        # photometric part (the resize always runs — it is geometry, not
        # augmentation).
        if augment:
            self.aug = RGBDAugmentor(reshape_size, rng=rng)
        else:
            self.aug = RGBDAugmentor(reshape_size, rng=rng, brightness=0,
                                     contrast=0, saturation=0, hue=0,
                                     p_gray=0)
        self.reshape_size = reshape_size
        self.scene_info = self._build_dataset(subepoch)

    def _build_dataset(self, subepoch):
        raise NotImplementedError

    def _load(self, index):
        images_list = self.scene_info["images"][index]
        poses = np.stack(self.scene_info["poses"][index]).astype(np.float32)
        intrinsics = np.stack(
            self.scene_info["intrinsics"][index]).astype(np.float32)
        images = np.stack([image_read(p) for p in images_list])
        from .. import native
        if native.available():
            # fused uint8 HWC -> float32 CHW in C++ (GIL-free, threaded)
            chw = native.pair_to_chw_resize(images, images.shape[1:3])
        else:
            chw = None
        if chw is None:
            chw = images.astype(np.float32).transpose(0, 3, 1, 2)
        images, poses, intrinsics = self.aug(chw, poses, intrinsics)
        return images, poses, intrinsics

    def __getitem__(self, index):
        if not self.skip_bad_samples:
            return self._load(index)
        local = index
        # skip unreadable/corrupt samples by advancing (base.py:70-97)
        for _ in range(len(self)):
            try:
                return self._load(local % len(self))
            except Exception:
                local += 1
        raise RuntimeError("no readable samples in dataset")

    def __len__(self):
        return len(self.scene_info["images"])


class ConcatDataset:
    """Minimal concatenation of datasets (replaces
    torch.utils.data.ConcatDataset used at ``factory.py:10,23``)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, index):
        if index < 0:
            index += len(self)
        ds = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[ds][index - int(self._offsets[ds])]
