"""Native C++ host-pipeline tests: build, parity with numpy, throughput."""

import os
import time

import numpy as np
import pytest

from rel_pose_tpu import native
from rel_pose_tpu.data.augmentation import (
    RGBDAugmentor, _adjust_brightness, _adjust_contrast, _adjust_saturation,
    _adjust_hue, _rgb_to_gray,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")

RNG = np.random.default_rng(0)


class TestResize:
    def test_transpose_identity(self):
        imgs = RNG.integers(0, 255, (2, 60, 80, 3), dtype=np.uint8)
        out = native.pair_to_chw_resize(imgs, (60, 80))
        ref = imgs.transpose(0, 3, 1, 2).astype(np.float32)
        np.testing.assert_array_equal(out, ref)

    def test_torch_nearest_semantics(self):
        imgs = RNG.integers(0, 255, (2, 480, 640, 3), dtype=np.uint8)
        out = native.pair_to_chw_resize(imgs, (384, 512))
        rows = (np.arange(384) * 480) // 384
        cols = (np.arange(512) * 640) // 512
        ref = imgs[:, rows][:, :, cols].transpose(0, 3, 1, 2).astype(np.float32)
        np.testing.assert_array_equal(out, ref)

    def test_upscale(self):
        imgs = RNG.integers(0, 255, (1, 100, 100, 3), dtype=np.uint8)
        out = native.pair_to_chw_resize(imgs, (256, 256))
        rows = (np.arange(256) * 100) // 256
        ref = imgs[:, rows][:, :, rows].transpose(0, 3, 1, 2).astype(np.float32)
        np.testing.assert_array_equal(out, ref)


class TestJitterParity:
    def _numpy_chain(self, chw, draws):
        rgb = chw[:, ::-1] / 255.0
        fns = {0: _adjust_brightness, 1: _adjust_contrast,
               2: _adjust_saturation, 3: _adjust_hue}
        for code, f in draws:
            if code == 4:
                rgb = np.broadcast_to(_rgb_to_gray(rgb), rgb.shape).copy()
            else:
                rgb = np.clip(fns[code](rgb, f), 0.0, 1.0)
        return (rgb[:, ::-1] * 255.0).astype(np.float32)

    def test_each_op(self):
        chw = RNG.uniform(0, 255, (2, 3, 64, 64)).astype(np.float32)
        for draws in ([(0, 1.2)], [(1, 0.8)], [(2, 1.15)], [(3, 0.07)],
                      [(3, -0.1)], [(4, 0.0)]):
            nat = native.color_jitter(chw.copy(), [d[0] for d in draws],
                                      [d[1] for d in draws])
            ref = self._numpy_chain(chw, draws)
            np.testing.assert_allclose(nat, ref, atol=0.05,
                                       err_msg=str(draws))

    def test_full_chain(self):
        chw = RNG.uniform(0, 255, (2, 3, 120, 160)).astype(np.float32)
        draws = [(2, 1.1), (0, 0.85), (3, 0.05), (1, 1.2), (4, 0.0)]
        nat = native.color_jitter(chw.copy(),
                                  [d[0] for d in draws],
                                  [d[1] for d in draws])
        ref = self._numpy_chain(chw, draws)
        np.testing.assert_allclose(nat, ref, atol=0.1)

    def test_fused_bitwise_equals_multipass(self):
        """The cache-tiled fused kernel (one DRAM pass for the whole chain)
        must be BIT-identical to the one-pass-per-op reference path, for
        every op order incl. contrast-position variants."""
        chw = RNG.uniform(0, 255, (2, 3, 120, 160)).astype(np.float32)
        chains = [
            [(3, 0.06), (0, 1.2), (1, 0.85), (2, 1.1), (4, 0.0)],
            [(1, 0.9)],                      # contrast-only
            [(1, 1.1), (3, -0.1)],           # contrast first
            [(0, 0.8), (2, 1.2), (3, -0.1), (1, 1.15)],  # contrast last
            [(0, 1.05), (2, 0.95)],          # no contrast
            [(4, 0.0)],
        ]
        for draws in chains:
            ops = [d[0] for d in draws]
            vals = [d[1] for d in draws]
            multi = np.ascontiguousarray(chw.copy())
            fused = np.ascontiguousarray(chw.copy())
            native.color_jitter(multi, ops, vals, fused=False)
            native.color_jitter(fused, ops, vals, fused=True)
            np.testing.assert_array_equal(fused, multi, err_msg=str(draws))

    def test_augmentor_uses_native(self):
        aug = RGBDAugmentor((100, 120), rng=np.random.default_rng(5))
        images = RNG.uniform(0, 255, (2, 3, 120, 160)).astype(np.float32)
        out, _, intr = aug(images, None, np.array([[100., 100, 60, 80]] * 2))
        assert out.shape == (2, 3, 100, 120)
        assert out.min() >= 0 and out.max() <= 255


class TestResizeQuantize:
    def test_matches_numpy_epilogue(self):
        """native.resize_quantize == the numpy resize + rint + clip +
        astype(uint8) chain it replaces, bitwise (nearbyintf and np.rint
        both round half to even)."""
        x = RNG.uniform(-5, 260, (2, 3, 37, 53)).astype(np.float32)
        # include exact .5 values to pin the rounding mode
        x[0, 0, :4, :4] = np.array([[0.5, 1.5, 2.5, 3.5]] * 4,
                                   dtype=np.float32)
        x = np.ascontiguousarray(x)
        got = native.resize_quantize(x, (21, 32))
        rows = (np.arange(21) * 37) // 21
        cols = (np.arange(32) * 53) // 32
        ref = x[..., rows, :][..., cols]
        ref = np.clip(np.rint(ref), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(got, ref)

    def test_augmentor_epilogue_matches_fallback(self, monkeypatch):
        """Full augmentor output: native fused epilogue vs the numpy path
        (same RNG draws)."""
        images = np.ascontiguousarray(
            RNG.uniform(0, 255, (2, 3, 96, 128)).astype(np.float32))
        intr = np.array([[90., 95, 60, 45]] * 2, np.float32)
        a1 = RGBDAugmentor((64, 96), rng=np.random.default_rng(9))
        o1, _, i1 = a1(images.copy(), None, intr.copy())
        monkeypatch.setenv("RELPOSE_NO_NATIVE", "1")
        import rel_pose_tpu.native as nat
        old = nat._lib
        nat._lib = False
        try:
            a2 = RGBDAugmentor((64, 96), rng=np.random.default_rng(9))
            o2, _, i2 = a2(images.copy(), None, intr.copy())
        finally:
            nat._lib = old
        np.testing.assert_allclose(i1, i2, rtol=1e-6)
        diff = (o1.astype(np.int16) - o2.astype(np.int16))
        # jitter math differs by float assoc. at the quantization boundary
        assert np.mean(np.abs(diff) > 1) < 1e-3
        assert np.abs(diff).max() <= 2
