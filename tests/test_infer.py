"""PosePredictor serving API: equivalence with the raw jitted forward the
CLIs use, input/intrinsics normalization, ragged-batch chunking, checkpoint
round-trip, and the dataset postprocessing helpers (pinned against the
reference conventions: ``/root/reference/test_matterport.py:151-153`` and
``/root/reference/demo.py:89-92``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init
from rel_pose_tpu import infer
from rel_pose_tpu.infer import PosePredictor

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(transformer_depth=2, feature_height=8,
                      feature_width=8, pool_size=8, fc_hidden_size=64)
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, bn_state


def _images(b, h=96, w=128):
    return RNG.integers(0, 256, (b, 2, 3, h, w), dtype=np.uint8)


INTR = np.array([517.97, 517.97, 64.0, 48.0], np.float32)


class TestPredictor:
    def test_matches_forward_fn(self, tiny_model):
        """predict_batch == the CLIs' make_forward_fn on the same arrays."""
        cfg, params, bn_state = tiny_model
        from rel_pose_tpu.train.step import make_forward_fn
        images = _images(3)
        intr = np.tile(INTR[None, None], (3, 2, 1))
        want = np.asarray(make_forward_fn(cfg)(
            params, bn_state, jnp.asarray(images), jnp.asarray(intr)))
        pred = PosePredictor(params, bn_state, cfg, intrinsics=INTR)
        got = pred.predict_batch(images)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
        assert got.shape == (3, 2, 7)

    def test_chunked_padded_equals_unchunked(self, tiny_model):
        """batch_size=2 over 5 pairs (3 chunks, ragged tail padded) gives
        the same poses as one unchunked call."""
        cfg, params, bn_state = tiny_model
        images = _images(5)
        free = PosePredictor(params, bn_state, cfg, intrinsics=INTR)
        fixed = PosePredictor(params, bn_state, cfg, intrinsics=INTR,
                              batch_size=2, shard=False)
        np.testing.assert_allclose(fixed.predict_batch(images),
                                   free.predict_batch(images),
                                   rtol=0, atol=0)

    def test_pair_and_list_inputs(self, tiny_model):
        """predict(img1, img2) (HWC pair) == predict_batch of the CHW
        array form."""
        cfg, params, bn_state = tiny_model
        images = _images(1)
        pred = PosePredictor(params, bn_state, cfg, intrinsics=INTR)
        img1, img2 = (np.transpose(images[0, i], (1, 2, 0))
                      for i in range(2))
        np.testing.assert_allclose(pred.predict(img1, img2),
                                   pred.predict_batch(images)[0],
                                   rtol=0, atol=0)

    def test_intrinsics_broadcast_and_required(self, tiny_model):
        cfg, params, bn_state = tiny_model
        images = _images(2)
        pred = PosePredictor(params, bn_state, cfg)
        with pytest.raises(ValueError, match="intrinsics"):
            pred.predict_batch(images)
        full = np.tile(INTR[None, None], (2, 2, 1))
        np.testing.assert_allclose(
            pred.predict_batch(images, intrinsics=INTR),
            pred.predict_batch(images, intrinsics=full), rtol=0, atol=0)
        with pytest.raises(ValueError, match="broadcast"):
            pred.predict_batch(images, intrinsics=np.ones((3, 2, 4)))

    def test_image_size_resize(self, tiny_model):
        """image_size=(H, W) == resizing outside, as the Matterport eval
        CLI does (test_matterport.py uses (384, 512))."""
        from rel_pose_tpu.ops.image import nearest_resize
        cfg, params, bn_state = tiny_model
        images = _images(2, h=120, w=160)
        plain = PosePredictor(params, bn_state, cfg, intrinsics=INTR)
        sized = PosePredictor(params, bn_state, cfg, intrinsics=INTR,
                              image_size=(96, 128))
        resized = np.asarray(nearest_resize(jnp.asarray(images), (96, 128)))
        np.testing.assert_allclose(sized.predict_batch(images),
                                   plain.predict_batch(resized),
                                   rtol=0, atol=0)

    def test_sharded_equals_single_device(self, tiny_model):
        """batch sharded over the 8 virtual CPU devices == single device
        (eval-mode BN makes DP inference result-identical)."""
        cfg, params, bn_state = tiny_model
        images = _images(8)
        single = PosePredictor(params, bn_state, cfg, intrinsics=INTR,
                               batch_size=8, shard=False)
        sharded = PosePredictor(params, bn_state, cfg, intrinsics=INTR,
                                batch_size=8, shard=True)
        assert sharded.mesh is not None and sharded.mesh.size == 8
        np.testing.assert_allclose(sharded.predict_batch(images),
                                   single.predict_batch(images),
                                   rtol=0, atol=1e-5)

    def test_from_checkpoint_roundtrip(self, tiny_model, tmp_path):
        cfg, params, bn_state = tiny_model
        from rel_pose_tpu.train.checkpoint import save_checkpoint
        path = str(tmp_path / "m.ckpt")
        save_checkpoint(path, {"params": params, "bn_state": bn_state})
        pred = PosePredictor.from_checkpoint(path, cfg, intrinsics=INTR)
        images = _images(2)
        want = PosePredictor(params, bn_state, cfg,
                             intrinsics=INTR).predict_batch(images)
        np.testing.assert_allclose(pred.predict_batch(images), want,
                                   rtol=0, atol=0)

    def test_warmup_compiles(self, tiny_model):
        cfg, params, bn_state = tiny_model
        pred = PosePredictor(params, bn_state, cfg, intrinsics=INTR)
        assert pred.warmup(height=96, width=128) is pred

    def test_warmup_then_no_recompile(self, tiny_model):
        """warmup() at the declared resolution compiles the forward ONCE;
        the first real request at that resolution adds no jit cache entry
        (the serving promise the warmup exists for)."""
        cfg, params, bn_state = tiny_model
        pred = PosePredictor(params, bn_state, cfg, intrinsics=INTR,
                             batch_size=2, shard=False)
        pred.warmup(height=96, width=128)
        n = pred._fwd._cache_size()
        assert n == 1
        pred.predict_batch(_images(5))  # 3 chunks incl. padded tail
        assert pred._fwd._cache_size() == n

    def test_warmup_defaults_to_image_size(self, tiny_model):
        """With image_size set, warmup() needs no dims (the in-graph
        resize pins the compiled model shape); without it, warmup()
        requires the expected native resolution instead of silently
        compiling a shape real traffic never uses (ADVICE r4)."""
        cfg, params, bn_state = tiny_model
        sized = PosePredictor(params, bn_state, cfg, intrinsics=INTR,
                              image_size=(96, 128))
        sized.warmup()
        assert sized._fwd._cache_size() == 1
        sized.predict_batch(_images(1))  # resized in-graph -> no recompile
        assert sized._fwd._cache_size() == 1
        plain = PosePredictor(params, bn_state, cfg, intrinsics=INTR)
        with pytest.raises(ValueError, match="native"):
            plain.warmup()

    def test_warmup_dtype_matches_float_stream(self, tiny_model):
        """A float32 request stream is a distinct compilation from uint8
        (``_as_images`` keeps float input float32): warmup(dtype=
        np.float32) must leave the first float request recompile-free."""
        cfg, params, bn_state = tiny_model
        pred = PosePredictor(params, bn_state, cfg, intrinsics=INTR,
                             batch_size=2, shard=False)
        pred.warmup(height=96, width=128, dtype=np.float32)
        n = pred._fwd._cache_size()
        pred.predict_batch(_images(2).astype(np.float32))
        assert pred._fwd._cache_size() == n
        # ... while a uint8 request after a float-only warmup does compile
        pred.predict_batch(_images(2))
        assert pred._fwd._cache_size() == n + 1

    def test_warmup_with_per_pair_default_intrinsics(self, tiny_model):
        """A stored per-pair (B0, 2, 4) intrinsics default with B0 !=
        batch_size must not break warmup — it falls back to a dummy
        (warmup only needs shapes; ADVICE r4)."""
        cfg, params, bn_state = tiny_model
        intr = np.tile(INTR[None, None], (3, 2, 1))
        pred = PosePredictor(params, bn_state, cfg, intrinsics=intr,
                             batch_size=2, shard=False)
        assert pred.warmup(height=96, width=128) is pred

    def test_empty_batch(self, tiny_model):
        """B=0 returns an empty (0, 2, 7) instead of np.concatenate's
        'need at least one array' error (ADVICE r4)."""
        cfg, params, bn_state = tiny_model
        pred = PosePredictor(params, bn_state, cfg, intrinsics=INTR,
                             batch_size=2, shard=False)
        out = pred.predict_batch(np.zeros((0, 2, 3, 96, 128), np.uint8))
        assert out.shape == (0, 2, 7) and out.dtype == np.float32
        free = PosePredictor(params, bn_state, cfg, intrinsics=INTR)
        assert free.predict_batch(
            np.zeros((0, 2, 3, 96, 128), np.uint8)).shape == (0, 2, 7)

    def test_package_export(self):
        import rel_pose_tpu
        assert rel_pose_tpu.PosePredictor is PosePredictor


class TestPostprocessHelpers:
    def test_matterport_eval_pose(self):
        """Same transform the eval CLI inlines (W-last -> W-first swap +
        DEPTH_SCALE): ref test_matterport.py:151-153."""
        pose = RNG.normal(size=(4, 7)).astype(np.float32)
        got = infer.matterport_eval_pose(pose)
        for p, g in zip(pose, got):
            want = p.copy()
            want[3], want[6] = p[6], p[3]
            want[:3] = p[:3] * 5
            np.testing.assert_allclose(g, want)
        np.testing.assert_allclose(pose, pose)  # input untouched

    def test_matterport_demo_pose(self):
        """Same transform demo.py inlines (DEPTH_SCALE + [4,5,3,6]
        reorder): ref demo.py:89-92."""
        pose = RNG.normal(size=(7,)).astype(np.float32)
        got = infer.matterport_demo_pose(pose)
        want = pose.copy()
        want[:3] = pose[:3] * 5
        want[3:] = pose[[4, 5, 3, 6]]
        np.testing.assert_allclose(got, want)
