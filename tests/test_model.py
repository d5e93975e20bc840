"""End-to-end model tests: shapes, jit, gradients, all ablation paths."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init, vitess_forward, normalize_preds
from rel_pose_tpu.geom import geodesic_loss

RNG = np.random.default_rng(11)


def fake_batch(B=2, hw=(384, 512)):
    images = RNG.uniform(0, 255, (B, 2, 3, *hw)).astype(np.float32)
    intrinsics = np.tile(
        np.array([[517.97, 517.97, 320, 240]], dtype=np.float32), (B, 2, 1))
    return jnp.array(images), jnp.array(intrinsics)


def n_params(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


class TestForward:
    def test_default_config(self):
        cfg = ModelConfig()
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        images, intr = fake_batch(2)
        poses, new_state = vitess_forward(params, state, cfg, images, intr)
        assert poses.shape == (2, 2, 7)
        assert np.isfinite(np.asarray(poses)).all()
        # pose 0 pinned to identity
        np.testing.assert_allclose(np.asarray(poses[:, 0, 6]), 1.0)
        np.testing.assert_allclose(np.asarray(poses[:, 0, :6]), 0.0)
        # quaternion block of pose 1 is unit-normalized
        qn = np.linalg.norm(np.asarray(poses[:, 1, 3:]), axis=-1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-5)

    def test_jit_and_small_input(self):
        cfg = ModelConfig()
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        images, intr = fake_batch(1, hw=(256, 256))

        fwd = jax.jit(
            lambda p, s, im, K: vitess_forward(p, s, cfg, im, K),
        )
        poses, _ = fwd(params, state, images, intr)
        assert poses.shape == (1, 2, 7)
        assert np.isfinite(np.asarray(poses)).all()

    def test_param_count_matches_reference_arch(self):
        """Sanity-check the fusion-transformer parameter budget: the pose MLP
        fc1 must consume H=26880 features (src/model.py:61)."""
        cfg = ModelConfig()
        params, _ = vitess_init(jax.random.PRNGKey(0), cfg)
        assert params["pose_regressor"]["fc1"]["w"].shape == (26880, 512)
        assert params["cross_block"]["cross_attn"]["proj_fundamental"][
            "w"].shape == (210, 192)
        assert len(params["blocks"]) == 5
        assert params["pos_embed"].shape == (1, 576, 192)

    def test_no_pos_encoding(self):
        cfg = ModelConfig(no_pos_encoding=True)
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        assert params["pose_regressor"]["fc1"]["w"].shape == (24576, 512)
        images, intr = fake_batch(1)
        poses, _ = vitess_forward(params, state, cfg, images, intr)
        assert poses.shape == (1, 2, 7)

    def test_noess(self):
        cfg = ModelConfig(noess=True)
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        assert params["pose_regressor"]["fc1"]["w"].shape == (576 * 43, 512)
        images, intr = fake_batch(1)
        poses, _ = vitess_forward(params, state, cfg, images, intr)
        assert poses.shape == (1, 2, 7)
        assert np.isfinite(np.asarray(poses)).all()

    def test_no_fusion_transformer(self):
        cfg = ModelConfig(fusion_transformer=False)
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        assert params["pose_regressor"]["fc1"]["w"].shape == (34560, 512)
        images, intr = fake_batch(1)
        poses, _ = vitess_forward(params, state, cfg, images, intr)
        assert poses.shape == (1, 2, 7)
        assert np.isfinite(np.asarray(poses)).all()

    def test_cross_features_and_single_softmax(self):
        cfg = ModelConfig(cross_features=True, use_single_softmax=True)
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        images, intr = fake_batch(1)
        poses, _ = vitess_forward(params, state, cfg, images, intr)
        assert np.isfinite(np.asarray(poses)).all()

    def test_l1_pos_encoding(self):
        cfg = ModelConfig(l1_pos_encoding=True)
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        images, intr = fake_batch(1)
        poses, _ = vitess_forward(params, state, cfg, images, intr)
        assert np.isfinite(np.asarray(poses)).all()

    def test_bfloat16_compute(self):
        cfg = ModelConfig(compute_dtype="bfloat16")
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        images, intr = fake_batch(1)
        poses, _ = vitess_forward(params, state, cfg, images, intr)
        assert poses.dtype == jnp.float32
        assert np.isfinite(np.asarray(poses)).all()

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_uint8_input_matches_float(self, dtype):
        """uint8 images (decode's native output) must produce bitwise the
        same poses as the float path: 0-255 integers are exact in both
        fp32 and bf16."""
        cfg = ModelConfig(compute_dtype=dtype, transformer_depth=2)
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        u8 = RNG.integers(0, 256, (2, 2, 3, 128, 160), dtype=np.uint8)
        intr = jnp.asarray(np.tile(
            np.array([[517.97, 517.97, 320, 240]], np.float32), (2, 2, 1)))
        pf, _ = vitess_forward(params, state, cfg,
                               jnp.asarray(u8.astype(np.float32)), intr)
        pu, _ = vitess_forward(params, state, cfg, jnp.asarray(u8), intr)
        np.testing.assert_array_equal(np.asarray(pu), np.asarray(pf))

    @pytest.mark.parametrize("hw,dtype", [((256, 256), "float32"),
                                          ((480, 640), "float32"),
                                          ((256, 256), "bfloat16")])
    def test_s2d_stem_matches_plain(self, hw, dtype, monkeypatch):
        """The eval space-to-depth stem (phase resize + folded 4x4/s1
        conv1, nn/resnet.fold_stem_s2d) is the same arithmetic as the
        plain resize + 7x7/s2 conv1 up to fp accumulation order."""
        cfg = ModelConfig(transformer_depth=2, compute_dtype=dtype)
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        u8 = RNG.integers(0, 256, (2, 2, 3) + hw, dtype=np.uint8)
        intr = jnp.asarray(np.tile(
            np.array([[517.97, 517.97, 320, 240]], np.float32), (2, 2, 1)))
        ps, _ = vitess_forward(params, state, cfg, jnp.asarray(u8), intr)
        monkeypatch.setenv("RELPOSE_NO_S2D_STEM", "1")
        pp, _ = vitess_forward(params, state, cfg, jnp.asarray(u8), intr)
        atol = 2e-4 if dtype == "float32" else 5e-2
        np.testing.assert_allclose(np.asarray(ps), np.asarray(pp),
                                   rtol=0, atol=atol)


class TestTraining:
    def test_grad_through_loss(self):
        cfg = ModelConfig()
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        images, intr = fake_batch(2)
        Ps = np.zeros((2, 2, 7), dtype=np.float32)
        Ps[..., 6] = 1.0
        Ps[:, 1, 0] = 0.5
        Ps = jnp.array(Ps)

        def loss_fn(p):
            poses, _ = vitess_forward(p, state, cfg, images, intr,
                                      training=True)
            tr, rot, _ = geodesic_loss(Ps, poses)
            return 10.0 * tr + 10.0 * rot

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # pose head must receive gradient
        g = np.asarray(grads["pose_regressor"]["fc3"]["w"])
        assert np.abs(g).max() > 0

    def test_bn_state_updates_in_training(self):
        cfg = ModelConfig()
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        images, intr = fake_batch(1)
        _, new_state = vitess_forward(params, state, cfg, images, intr,
                                      training=True)
        before = np.asarray(state["resnet"]["bn1"]["mean"])
        after = np.asarray(new_state["resnet"]["bn1"]["mean"])
        assert not np.allclose(before, after)
        # eval mode leaves state untouched
        _, same_state = vitess_forward(params, state, cfg, images, intr,
                                       training=False)
        np.testing.assert_allclose(
            np.asarray(same_state["resnet"]["bn1"]["mean"]), before)


class TestNormalizePreds:
    def test_floor_and_pin(self):
        Gs = np.zeros((1, 2, 7), dtype=np.float32)
        Gs[..., 6] = 1.0
        preds = np.zeros((1, 2, 7), dtype=np.float32)
        preds[0, 1] = [1, 2, 3, 0.001, 0, 0, 0.002]  # tiny quat: floor kicks in
        out = np.asarray(normalize_preds(jnp.array(Gs), jnp.array(preds)))
        np.testing.assert_allclose(out[0, 0], Gs[0, 0])
        np.testing.assert_allclose(out[0, 1, :3], [1, 2, 3])
        # |q| = 0.00224 < 0.01 -> divide by 0.01
        np.testing.assert_allclose(out[0, 1, 3], 0.1, atol=1e-5)
