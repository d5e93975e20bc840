"""Golden regression anchors.

The reference's de-facto regression test is its demo golden outputs
(``/root/reference/demo.py:104-122``) — fixed inputs through fixed weights.
The pretrained ``.pth`` files are not available in this sandbox, so the
anchor here is the same idea with deterministic synthetic weights + inputs:
any change to preprocessing, the trunk, positional encodings, the essential
module, or normalization shifts these values.

Values recorded on the CPU backend (fp32, exact path).
"""

import numpy as np
import jax
import jax.numpy as jnp

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init, vitess_forward

GOLDEN_POSE1 = np.array([
    -0.12010474, 0.00450058, -0.04490248, -0.2293081, 0.11661223,
    0.53913093, -0.80197072])


def _setup(cfg):
    params, state = vitess_init(jax.random.PRNGKey(42), cfg)
    rng = np.random.default_rng(1234)
    images = jnp.asarray(rng.uniform(0, 255, (1, 2, 3, 384, 512))
                         .astype(np.float32))
    intr = jnp.asarray(np.tile(
        np.array([[517.97, 517.97, 320, 240]], np.float32), (1, 2, 1)))
    return params, state, images, intr


class TestGoldenForward:
    def test_full_forward_anchor(self):
        cfg = ModelConfig()
        params, state, images, intr = _setup(cfg)
        poses, _ = vitess_forward(params, state, cfg, images, intr,
                                  training=False)
        np.testing.assert_allclose(np.asarray(poses[0, 1]), GOLDEN_POSE1,
                                   atol=2e-4)

    def test_bf16_close_to_fp32(self):
        """The bf16 speed mode must stay within bf16-rounding distance of
        the fp32 result (pose values are O(1))."""
        cfg32 = ModelConfig()
        cfg16 = ModelConfig(compute_dtype="bfloat16")
        params, state, images, intr = _setup(cfg32)
        p32, _ = vitess_forward(params, state, cfg32, images, intr)
        p16, _ = vitess_forward(params, state, cfg16, images, intr)
        # translation block unbounded, quaternion unit-norm: compare both
        np.testing.assert_allclose(np.asarray(p16), np.asarray(p32),
                                   atol=0.08)
        # rotation agreement: quaternion dot close to +-1
        q32 = np.asarray(p32[0, 1, 3:])
        q16 = np.asarray(p16[0, 1, 3:])
        assert abs(float(np.dot(q32, q16))) > 0.995

    def test_batch_invariance(self):
        """Eval results must be independent of batching (BN in eval mode) —
        the batched eval CLIs rely on this."""
        cfg = ModelConfig()
        params, state, images, intr = _setup(cfg)
        images3 = jnp.concatenate([images, images * 0.5, images], axis=0)
        intr3 = jnp.tile(intr, (3, 1, 1))
        p1, _ = vitess_forward(params, state, cfg, images, intr)
        p3, _ = vitess_forward(params, state, cfg, images3, intr3)
        np.testing.assert_allclose(np.asarray(p3[0]), np.asarray(p1[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(p3[2]), np.asarray(p1[0]),
                                   atol=1e-5)
