"""Reduced CPU convergence gate: the real train step must actually LEARN.

The reference's training capability is fp32 SGD-to-convergence
(``/root/reference/train.py:140-203``); our production recommendation is
the bf16 speed mode, so both dtypes carry a convergence obligation that
per-step gradient checks cannot discharge — rounding compounds over many
steps (VERDICT r4 item 1).  The full-production-config proof is
``scripts/convergence_run.py`` executed on TPU v5e (2026-08-19, STATUS.md
round-5 table: fp32 rot 0.176 -> 0.00175 vs bf16 0.174 -> 0.00172 over
330 steps through the real ``train.py`` CLI).  This test pins a reduced
version in CI: the shared-pose overfit protocol at the tiny config
(depth 2, 4x4 feature grid, 64x64 images), driven through the REAL jitted
``make_train_step`` (value_and_grad + clip + Adam + OneCycle + BN state
threading), asserting an order-of-magnitude loss drop in both dtypes.

Composition note: on CPU the stock-XLA path runs (Pallas engages on TPU);
fused == unfused gradients are separately CI-gated by
``tests/test_grad_triangulation.py`` in interpret mode, so together the
two tests cover "the fused production step converges" without paying
interpret-mode's ~30 s/step here.

Cost calibration (1-core sandbox host): 64x64 images / 4x4 grid / B=1 is
~4 s/step; 50 steps give measured drops of 398x/45x (fp32 rot/tr) and
1316x/660x (bf16) against the 10x gate — ~400 s total for both dtypes.
The 96x128/B=2 variant was ~30 s/step (>30 min for the test) and the
margins were no better.
"""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init
from rel_pose_tpu.train import TrainState, make_optimizer, make_train_step

STEPS = 50


def _run(dtype):
    cfg = ModelConfig(compute_dtype=dtype, transformer_depth=2,
                      feature_height=4, feature_width=4, pool_size=4,
                      fc_hidden_size=64)
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(lr=3e-4, steps=STEPS, warmup=STEPS // 10)
    step_fn = make_train_step(cfg, tx)
    state = TrainState.create(params, bn_state, tx)

    rng = np.random.default_rng(0)
    B = 1
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 2, 3, 64, 64)).astype(np.float32))
    # one fixed real-magnitude relative pose shared across the batch —
    # the 63b8a61 overfit protocol at CI scale
    poses = np.zeros((B, 2, 7), np.float32)
    poses[..., 6] = 1.0
    poses[:, 1, :3] = (0.5, 0.1, -0.2)
    poses[:, 1, 3:] = (0.1, 0.2, 0.38, 0.9)
    poses[:, 1, 3:] /= np.linalg.norm(poses[0, 1, 3:])
    poses = jnp.asarray(poses)
    intr = jnp.asarray(np.tile(
        np.array([[517.97, 517.97, 32, 32]], np.float32), (B, 2, 1)))

    rot, tr = [], []
    for _ in range(STEPS):
        state, metrics, _ = step_fn(state, images, poses, intr)
        rot.append(float(metrics["train_geo_loss_rot"]))
        tr.append(float(metrics["train_geo_loss_tr"]))
    return rot, tr


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_train_step_converges(dtype):
    rot, tr = _run(dtype)
    # start from the first post-warmup-ish reading to dodge step-0 noise
    rot0, tr0 = max(rot[:5]), max(tr[:5])
    assert rot[-1] < rot0 / 10, (rot0, rot[-1])
    assert tr[-1] < tr0 / 10, (tr0, tr[-1])
    # sanity: the trajectory is a real descent, not one lucky endpoint —
    # the final loss must sit near the trajectory minimum (a dive-and-
    # blow-up run has rot[-1] far above min(rot))
    assert rot[-1] <= min(rot) * 1.5, (min(rot), rot[-1])
    assert not any(np.isnan(v) for v in rot + tr)


def test_convergence_run_refuses_mismatched_tree(tmp_path):
    """scripts/convergence_run.py trains both dtypes on one persisted
    synthetic tree; a tree built with the other --distinct protocol must
    be refused, not silently mislabeled in CONVERGENCE_SUMMARY.  (The
    guard exits before any training, so this is subprocess-cheap.)"""
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "convergence_run.py")
    sys.path.insert(0, os.path.dirname(script))
    try:
        from convergence_run import build_tree
    finally:
        sys.path.pop(0)
    tree = str(tmp_path / "matterport")
    build_tree(tree, n_pairs=1, hw=(32, 32))
    (tmp_path / "matterport" / "DISTINCT").write_text("False")
    r = subprocess.run(
        [sys.executable, script, "--root", str(tmp_path), "--distinct",
         "--steps", "1"], capture_output=True, text=True)
    assert r.returncode != 0
    assert "distinct=False" in (r.stderr + r.stdout)


def test_convergence_real_photo_tree(tmp_path):
    """``--real-photos`` builds a Matterport tree from the reference's 3
    real demo pairs (JPEG, batch-uniform 480x640) with DISTINCT per-pair
    poses — the tree the on-TPU real-photo convergence run trains on
    (STATUS.md round-5)."""
    script_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    sys.path.insert(0, script_dir)
    try:
        from convergence_run import REF_DEMO, build_tree
    finally:
        sys.path.pop(0)
    if not os.path.isdir(REF_DEMO):
        import pytest
        pytest.skip("reference demo photos not present")
    import json
    import cv2
    tree = str(tmp_path / "matterport")
    build_tree(tree, real_photos=True)
    imgs = sorted(os.listdir(os.path.join(tree, "imgs")))
    assert imgs == [f"r{i}_{j}.jpg" for i in range(3) for j in range(2)]
    for f in imgs:
        img = cv2.imread(os.path.join(tree, "imgs", f))
        assert img is not None and img.shape == (480, 640, 3), f
    data = json.load(open(os.path.join(
        tree, "mp3d_planercnn_json", "cached_set_train.json")))["data"]
    rots = [tuple(e["rel_pose"]["rotation"]) for e in data]
    assert len(set(rots)) == 3  # distinct poses
    for e in data:
        q = np.array(e["rel_pose"]["rotation"])
        assert abs(np.linalg.norm(q) - 1) < 1e-6 and q[0] >= 0
