#!/usr/bin/env python
"""InteriorNet / StreetLearn evaluation CLI (parity with
``/root/reference/test_streetlearn_interiornet.py``).

Evaluates rotation error over the first 1000 sorted test pairs; reports
geodesic error (degrees) bucketed by GT rotation magnitude: "overlap large"
(< 45deg), "overlap small" (45-90deg); pairs >= 90deg dropped.  Writes
``output/<exp>/<set>_test/{results.txt, all_rotation_err_degrees.csv,
all_gt_rot_degrees.csv}``.
"""

import argparse
import os

import numpy as np

from rel_pose_tpu.config import add_model_flags, model_config_from_args
from rel_pose_tpu.utils.platform import apply_platform_env

apply_platform_env()
from rel_pose_tpu.data.base import image_read, image_read_cached
from rel_pose_tpu.geom.quaternion import (
    quat_to_matrix, relative_rotation_from_viewpoints,
    geodesic_angle_from_matrices,
)


def evaluation_metric_rotation(predict_rotation, gt_rotation, save_folder):
    """(reference :72-95) rotation matrices (N, 3, 3) -> bucketed errors."""
    import jax.numpy as jnp
    geodesic_err = np.asarray(geodesic_angle_from_matrices(
        jnp.asarray(predict_rotation), jnp.asarray(gt_rotation))) / np.pi * 180
    gt_distance = np.asarray(geodesic_angle_from_matrices(
        jnp.asarray(gt_rotation),
        jnp.broadcast_to(np.eye(3, dtype=np.float32), gt_rotation.shape)))

    large = geodesic_err[gt_distance < (np.pi / 4)]
    small = geodesic_err[(gt_distance >= np.pi / 4) & (gt_distance < np.pi / 2)]

    all_err = geodesic_err[gt_distance < (np.pi / 2)].astype(np.float32)
    all_gt = (gt_distance[gt_distance < (np.pi / 2)] / np.pi * 180).astype(
        np.float32)
    np.savetxt(os.path.join(save_folder, "all_rotation_err_degrees.csv"),
               all_err, delimiter=",", fmt="%1.5f")
    np.savetxt(os.path.join(save_folder, "all_gt_rot_degrees.csv"),
               all_gt, delimiter=",", fmt="%1.5f")

    return {
        "rotation_geodesic_error_overlap_large": large,
        "rotation_geodesic_error_overlap_small": small,
    }


def eval_camera(predictions, save_folder):
    """(reference :97-122) quats -> matrices -> bucketed mean/median/10deg."""
    import jax.numpy as jnp
    pred = np.asarray(predictions["camera"]["preds"]["rot"], dtype=np.float64)
    gt = np.asarray(predictions["camera"]["gts"]["rot"], dtype=np.float64)
    r_pred = np.asarray(quat_to_matrix(jnp.asarray(
        pred / np.linalg.norm(pred, axis=-1, keepdims=True))))
    r_gt = np.asarray(quat_to_matrix(jnp.asarray(
        gt / np.linalg.norm(gt, axis=-1, keepdims=True))))
    res_error = evaluation_metric_rotation(r_pred, r_gt, save_folder)

    all_res = {}
    for k, v in res_error.items():
        v = v.reshape(-1)
        if v.size == 0:
            continue
        all_res.update({
            k + "/mean": np.mean(v),
            k + "/median": np.median(v),
            k + "/10deg": np.true_divide((v <= 10).sum(), v.shape[0]),
        })
    return all_res


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datapath", required=True)
    parser.add_argument("--weights")
    parser.add_argument("--image_size", default=[384, 512])
    parser.add_argument("--exp", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--dataset", default="interiornet",
                        choices=("interiornet", "streetlearn"))
    parser.add_argument("--gamma", type=float, default=0.9)
    parser.add_argument("--streetlearn_interiornet_type", default="",
                        choices=("", "nooverlap", "T", "nooverlapT"))
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--decode_workers", type=int, default=0,
                        help="image-decode threads; 0 = min(8, cpu_count)")
    add_model_flags(parser)
    args = parser.parse_args()

    import jax.numpy as jnp
    from rel_pose_tpu.train.step import make_forward_fn
    from rel_pose_tpu.geom.quaternion import matrix_to_quat
    from demo import load_params

    cfg = model_config_from_args(args)

    # metadata selection (:158-174).  NOTE: "nooverlap"/"nooverlapT" are
    # accepted choices but alias to the rotation set — the reference's own
    # dispatch only distinguishes type == 'T' (ref :158-172), so this is
    # deliberate CLI parity, not a bug.
    if args.dataset == "interiornet":
        if args.streetlearn_interiornet_type == "T":
            meta = "metadata/interiornetT/test_pair_translation.npy"
            output_folder = "interiornetT_test"
        else:
            meta = "metadata/interiornet/test_pair_rotation.npy"
            output_folder = "interiornet_test"
    else:
        if args.streetlearn_interiornet_type == "T":
            meta = "metadata/streetlearnT/test_pair_translation.npy"
            output_folder = "streetlearnT_test"
            args.dataset = "streetlearn_2016"
        else:
            meta = "metadata/streetlearn/test_pair_rotation.npy"
            output_folder = "streetlearn_test"

    dset = np.load(os.path.join(args.datapath, meta), allow_pickle=True)
    dset = np.array(dset, ndmin=1)[0]

    print("performing evaluation on %s set using model %s"
          % (output_folder, args.ckpt))
    full_output_folder = os.path.join("output", args.exp, output_folder)
    os.makedirs(full_output_folder, exist_ok=True)

    params, bn_state = load_params(args.ckpt, cfg)

    # batch-sharded inference over every LOCAL chip when possible, and
    # multi-process (pod) eval via strided test-set sharding + prediction
    # all-gather (see test_matterport.py; result-identical,
    # tests/test_parallel_eval.py + tests/test_multihost.py)
    import jax
    pc, pi = jax.process_count(), jax.process_index()
    local = jax.local_devices()
    if len(local) > 1 and args.batch % len(local) == 0:
        from rel_pose_tpu.parallel import (make_mesh, batch_sharding,
                                           replicated_sharding)
        mesh = make_mesh(devices=local)
        fwd = make_forward_fn(cfg, mesh=mesh)
        rs = replicated_sharding(mesh)
        bs = batch_sharding(mesh)
        params, bn_state = jax.tree.map(
            lambda x: jax.device_put(x, rs), (params, bn_state))
        place = lambda t: jax.tree.map(          # noqa: E731
            lambda x: jax.device_put(x, bs), t)
        print(f"eval sharded over {len(local)} local devices")
    else:
        if len(local) > 1:
            print(f"NOTE: --batch {args.batch} is not divisible by the "
                  f"{len(local)} local devices; falling back to "
                  f"single-device eval (use --batch a multiple of "
                  f"{len(local)} for sharded eval)")
        fwd = make_forward_fn(cfg)
        place = lambda t: t  # noqa: E731

    intrinsics = np.array([[128, 128, 128, 128]] * 2, dtype=np.float32)
    predictions = {"camera": {"preds": {"tran": [], "rot": []},
                              "gts": {"tran": [], "rot": []}}}

    items = sorted(dset.items())[:1000]  # first 1000 pairs (:194)
    if pc > 1:
        total_pairs = len(items)
        items = items[pi::pc]
        print(f"process {pi}/{pc}: evaluating {len(items)} "
              f"of {total_pairs} pairs")

    from tqdm import tqdm
    from concurrent.futures import ThreadPoolExecutor

    B = args.batch
    workers = args.decode_workers or min(8, os.cpu_count() or 1)
    try:  # one cv2 parallel region per decode thread oversubscribes
        import cv2
        # single decode worker: negative restores cv2's own default pool
        cv2.setNumThreads(max(1, (os.cpu_count() or 1) // workers)
                          if workers > 1 else -1)
    except Exception:
        pass
    decode_ex = ThreadPoolExecutor(max_workers=workers)

    # decode-cache lever only (RELPOSE_DECODE_CACHE_MB): unlike the
    # Matterport CLI there is no fixed-size in-graph resize here — the
    # model sees the native resolution, so a reduced-scale decode would
    # change the input geometry; reduce is deliberately not honored.
    def load_pair(item):
        _, rec = item
        img1 = image_read_cached(os.path.join(args.datapath, "data",
                                              args.dataset,
                                              rec["img1"]["path"]))
        img2 = image_read_cached(os.path.join(args.datapath, "data",
                                              args.dataset,
                                              rec["img2"]["path"]))
        # stay uint8 end-to-end: 4x less host->device transfer; the model's
        # in-graph cast makes the poses bitwise-identical
        return np.ascontiguousarray(
            np.stack([img1, img2]).transpose(0, 3, 1, 2))

    def make_chunk(start):
        chunk = items[start:start + B]
        images = np.stack(list(decode_ex.map(load_pair, chunk)))
        pad = B - len(chunk)
        if pad:  # pad ragged final chunk: avoid an extra XLA compile
            images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
        return chunk, images

    starts = list(range(0, len(items), B))
    # one-chunk lookahead: chunk k+1 decodes on host threads while the
    # device runs chunk k's forward (cv2 releases the GIL)
    pipeline = ThreadPoolExecutor(max_workers=1)
    pending = pipeline.submit(make_chunk, starts[0]) if starts else None
    for n, start in enumerate(tqdm(starts)):
        chunk, images = pending.result()
        if n + 1 < len(starts):
            pending = pipeline.submit(make_chunk, starts[n + 1])
        gts = []
        for i, rec in chunk:
            gt_rmat = np.asarray(relative_rotation_from_viewpoints(
                rec["img1"]["x"], rec["img1"]["y"],
                rec["img2"]["x"], rec["img2"]["y"]))
            gts.append(np.asarray(matrix_to_quat(jnp.asarray(gt_rmat))))
        intr = np.tile(intrinsics[None], (images.shape[0], 1, 1))
        images, intr = place((jnp.asarray(images), jnp.asarray(intr)))
        poses = np.asarray(fwd(params, bn_state, images, intr))[:len(chunk)]

        for i in range(len(chunk)):
            predictions["camera"]["gts"]["tran"].append(np.zeros(3))
            predictions["camera"]["gts"]["rot"].append(gts[i])
            predictions["camera"]["preds"]["tran"].append(poses[i, 1, :3])
            predictions["camera"]["preds"]["rot"].append(poses[i, 1, 3:])

    if pc > 1:
        from test_matterport import _allgather_predictions
        predictions = _allgather_predictions(predictions)
        if pi != 0:
            return  # only process 0 computes and writes the metrics

    camera_metrics = eval_camera(predictions, full_output_folder)
    for k in camera_metrics:
        print(k, camera_metrics[k])
    with open(os.path.join(full_output_folder, "results.txt"), "w") as f:
        for k in camera_metrics:
            print(k, camera_metrics[k], file=f)


if __name__ == "__main__":
    main()
