#!/usr/bin/env python
"""Matterport test-split evaluation CLI (parity with
``/root/reference/test_matterport.py``).

Computes translation/rotation error statistics over
``mp3d_planercnn_json/cached_set_test.json`` and writes
``output/<exp>/matterport_test/{results.txt, gt_*_magnitude_vs_error.csv}``.

TPU-native additions vs the reference: batched jitted inference (the
reference runs batch 1; results are batch-size invariant since BatchNorm is
in eval mode) and host-side image decode overlapped with device compute.
"""

import argparse
import json
import os

import numpy as np

from rel_pose_tpu.config import add_model_flags, model_config_from_args
from rel_pose_tpu.utils.platform import apply_platform_env

apply_platform_env()
from rel_pose_tpu.data.base import image_read, image_read_cached

DEPTH_SCALE = 5


def eval_camera(predictions, exp, output_folder):
    """Metric suite (reference ``eval_camera``, test_matterport.py:27-68)."""
    acc_threshold = {"tran": 1.0, "rot": 30}

    pred_tran = np.vstack(predictions["camera"]["preds"]["tran"])
    pred_rot = np.vstack(predictions["camera"]["preds"]["rot"])
    gt_tran = np.vstack(predictions["camera"]["gts"]["tran"])
    gt_rot = np.vstack(predictions["camera"]["gts"]["rot"])

    top1_error = {
        "tran": np.linalg.norm(gt_tran - pred_tran, axis=1),
        "rot": 2 * np.arccos(np.clip(np.abs(
            np.sum(pred_rot * gt_rot, axis=1)), -1.0, 1.0)) * 180 / np.pi,
    }
    top1_accuracy = {
        k: (top1_error[k] < acc_threshold[k]).sum() / len(top1_error[k])
        for k in ("tran", "rot")
    }
    camera_metrics = {
        f"top1 T err < {acc_threshold['tran']}": top1_accuracy["tran"] * 100,
        f"top1 R err < {acc_threshold['rot']}": top1_accuracy["rot"] * 100,
        "T mean err": np.mean(top1_error["tran"]),
        "R mean err": np.mean(top1_error["rot"]),
        "T median err": np.median(top1_error["tran"]),
        "R median err": np.median(top1_error["rot"]),
    }

    gt_mags = {"tran": np.linalg.norm(gt_tran, axis=1),
               "rot": 2 * np.arccos(np.clip(gt_rot[:, 0], -1, 1)) * 180 / np.pi}
    out_dir = os.path.join("output", exp, output_folder)
    np.savetxt(os.path.join(out_dir, "gt_translation_magnitude_vs_error.csv"),
               np.stack([gt_mags["tran"], top1_error["tran"]], axis=1),
               delimiter=",", fmt="%1.5f")
    np.savetxt(os.path.join(out_dir, "gt_rotation_magnitude_vs_error.csv"),
               np.stack([gt_mags["rot"], top1_error["rot"]], axis=1),
               delimiter=",", fmt="%1.5f")
    return camera_metrics


def _allgather_predictions(predictions):
    """Multi-process eval: assemble the global per-pair prediction lists
    from every process's shard (collective; identical result on all)."""
    from rel_pose_tpu.parallel import allgather_ragged
    cam = predictions["camera"]
    g = allgather_ragged({
        "pt": (cam["preds"]["tran"], 3), "pr": (cam["preds"]["rot"], 4),
        "gt": (cam["gts"]["tran"], 3), "gr": (cam["gts"]["rot"], 4)})
    return {"camera": {
        "preds": {"tran": list(g["pt"]), "rot": list(g["pr"])},
        "gts": {"tran": list(g["gt"]), "rot": list(g["gr"])}}}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datapath", required=True)
    parser.add_argument("--weights")
    parser.add_argument("--image_size", default=[384, 512])
    parser.add_argument("--exp", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--gamma", type=float, default=0.9)
    parser.add_argument("--batch", type=int, default=16,
                        help="inference batch size (results are identical "
                             "to batch 1; larger = faster on TPU)")
    parser.add_argument("--decode_workers", type=int, default=0,
                        help="image-decode threads; 0 = min(8, cpu_count). "
                             "Decode of chunk k+1 overlaps device compute "
                             "of chunk k (cv2 releases the GIL)")
    add_model_flags(parser)
    args = parser.parse_args()

    import jax.numpy as jnp
    from rel_pose_tpu.train.step import make_forward_fn
    from demo import load_params

    cfg = model_config_from_args(args)

    with open(os.path.join(args.datapath,
                           "mp3d_planercnn_json/cached_set_test.json")) as f:
        test_split = json.load(f)
    dset = test_split["data"]
    output_folder = "matterport_test"
    print("performing evaluation on %s set using model %s"
          % (output_folder, args.ckpt))
    os.makedirs(os.path.join("output", args.exp, output_folder), exist_ok=True)

    params, bn_state = load_params(args.ckpt, cfg)

    # batch-sharded inference over every LOCAL chip when the batch divides
    # the local device count (the reference evals on one GPU; DP eval here
    # is result-identical — eval-mode BN — and tested on the 8-device CPU
    # mesh, tests/test_parallel_eval.py).  Multi-process (pod): each
    # process evaluates a strided shard of the test set on its own local
    # devices as an independent process-local computation; the per-pair
    # predictions are all-gathered afterwards and process 0 writes the
    # metrics (tested by the 2-process CPU cluster in
    # tests/test_multihost.py).
    import jax
    pc, pi = jax.process_count(), jax.process_index()
    if pc > 1:
        total_pairs = len(dset)
        dset = dset[pi::pc]
        print(f"process {pi}/{pc}: evaluating {len(dset)} "
              f"of {total_pairs} pairs")
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

    intrinsics = np.array([[517.97, 517.97, 320, 240]] * 2, dtype=np.float32)

    predictions = {"camera": {"preds": {"tran": [], "rot": []},
                              "gts": {"tran": [], "rot": []}}}

    # host decode levers (opt-in, data/base.py): RELPOSE_DECODE_REDUCE=k
    # decodes at 1/k scale (the in-graph nearest_resize to 384x512 below
    # restores the model-input geometry, so intrinsics semantics are
    # unchanged); RELPOSE_DECODE_CACHE_MB bounds an LRU of decoded images
    # (Matterport reuses images across pairs within a scene).
    reduce = int(os.environ.get("RELPOSE_DECODE_REDUCE", "1"))
    if reduce > 1:
        print(f"decoding at 1/{reduce} scale (RELPOSE_DECODE_REDUCE)")

    def load_pair(entry):
        imgs = []
        for imgnum in ("0", "1"):
            name = os.path.join(
                args.datapath,
                "/".join(str(entry[imgnum]["file_name"]).split("/")[6:]))
            imgs.append(image_read_cached(name, reduce))
        # stay uint8 end-to-end: 4x less host->device transfer; the model's
        # in-graph cast makes the poses bitwise-identical (0-255 integers
        # are exact in both fp32 and bf16)
        return np.ascontiguousarray(np.stack(imgs).transpose(0, 3, 1, 2))

    from rel_pose_tpu.ops.image import nearest_resize
    from tqdm import tqdm
    from concurrent.futures import ThreadPoolExecutor

    B = args.batch
    workers = args.decode_workers or min(8, os.cpu_count() or 1)

    try:  # one cv2 parallel region per decode thread oversubscribes
        import cv2
        # single decode worker: negative restores cv2's own default pool
        # (0 would disable cv2-internal threading entirely)
        cv2.setNumThreads(max(1, (os.cpu_count() or 1) // workers)
                          if workers > 1 else -1)
    except Exception:
        pass
    decode_ex = ThreadPoolExecutor(max_workers=workers)

    def make_chunk(start):
        chunk = dset[start:start + B]
        images = np.stack(list(decode_ex.map(load_pair, chunk)))
        # pad ragged final chunk to the full batch: avoids a second XLA
        # compilation for the leftover shape
        pad = B - len(chunk)
        if pad:
            images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
        return chunk, images

    starts = list(range(0, len(dset), B))
    # one-chunk lookahead: chunk k+1 decodes on host threads while the
    # device runs chunk k's forward
    pipeline = ThreadPoolExecutor(max_workers=1)
    pending = pipeline.submit(make_chunk, starts[0]) if starts else None
    for n, start in enumerate(tqdm(starts)):
        chunk, images = pending.result()
        if n + 1 < len(starts):
            pending = pipeline.submit(make_chunk, starts[n + 1])
        intr = np.tile(intrinsics[None], (images.shape[0], 1, 1))
        images, intr = place((jnp.asarray(images), jnp.asarray(intr)))
        images = nearest_resize(images, (384, 512))
        poses = np.asarray(fwd(params, bn_state, images, intr))[:len(chunk)]

        for i, entry in enumerate(chunk):
            predictions["camera"]["gts"]["tran"].append(
                entry["rel_pose"]["position"])
            gt_rotation = list(entry["rel_pose"]["rotation"])
            if gt_rotation[0] < 0:  # sign-normalize to W >= 0 (W-first here)
                gt_rotation = [-v for v in gt_rotation]
            predictions["camera"]["gts"]["rot"].append(gt_rotation)

            preds = poses[i, 1].copy()
            pr_copy = preds.copy()
            # undo training preprocessing (test_matterport.py:151-153):
            # W-last -> W-first (swap 3 & 6), translation * DEPTH_SCALE
            preds[3] = pr_copy[6]
            preds[6] = pr_copy[3]
            preds[:3] = preds[:3] * DEPTH_SCALE
            predictions["camera"]["preds"]["tran"].append(preds[:3])
            predictions["camera"]["preds"]["rot"].append(preds[3:])

    if pc > 1:
        predictions = _allgather_predictions(predictions)
        if pi != 0:
            return  # only process 0 computes and writes the metrics

    camera_metrics = eval_camera(predictions, args.exp, output_folder)
    for k in camera_metrics:
        print(k, camera_metrics[k])
    with open(os.path.join("output", args.exp, output_folder,
                           "results.txt"), "w") as f:
        for k in camera_metrics:
            print(k, camera_metrics[k], file=f)


if __name__ == "__main__":
    main()
