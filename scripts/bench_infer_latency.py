"""PosePredictor end-to-end request latency on TPU (VERDICT r4 item 3).

A load-once/predict-many API's headline metric is request latency, not
the eval CLI's throughput: this measures ``predict()`` / ``predict_batch``
WALL time — uint8 host arrays in, (2, 7) numpy poses out, including the
host->device transfer, the in-graph 384x512 resize + forward, and the
device->host readback (``np.asarray`` in ``_run`` is a host transfer, so
wall timing is sync-correct through the tunnel, where
``block_until_ready`` is not).

Production serving shape: bf16 compute, image_size=(384, 512) (the
Matterport convention), native 480x640 uint8 requests.

    python scripts/bench_infer_latency.py [--reps 50]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def percentiles(ts):
    ts = sorted(ts)
    return {"p50_ms": 1e3 * ts[len(ts) // 2],
            "p90_ms": 1e3 * ts[int(len(ts) * 0.9)],
            "mean_ms": 1e3 * sum(ts) / len(ts)}


def time_calls(fn, reps, warmup=5):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return percentiles(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    from rel_pose_tpu.config import ModelConfig
    from rel_pose_tpu.models import vitess_init
    from rel_pose_tpu.infer import PosePredictor, MATTERPORT_INTRINSICS

    print("devices:", jax.devices(), flush=True)
    cfg = ModelConfig(compute_dtype=args.dtype)
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    img1, img2 = (rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
                  for _ in range(2))
    batch = rng.integers(0, 256, (args.batch, 2, 3, 480, 640),
                         dtype=np.uint8)

    # batch-1 predictor: the interactive / online-request shape
    p1 = PosePredictor(params, bn_state, cfg,
                       intrinsics=MATTERPORT_INTRINSICS,
                       image_size=(384, 512), batch_size=1)
    t0 = time.perf_counter()
    p1.warmup(480, 640)
    print(f"warmup(batch=1): {time.perf_counter() - t0:.1f}s", flush=True)
    r1 = time_calls(lambda: p1.predict(img1, img2), args.reps)
    print("predict() batch=1:", json.dumps(r1), flush=True)

    # full-batch predictor: the bulk/offline serving shape
    pb = PosePredictor(params, bn_state, cfg,
                       intrinsics=MATTERPORT_INTRINSICS,
                       image_size=(384, 512), batch_size=args.batch)
    t0 = time.perf_counter()
    pb.warmup(480, 640)
    print(f"warmup(batch={args.batch}): {time.perf_counter() - t0:.1f}s",
          flush=True)
    rb = time_calls(lambda: pb.predict_batch(batch), max(10, args.reps // 5))
    rb["pairs_per_sec"] = args.batch / (rb["p50_ms"] / 1e3)
    print(f"predict_batch() batch={args.batch}:", json.dumps(rb), flush=True)


if __name__ == "__main__":
    main()
