#!/usr/bin/env python
"""End-to-end host-pipeline throughput: disk -> decode -> augment -> batch.

Writes a synthetic Matterport-format tree (real 480x640 PNGs), then measures
pairs/s through the REAL ``data.matterport.Matterport`` dataset +
``data.loader.DataLoader`` path (cv2 decode, C++ fused jitter, nearest
resize to 384x512, collation) — the part of training the device bench
excludes.  Reference equivalent: torch DataLoader workers
(``/root/reference/train.py:127-130``).

Env: LOADER_N (pairs, default 64), LOADER_WORKERS (default nproc),
LOADER_BATCH (default 8), RELPOSE_NO_NATIVE=1 to bench the numpy jitter.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))


def main():
    n = int(os.environ.get("LOADER_N", "64"))
    workers = int(os.environ.get("LOADER_WORKERS", str(os.cpu_count() or 1)))
    batch = int(os.environ.get("LOADER_BATCH", "8"))

    from test_cli import make_matterport_tree
    from rel_pose_tpu.data import dataset_factory, DataLoader
    from rel_pose_tpu import native

    with tempfile.TemporaryDirectory() as root:
        dp = os.path.join(root, "matterport")
        t0 = time.perf_counter()
        make_matterport_tree(dp, n=n, hw=(480, 640))
        print(f"wrote {n} pairs in {time.perf_counter()-t0:.1f}s "
              f"(native={native.available()}, workers={workers})")

        db = dataset_factory(["matterport"], datapath=dp, subepoch=0,
                             is_training=True)
        loader = DataLoader(db, batch_size=batch, shuffle=True,
                            num_workers=workers)
        # warmup one batch (thread spinup, cv2 init)
        next(iter(loader))

        t0 = time.perf_counter()
        seen = 0
        for images, poses, intr in loader:
            seen += images.shape[0]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "loader_pairs_per_sec",
            "value": round(seen / dt, 2),
            "unit": "pairs/s",
            "pairs": seen,
            "workers": workers,
            "native": native.available(),
        }))


if __name__ == "__main__":
    main()
