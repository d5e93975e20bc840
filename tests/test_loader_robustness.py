"""Loader fault handling + profiler trace smoke tests."""

import os

import numpy as np
import pytest

from rel_pose_tpu.data.loader import DataLoader
from rel_pose_tpu.utils.profiling import trace


class ExplodingDataset:
    def __init__(self, n, bad=None):
        self.n = n
        self.bad = bad or set()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i in self.bad:
            raise RuntimeError(f"boom at {i}")
        img = np.full((2, 3, 4, 4), float(i), np.float32)
        pose = np.zeros((2, 7), np.float32)
        intr = np.ones((2, 4), np.float32)
        return img, pose, intr


class TestLoaderFaults:
    def test_worker_exception_propagates(self):
        ds = ExplodingDataset(8, bad={3})
        loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)

    def test_in_order_delivery_multiworker(self):
        ds = ExplodingDataset(16)
        loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=4)
        batches = list(loader)
        assert len(batches) == 8
        # batches arrive in index order despite 4 workers
        for bi, (img, _, _) in enumerate(batches):
            np.testing.assert_allclose(img[0, 0, 0, 0, 0], 2 * bi)
            np.testing.assert_allclose(img[1, 0, 0, 0, 0], 2 * bi + 1)

    def test_drop_last(self):
        ds = ExplodingDataset(7)
        assert len(DataLoader(ds, batch_size=2, drop_last=True)) == 3
        assert len(DataLoader(ds, batch_size=2, drop_last=False)) == 4


class TestTrace:
    def test_noop_without_dir(self):
        with trace():  # no dir configured -> plain passthrough
            x = 1 + 1
        assert x == 2

    def test_writes_trace_with_dir(self, tmp_path):
        import jax.numpy as jnp
        d = str(tmp_path / "tr")
        with trace(d):
            jnp.ones(8).sum().block_until_ready()
        # jax.profiler writes a plugins/profile subtree
        found = []
        for root, dirs, files in os.walk(d):
            found.extend(files)
        assert found, "no trace files written"
