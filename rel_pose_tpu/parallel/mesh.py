"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL stack (``/root/reference/train.py:28-36,66-67,285-291``).

Parallelism model: pure data parallelism over a 1-D ``('data',)`` mesh, the
same (and only) strategy the reference implements (SURVEY.md §2.8).  Instead
of explicit process groups and all-reduce calls, the train step is jitted
with NamedShardings: params/optimizer state replicated, batch sharded on
'data'; XLA emits the gradient all-reduce over ICI automatically.  Multi-host
extends this transparently via ``jax.distributed.initialize()`` (call
``maybe_init_distributed`` before building the mesh).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _multihost_env_detected():
    """True when the standard Cloud TPU pod / multi-slice env markers are
    present — the cases where ``jax.distributed.initialize()`` can
    auto-detect the cluster without explicit coordinator args."""
    import os
    if any(os.environ.get(v) for v in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS")):
        return True
    # Cloud TPU pod slices export the full worker list on every host.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hostnames.split(",") if h.strip()]) > 1


def maybe_init_distributed(force=False):
    """Initialize multi-host JAX when a cluster is detected (no-op on a
    single host).  Replaces the reference's env:// NCCL rendezvous
    (``/root/reference/train.py:29-33``).

    Unlike round 1 (which required a custom ``JAX_COORDINATOR_ADDRESS``),
    this also fires on the standard Cloud TPU pod markers, where
    ``jax.distributed.initialize()`` auto-detects coordinator/process_id.
    Returns True if distributed runtime is (now) initialized.
    """
    if not (force or _multihost_env_detected()):
        return False
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        # Already initialized (e.g. by an outer launcher) is fine.
        if "already" not in str(e).lower():
            raise
    return True


def make_mesh(num_devices=None, devices=None):
    """1-D data-parallel mesh over all (or the first N) local+global devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def batch_sharding(mesh):
    """Sharding for arrays whose leading axis is the global batch."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place a pytree of host arrays with the leading axis sharded over
    'data'.  The global batch size must divide the mesh size.

    Single-process: plain ``device_put``.  Multi-process: each process
    passes its PROCESS-LOCAL batch slice (what ``data/loader.py``'s
    per-host sharding already yields) and the global array is assembled
    with ``make_array_from_process_local_data`` — ``device_put`` to a
    non-fully-addressable sharding would fail (verified by the 2-process
    CPU smoke test, ``tests/test_multihost.py``)."""
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh, tree):
    """Replicate a pytree across the mesh.  Multi-process: every process
    must pass the SAME host values (seeded init guarantees this)."""
    s = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def allgather_ragged(named_lists):
    """Gather per-process ragged row lists across all processes.

    ``named_lists``: dict of name -> (list of length-d rows, d).  Every
    process participates (collective); returns dict of name ->
    (sum_p n_p, d) float32 arrays containing every process's rows
    (process-major order), identical on all processes.  Used by the eval
    CLIs to assemble the global per-pair predictions after each process
    evaluated its shard of the test set.
    """
    from jax.experimental import multihost_utils

    flat = {k: (np.asarray(v, np.float32).reshape(len(v), d)
                if len(v) else np.zeros((0, d), np.float32))
            for k, (v, d) in named_lists.items()}
    ns = {a.shape[0] for a in flat.values()}
    assert len(ns) == 1, f"ragged lists disagree on local count: {ns}"
    n_local = ns.pop()
    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray(n_local, np.int32)))
    nmax = int(counts.max())
    padded = {k: np.concatenate(
        [a, np.zeros((nmax - a.shape[0], a.shape[1]), np.float32)])
        for k, a in flat.items()}
    g = multihost_utils.process_allgather(padded)      # (pc, nmax, d)
    return {k: np.concatenate([np.asarray(g[k][p][: int(counts[p])])
                               for p in range(len(counts))])
            for k in g}
