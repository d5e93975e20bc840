"""Runtime gating + data-parallel partitioning for the Pallas kernels.

Every fused op consults :func:`use_pallas` to decide between its Mosaic
kernel and the unfused XLA reference path, and :func:`interpret_default`
to decide whether ``pallas_call`` should run in interpret mode.

Env knobs:

- ``RELPOSE_NO_PALLAS=1`` — force the unfused XLA path everywhere (the
  A/B lever used by the hardware grad check and the perf ablations).
- ``RELPOSE_PALLAS_INTERPRET=1`` — engage the fused kernels even off-TPU,
  running them through Pallas interpret mode.  This exercises the REAL
  fused forward/backward wiring (custom VJPs, stash plumbing, weight-grad
  accumulation) on CPU, which is how CI triangulates full-model gradients
  without hardware (``tests/test_grad_triangulation.py``).

Partitioning (:func:`data_parallel_scope` + :func:`maybe_shard_map`):
GSPMD treats a Mosaic custom call as opaque — with batch-sharded inputs it
may all-gather the full token tensors and run the kernel replicated,
silently destroying DP scaling.  The step builders (``train/step.py``)
therefore enter a mesh scope around the traced body, and every fused op
wraps its kernel call in ``jax.shard_map`` over the batch axis: each
device runs the UNCHANGED kernel body on its own shard (the grids are
per-batch-element already), and shard_map's transpose inserts the psum for
the replicated weights' gradients.  The reference's one parallelism axis
(DDP data parallelism, ``/root/reference/train.py:28-36``) is thereby
explicit, not GSPMD-inferred.
"""

import contextlib
import contextvars
import os

import jax


def use_pallas():
    if os.environ.get("RELPOSE_NO_PALLAS"):
        return False
    if os.environ.get("RELPOSE_PALLAS_INTERPRET"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # no backend at all
        return False


def interpret_default(explicit):
    """Resolve a call-site ``interpret=`` argument against the env knob."""
    return bool(explicit) or bool(os.environ.get("RELPOSE_PALLAS_INTERPRET"))


# ------------------------------------------------ data-parallel partitioning

_DATA_MESH = contextvars.ContextVar("relpose_data_mesh", default=None)


@contextlib.contextmanager
def data_parallel_scope(mesh, axis_name="data"):
    """Declare the data-parallel mesh for fused ops traced inside the scope.

    Entered INSIDE the traced step function (tracing executes the Python
    body, so the scope is live exactly while the fused ops trace).  A 1-device
    mesh still wraps — the shard_map is then a no-op partition-wise but keeps
    the code path identical, which is how the single-chip HLO check pins the
    Mosaic x shard_map composition."""
    if mesh is None:
        yield
        return
    token = _DATA_MESH.set((mesh, axis_name))
    try:
        yield
    finally:
        _DATA_MESH.reset(token)


def data_mesh():
    """The (mesh, axis_name) declared by the innermost scope, or None."""
    return _DATA_MESH.get()


def maybe_shard_map(fn, args, batched):
    """Run ``fn(*args)``, shard_mapped over the data-parallel scope's mesh.

    ``batched`` flags, per positional arg, whether its leading axis is the
    (global) batch: those are sharded over the mesh axis, the rest (weights)
    are replicated per shard.  Outputs are assumed batch-leading.  Falls back
    to a direct call when no scope is active or a batch dim does not divide
    the mesh — GSPMD then handles placement as before (correct, possibly
    slower).  ``check_vma=False``: Pallas calls carry no varying-manual-axes
    info; shard_map's transpose still psums the replicated inputs' cotangents
    (pinned by tests/test_shard_map_pallas.py)."""
    ctx = data_mesh()
    if ctx is None:
        return fn(*args)
    mesh, ax = ctx
    n = mesh.shape[ax]
    leaves = []
    for a, b in zip(args, batched):
        if b:
            leaves.extend(jax.tree.leaves(a))
    if any(leaf.shape[0] % n for leaf in leaves):
        return fn(*args)
    from jax.sharding import PartitionSpec as P
    in_specs = tuple(P(ax) if b else P() for b in batched)

    def body(*a):
        # ops traced inside the body (e.g. a custom-VJP backward composed
        # of other fused ops) must not try to nest another shard_map
        token = _DATA_MESH.set(None)
        try:
            return fn(*a)
        finally:
            _DATA_MESH.reset(token)

    return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=P(ax), check_vma=False)(*args)
