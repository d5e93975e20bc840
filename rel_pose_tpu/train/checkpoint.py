"""Checkpoint save/load + auto-resume (TPU-native).

Replaces the reference's ``torch.save``/auto-resume scheme
(``/root/reference/train.py:189-203,255-275``) with flax msgpack
serialization of the full train state pytree:
``{params, bn_state, opt_state, step}``.

Layout mirrors the reference: ``output/<name>/checkpoints/%06d.ckpt`` saved
every ``ckpt_every`` steps and at termination; on startup the newest
checkpoint (``most_recent_ckpt.ckpt`` if present, else the
highest-numbered) is picked up automatically.

The reference's torch ``.pth`` checkpoints load transparently through
``utils.convert``: weights AND torch Adam moments (exp_avg/exp_avg_sq/step)
are restored — the moments warm-start optax's ``scale_by_adam`` via
``train.optim.warm_start_adam`` (see ``train.py`` --ckpt handling and
``tests/test_reference_parity.py``), matching the reference's ``--ckpt`` warm start
(``train.py:75-86``).  The torch scheduler state is not restored (the
OneCycle schedule is a pure function of the step count, which starts
fresh — same as the reference's warm start).
"""

import os
import re

import jax
import numpy as np
from flax import serialization


CKPT_SUFFIX = ".ckpt"


def save_checkpoint(path, tree):
    """Serialize a pytree to ``path`` (msgpack).  Device arrays are pulled to
    host first."""
    tree = jax.tree.map(np.asarray, tree)
    data = serialization.to_bytes(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


class AsyncCheckpointer:
    """Background checkpoint writer (orbax-style async save).

    ``save()`` pulls the state device->host on the caller's thread (one
    queue drain — unavoidable), then hands the host tree to a single
    worker thread for msgpack serialization and the atomic write+rename,
    so the slow part (~100 MB for the full train state) overlaps the next
    training steps instead of stalling the step loop.

    At most one save is in flight: ``save()`` first waits for (and
    re-raises errors from) the previous write, so a crash can lose at most
    the newest checkpoint and on-disk files are always complete
    (``os.replace`` is atomic).  Call ``close()`` (or ``wait()``) before
    process exit.
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor
        self._ex = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="ckpt-writer")
        self._fut = None

    def save(self, path, tree):
        host = jax.tree.map(np.asarray, tree)
        self.wait()
        self._fut = self._ex.submit(self._write, path, host)

    @staticmethod
    def _write(path, host):
        data = serialization.to_bytes(host)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def wait(self):
        """Block until the in-flight write (if any) finishes; re-raises its
        error."""
        if self._fut is not None:
            fut, self._fut = self._fut, None
            fut.result()

    def close(self):
        self.wait()
        self._ex.shutdown()


def load_checkpoint(path, template):
    """Deserialize into the structure of ``template`` (same pytree shape the
    trainer builds from scratch)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def load_params_only(path, params_template, state_template):
    """Extract just (params, bn_state) from a full train-state checkpoint —
    the inference-side load used by the eval/demo CLIs (optimizer state is
    ignored, mirroring their ``['model']``-only torch load,
    ``test_matterport.py:109-111``)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    try:
        params = serialization.from_state_dict(params_template, raw["params"])
        bn = serialization.from_state_dict(state_template, raw["bn_state"])
    except (ValueError, KeyError) as e:
        raise ValueError(
            f"checkpoint {path} does not match the model configuration — "
            "check the architecture flags (--transformer_depth, "
            "--fusion_transformer, --noess, ...) used when it was trained: "
            f"{e}") from e
    return params, bn


def checkpoint_path(name, step, output_dir="output"):
    return os.path.join(output_dir, name, "checkpoints",
                        f"{step:06d}{CKPT_SUFFIX}")


def find_resume_checkpoint(name, output_dir="output"):
    """Newest checkpoint in ``output/<name>/checkpoints`` or None.

    Mirrors ``train.py:255-275``: prefers ``most_recent_ckpt``, else the
    highest-numbered file.
    """
    d = os.path.join(output_dir, name, "checkpoints")
    if not os.path.isdir(d):
        return None
    entries = [f for f in os.listdir(d) if f.endswith(CKPT_SUFFIX)]
    if not entries:
        return None
    if f"most_recent_ckpt{CKPT_SUFFIX}" in entries:
        return os.path.join(d, f"most_recent_ckpt{CKPT_SUFFIX}")
    numbered = []
    for f in entries:
        m = re.fullmatch(r"(\d+)" + re.escape(CKPT_SUFFIX), f)
        if m:
            numbered.append(int(m.group(1)))
    if not numbered:
        return None
    return os.path.join(d, f"{max(numbered):06d}{CKPT_SUFFIX}")


def ensure_output_dirs(name, output_dir="output"):
    """Create the reference's output layout (``train.py:255-260``)."""
    for sub in ("checkpoints", "runs", "train_output/images"):
        os.makedirs(os.path.join(output_dir, name, sub), exist_ok=True)
