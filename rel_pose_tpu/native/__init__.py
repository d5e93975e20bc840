"""ctypes bindings for the native host-pipeline library.

Auto-builds ``librelpose_host.so`` with make on first import if missing
(g++ only, no external deps); every entry point degrades gracefully to the
numpy implementation when the library is unavailable
(``RELPOSE_NO_NATIVE=1`` forces the fallback).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "librelpose_host.so")
_lib = None


def _build():
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("RELPOSE_NO_NATIVE"):
        _lib = False
        return _lib
    src = os.path.join(_DIR, "host_pipeline.cpp")
    stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    if not os.path.exists(_LIB_PATH) or stale:
        # rebuild when missing OR older than the source — a stale library
        # missing a newer entry point would otherwise fail the ctypes
        # symbol lookup below and silently disable the whole pipeline
        if not (os.path.exists(src) and _build()):
            if not os.path.exists(_LIB_PATH):
                _lib = False
                return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rp_pair_to_chw_resize.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.rp_color_jitter.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.rp_color_jitter_fused.argtypes = lib.rp_color_jitter.argtypes
        lib.rp_resize_quantize.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


# Per-call thread budget.  0 = the library's default (min(ncpu, 16)) —
# right for a single caller, WRONG under a multi-worker DataLoader where
# N workers x 16 threads oversubscribe the host (measured: 8 workers ran
# SLOWER end-to-end than one).  The DataLoader calls set_num_threads with
# its per-worker share.
_num_threads = 0


def set_num_threads(k):
    global _num_threads
    _num_threads = max(0, int(k))


def _threads(nthreads):
    return nthreads if nthreads else _num_threads


def available():
    return bool(_load())


def pair_to_chw_resize(images_u8, out_hw, nthreads=0):
    """(n, H, W, 3) uint8 BGR -> (n, 3, OH, OW) float32, fused nearest
    resize (torch semantics) + transpose.  Returns None if native lib is
    unavailable."""
    lib = _load()
    if not lib:
        return None
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    n, h, w, c = images_u8.shape
    assert c == 3
    oh, ow = out_hw
    out = np.empty((n, 3, oh, ow), dtype=np.float32)
    lib.rp_pair_to_chw_resize(
        images_u8.ctypes.data, n, h, w, out.ctypes.data, oh, ow,
        _threads(nthreads))
    return out


OP_BRIGHTNESS, OP_CONTRAST, OP_SATURATION, OP_HUE, OP_GRAY = 0, 1, 2, 3, 4


def color_jitter(images_f32, ops, vals, nthreads=0, fused=True):
    """In-place jitter on (n, 3, H, W) float32 BGR 0-255.  ``ops`` is a list
    of OP_* codes, ``vals`` the matching factors.  Returns the array, or
    None if native lib is unavailable.

    ``fused=True`` (default) runs the single-pass kernel (whole op chain per
    pixel in registers — one image read+write total); ``fused=False`` keeps
    the original one-pass-per-op path (used for equivalence testing)."""
    lib = _load()
    if not lib:
        return None
    assert images_f32.dtype == np.float32 and images_f32.flags.c_contiguous
    n, c, h, w = images_f32.shape
    ops_arr = np.asarray(ops, dtype=np.int32)
    vals_arr = np.asarray(vals, dtype=np.float32)
    fn = lib.rp_color_jitter_fused if fused else lib.rp_color_jitter
    fn(images_f32.ctypes.data, n, h, w,
       ops_arr.ctypes.data, vals_arr.ctypes.data, len(ops_arr),
       _threads(nthreads))
    return images_f32


def resize_quantize(images_f32, out_hw, nthreads=0):
    """(n, c, H, W) float32 -> (n, c, OH, OW) uint8: nearest resize (torch
    floor semantics) + round-half-even + clamp to [0, 255] in one threaded
    pass (numpy equivalent: fancy-index resize, np.rint, np.clip,
    astype(uint8) — four GIL-held passes).  Returns None if unavailable."""
    lib = _load()
    if not lib:
        return None
    assert images_f32.dtype == np.float32 and images_f32.flags.c_contiguous
    n, c, h, w = images_f32.shape
    oh, ow = out_hw
    out = np.empty((n, c, oh, ow), dtype=np.uint8)
    lib.rp_resize_quantize(images_f32.ctypes.data, n, c, h, w,
                           out.ctypes.data, oh, ow, _threads(nthreads))
    return out
