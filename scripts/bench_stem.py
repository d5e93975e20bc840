#!/usr/bin/env python
"""A/B bench: space-to-depth eval stem vs the plain XLA conv stem.

The round-3 question: the earlier space-to-depth attempt (pad-to-230,
115x115 phase grid, relayout as separate XLA ops after the resize) lost 4%
end-to-end.  This variant removes both problems:
  * the 2x2 phase split is folded INTO the resize gather (the resize
    writes the (B, 12, 112, 112) phase tensor directly — same bytes as
    the plain (B, 3, 224, 224) output, permuted index map);
  * the phase grid is an even 112x112 (no pad-to-odd): the 7x7/s2/p3 conv
    becomes C_in=12, 4x4, stride 1, padding ((2,1),(2,1)) with the 7x7
    taps scattered into the 4x4 phase kernel (49 of 192 slots used ->
    aligned K=192 contraction on the MXU vs the C_in=3 emitter bound).

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stem.py
Parity check runs on CPU: RELPOSE_PLATFORM=cpu ... --parity
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rel_pose_tpu.utils.platform import enable_compilation_cache, \
    apply_platform_env

apply_platform_env()
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rel_pose_tpu.nn.layers import conv2d_init, max_pool_2d
from rel_pose_tpu.ops.image import nearest_resize

BATCH = int(os.environ.get("BENCH_BATCH", "512"))  # images (= 256 pairs)
ITERS = int(os.environ.get("BENCH_ITERS", "30"))
DT = jnp.bfloat16


def _phase_idx(n_in, n_out):
    """torch-nearest indices for n_in->n_out, reordered phase-major:
    [idx[0::2], idx[1::2]] (length n_out, n_out//2 per phase)."""
    idx = (np.arange(n_out) * n_in) // n_out
    return np.concatenate([idx[0::2], idx[1::2]])


def s2d_resize(x, size):
    """(B, 3, H, W) -> (B, 12, size/2, size/2) phase tensor of the
    nearest-resized image; channel = (pr*2 + pc)*3 + c."""
    B = x.shape[0]
    h_in, w_in = x.shape[-2], x.shape[-1]
    ih = _phase_idx(h_in, size)
    iw = _phase_idx(w_in, size)
    y = jnp.take(x, jnp.asarray(ih), axis=-2)
    y = jnp.take(y, jnp.asarray(iw), axis=-1)
    # (B, 3, [pr,t], [pc,u]) -> (B, pr, pc, 3, t, u) -> (B, 12, t, u)
    h = size // 2
    y = y.reshape(B, 3, 2, h, 2, h)
    y = y.transpose(0, 2, 4, 1, 3, 5)
    return y.reshape(B, 12, h, h)


def s2d_resize_concat(x, size):
    """Same output, built from 4 per-phase gathers + channel concat (no
    big transpose; XLA fuses gathers into the concat regions)."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    idx_h = (np.arange(size) * h_in) // size
    idx_w = (np.arange(size) * w_in) // size
    parts = []
    for pr in range(2):
        xr = jnp.take(x, jnp.asarray(idx_h[pr::2]), axis=-2)
        for pc in range(2):
            parts.append(jnp.take(xr, jnp.asarray(idx_w[pc::2]), axis=-1))
    return jnp.concatenate(parts, axis=1)


def s2d_weights(w):
    """(64, 3, 7, 7) -> (64, 12, 4, 4) phase kernel; channel order matches
    s2d_resize.  kh odd -> pr=0, a=(kh-3)/2+2;  kh even -> pr=1, a=kh/2."""
    o = w.shape[0]
    w2 = np.zeros((o, 12, 4, 4), np.float32)
    wn = np.asarray(w, np.float32)
    for kh in range(7):
        if kh % 2:
            pr, a = 0, (kh - 3) // 2 + 2
        else:
            pr, a = 1, kh // 2
        for kw in range(7):
            if kw % 2:
                pc, b = 0, (kw - 3) // 2 + 2
            else:
                pc, b = 1, kw // 2
            w2[:, (pr * 2 + pc) * 3:(pr * 2 + pc) * 3 + 3, a, b] = \
                wn[:, :, kh, kw]
    return jnp.asarray(w2)


def conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def parity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (4, 3, 256, 256), np.uint8))
    w = conv2d_init(jax.random.PRNGKey(1), 3, 64, 7, bias=False)["w"]
    xf = nearest_resize(x, 224).astype(jnp.float32)
    ref = conv(xf, w, (2, 2), ((3, 3), (3, 3)))
    for fn in (s2d_resize, s2d_resize_concat):
        xp = fn(x, 224).astype(jnp.float32)
        got = conv(xp, s2d_weights(w), (1, 1), ((2, 1), (2, 1)))
        err = float(jnp.max(jnp.abs(got - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        print(f"{fn.__name__}: max abs err {err:.3e} (rel {rel:.3e})")
        assert rel < 1e-5, fn.__name__
    print("parity OK")


def bench():
    rng = np.random.default_rng(0)
    src_h = int(os.environ.get("SRC_H", "256"))
    src_w = int(os.environ.get("SRC_W", "256"))
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 3, src_h, src_w), dtype=np.uint8))
    w = conv2d_init(jax.random.PRNGKey(1), 3, 64, 7, bias=False)["w"]
    w2 = s2d_weights(w)
    mean = jnp.asarray([104.0, 117.0, 124.0], DT)

    def pre_plain(m, x):
        y = nearest_resize(x, 224).astype(DT)
        return y - m.reshape(3, 1, 1)

    def pre_s2d(m, x):
        y = s2d_resize(x, 224).astype(DT)
        return y - jnp.tile(m, 4).reshape(12, 1, 1)

    def pre_s2d_concat(m, x):
        y = s2d_resize_concat(x, 224).astype(DT)
        return y - jnp.tile(m, 4).reshape(12, 1, 1)

    def stem_plain(y):
        z = jax.nn.relu(conv(y, w.astype(DT), (2, 2), ((3, 3), (3, 3))))
        return max_pool_2d(z, 3, 2, 1)

    def stem_s2d(y):
        z = jax.nn.relu(conv(y, w2.astype(DT), (1, 1), ((2, 1), (2, 1))))
        return max_pool_2d(z, 3, 2, 1)

    variants = {
        "plain pre only": (pre_plain, None),
        "s2d-T pre only": (pre_s2d, None),
        "s2d-C pre only": (pre_s2d_concat, None),
        "plain pre+conv+pool": (pre_plain, stem_plain),
        "s2d-T pre+conv+pool": (pre_s2d, stem_s2d),
        "s2d-C pre+conv+pool": (pre_s2d_concat, stem_s2d),
    }
    for name, (pre, stem) in variants.items():
        @jax.jit
        def loop(images, pre=pre, stem=stem):
            def body(_, carry):
                m = mean + (1e-30 * carry).astype(DT)
                y = pre(m, images)
                if stem is not None:
                    y = stem(y)
                return jnp.float32(jnp.sum(y) * 1e-30)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        float(loop(images))
        t0 = time.perf_counter()
        float(loop(images))
        ms = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:>22}: {ms:7.3f} ms")


if __name__ == "__main__":
    if "--parity" in sys.argv:
        parity()
    else:
        bench()
