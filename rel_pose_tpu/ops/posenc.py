"""Positional encodings for the Essential Matrix Module.

Vectorized JAX re-implementation of the reference's
``get_positional_encodings`` / ``get_l1_positional_encodings``
(``/root/reference/src/modules/vision_transformer.py:37-158``).  The
reference builds these with Python loops ON CPU and transfers them to the GPU
on every forward call (``vision_transformer.py:209-211``); here they are
computed inside the jitted graph from the (already grid-scaled) intrinsics —
for constant intrinsics XLA constant-folds the whole table, eliminating the
reference's per-step host->device transfer.

Faithfully replicated quirks (required for checkpoint parity):
  * token ordering of the unprojected grid is ``t = k*w + j`` with k indexing
    x/width and j indexing y/height (``vision_transformer.py:147-151``) —
    column-major relative to the row-major conv-feature tokens;
  * the *initial* (no-intrinsics) tables use ``p3[t] = ys[t % h]`` (tile) and
    ``p4[t] = xs[t // h]`` (repeat-interleave) (``:110-113``), which the
    intrinsics pass only partially overwrites when h != w;
  * intrinsics are normalized assuming the principal point is the image
    center: hpix = 2*cy, wpix = 2*cx (``:128-134``).

Output: ``(B, N, 6)`` with columns ``(y^2, x^2, x*y, y, x, 1)`` for the
quadratic variant and ``(1, 1, 1, y, x, 1)`` for the l1 variant.
"""

import jax.numpy as jnp


def _grid_dims(num_patches):
    r = round(num_patches ** 0.5)
    if r * r == num_patches:
        # any square grid (the production model is 24x24; smaller squares
        # are used by reduced CI configs)
        return r, r
    if num_patches == 48 * 64:
        return 48, 64
    raise ValueError(
        f"unexpected resolution for positional encoding: {num_patches}")


def _base_coords(num_patches, intrinsics):
    """Returns (p3, p4): y-like and x-like coordinate tables ``(B, N)``."""
    h, w = _grid_dims(num_patches)
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)

    # initial tables (vision_transformer.py:110-113)
    p3 = jnp.tile(ys, w)                     # p3[t] = ys[t % h]
    p4 = jnp.repeat(xs, h)                   # p4[t] = xs[t // h]

    if intrinsics is None:
        B = 1
        return p3[None], p4[None]

    if h != w:
        # The reference's unprojection loop writes p3[:, k*w + j] with
        # k < w, j < h (vision_transformer.py:147-151); for the 48x64 grid
        # that indexes up to 4079 on a 3072-long table — an IndexError in
        # torch.  The path is unreachable in practice (the model grid is
        # always 24x24); fail loudly instead of silently replicating it.
        raise ValueError(
            "intrinsics-unprojected positional encodings are only defined "
            f"for square grids (got {h}x{w}); the reference implementation "
            "raises IndexError here too")

    # frame-0 intrinsics; the reference asserts frames share intrinsics
    # (vision_transformer.py:117)
    fx, fy, cx, cy = (intrinsics[:, 0, 0], intrinsics[:, 0, 1],
                      intrinsics[:, 0, 2], intrinsics[:, 0, 3])
    wpix, hpix = cx * 2.0, cy * 2.0
    fx_n = (fx / wpix) * 2.0
    cx_n = (cx / wpix) * 2.0 - 1.0
    fy_n = (fy / hpix) * 2.0
    cy_n = (cy / hpix) * 2.0 - 1.0

    # Kinv @ [x, y, 1] for an affine K: w1=(x-cx_n)/fx_n, w2=(y-cy_n)/fy_n
    # (vision_transformer.py:139-151).  Overwrite positions t = k*w + j.
    u2 = (ys[None, :] - cy_n[:, None]) / fy_n[:, None]     # (B, h): y-coord
    u1 = (xs[None, :] - cx_n[:, None]) / fx_n[:, None]     # (B, w): x-coord

    kk = jnp.arange(w)[:, None]   # k over width
    jj = jnp.arange(h)[None, :]   # j over height
    t_idx = (kk * w + jj).reshape(-1)                       # (w*h,)

    p3 = jnp.broadcast_to(p3, (intrinsics.shape[0], p3.shape[0]))
    p4 = jnp.broadcast_to(p4, (intrinsics.shape[0], p4.shape[0]))
    vals_p3 = jnp.broadcast_to(u2[:, None, :], u2.shape[:1] + (w, h))
    vals_p4 = jnp.broadcast_to(u1[:, :, None], u1.shape[:1] + (w, h))
    p3 = p3.at[:, t_idx].set(vals_p3.reshape(u2.shape[0], -1))
    p4 = p4.at[:, t_idx].set(vals_p4.reshape(u1.shape[0], -1))
    return p3, p4


def quadratic_positional_encoding(num_patches, intrinsics=None, batch=None):
    """``(B, N, 6)`` table ``(y^2, x^2, xy, y, x, 1)``
    (``vision_transformer.py:90-158``)."""
    p3, p4 = _base_coords(num_patches, intrinsics)
    if intrinsics is None and batch is not None:
        p3 = jnp.broadcast_to(p3, (batch,) + p3.shape[1:])
        p4 = jnp.broadcast_to(p4, (batch,) + p4.shape[1:])
    ones = jnp.ones_like(p3)
    return jnp.stack([p3 * p3, p4 * p4, p3 * p4, p3, p4, ones], axis=-1)


def l1_positional_encoding(num_patches, intrinsics=None, batch=None):
    """``(B, N, 6)`` table ``(1, 1, 1, y, x, 1)``
    (``vision_transformer.py:37-87``; quadratic terms commented out there)."""
    p3, p4 = _base_coords(num_patches, intrinsics)
    if intrinsics is None and batch is not None:
        p3 = jnp.broadcast_to(p3, (batch,) + p3.shape[1:])
        p4 = jnp.broadcast_to(p4, (batch,) + p4.shape[1:])
    ones = jnp.ones_like(p3)
    return jnp.stack([ones, ones, ones, p3, p4, ones], axis=-1)
