"""Bilinear sampling primitives (NHWC, pixel coordinates).

TPU-native analog of the reference's `grid_sample(align_corners=True)`
wrapper (reference: src/models/stage_1/core/utils/utils.py:57-71) and its
flow-warp helper (reference: src/models/utils.py:504-529).  We work directly
in pixel coordinates and NHWC layout; out-of-bounds reads return zeros
(grid_sample's default 'zeros' padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather img[iy, ix] with zero padding outside bounds.

    img: (H, W, C); iy/ix: integer arrays of identical shape S.
    Returns (S..., C).
    """
    H, W = img.shape[0], img.shape[1]
    valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    iyc = jnp.clip(iy, 0, H - 1)
    ixc = jnp.clip(ix, 0, W - 1)
    flat = img.reshape(H * W, -1)
    vals = jnp.take(flat, iyc * W + ixc, axis=0)
    return jnp.where(valid[..., None], vals, 0.0)


def bilinear_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinearly sample `img` (H, W, C) at pixel `coords` (..., 2) = (x, y).

    Matches torch `grid_sample(..., align_corners=True, padding_mode='zeros')`
    after the pixel->normalized conversion the reference performs: a sample at
    integer (x, y) returns img[y, x]; out-of-bounds contributions are zero.
    """
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = _gather_2d(img, y0i, x0i)
    v01 = _gather_2d(img, y0i, x0i + 1)
    v10 = _gather_2d(img, y0i + 1, x0i)
    v11 = _gather_2d(img, y0i + 1, x0i + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def flow_warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp `img` (H, W, C) by `flow` (H, W, 2).

    output(p) = img(p + flow(p)), bilinear, zeros outside.
    Mirrors the reference's `flow_warping` semantics
    (src/models/utils.py:504-529) in NHWC single-image form.
    """
    H, W = img.shape[0], img.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=flow.dtype),
                          jnp.arange(W, dtype=flow.dtype), indexing="ij")
    coords = jnp.stack([xs + flow[..., 0], ys + flow[..., 1]], axis=-1)
    return bilinear_sample(img, coords)
