"""RAFT flow upsampling ops (NHWC).

`convex_upsample_flow` is the TPU-native form of RAFT's mask-weighted
convex upsampling (reference: src/models/stage_1/core/raft.py:76-87):
each fine pixel is a softmax-weighted combination of the 3x3 coarse
neighborhood of its parent cell.  Implemented with a shift-stack instead of
`F.unfold` so XLA lowers it to cheap pads/slices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _neighborhood_stack_3x3(x: jax.Array) -> jax.Array:
    """x: (N, H, W, C) -> (N, H, W, 9, C), zero-padded 3x3 neighborhoods.

    Neighbor order matches unfold's row-major kernel order:
    (dy, dx) in [(-1,-1), (-1,0), (-1,1), (0,-1), ... (1,1)].
    """
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    slabs = []
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            slabs.append(padded[:, dy:dy + H, dx:dx + W, :])
    return jnp.stack(slabs, axis=3)


def convex_upsample_flow(flow: jax.Array, mask: jax.Array,
                         factor: int = 8) -> jax.Array:
    """Upsample (N, H, W, 2) flow by `factor` with convex combination weights.

    mask: (N, H, W, 9 * factor * factor) logits, laid out as
    (9, factor, factor) per coarse cell — the same layout RAFT's mask head
    produces (reference view: mask.view(N, 1, 9, 8, 8, H, W)).
    """
    N, H, W, _ = flow.shape
    r = factor
    m = mask.reshape(N, H, W, 9, r, r)
    m = jax.nn.softmax(m, axis=3)

    nb = _neighborhood_stack_3x3(flow * factor)      # (N, H, W, 9, 2)
    up = jnp.einsum("nhwkab,nhwkc->nhwabc", m, nb,    # (N, H, W, r, r, 2)
                    precision=jax.lax.Precision.HIGHEST)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(N, H * r, W * r, 2)


def upflow8(flow: jax.Array) -> jax.Array:
    """Bilinear x8 upsampling (align_corners=True) of (N, H, W, 2) flow,
    scaled by 8 — fallback used when no mask head output is available
    (reference: src/models/stage_1/core/utils/utils.py:80-82)."""
    N, H, W, C = flow.shape
    return 8.0 * resize_bilinear_align_corners(flow, 8 * H, 8 * W)


def resize_bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """align_corners=True bilinear resize of (N, H, W, C).

    jax.image.resize implements the half-pixel (align_corners=False)
    convention, so we sample explicitly.
    """
    N, H, W, C = x.shape
    ys = jnp.linspace(0.0, H - 1.0, out_h)
    xs = jnp.linspace(0.0, W - 1.0, out_w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]

    g = lambda iy, ix: x[:, iy][:, :, ix]            # (N, out_h, out_w, C)
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy
