"""Coordinate helpers for the atlas fit and RAFT."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coords_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """(h, w, 2) grid of (x, y) pixel coordinates.

    Matches the reference's `coords_grid` content (x first, then y;
    src/models/stage_1/core/utils/utils.py:74-77) but in HWC layout.
    """
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype),
                          jnp.arange(w, dtype=dtype), indexing="ij")
    return jnp.stack([xs, ys], axis=-1)


def normalize_xyt(j, i, f, larger_dim: int, num_frames: int):
    """Map integer pixel/frame indices to the [-1, 1] coordinate cube.

    x = j/(L/2) - 1,  y = i/(L/2) - 1,  t = f/(T/2) - 1, with L the larger
    spatial dim — identical to the reference normalization
    (src/stage1_neural_atlas.py:168-171).  Accepts arrays of any shape;
    returns an (..., 3) array.
    """
    j = jnp.asarray(j, jnp.float32)
    i = jnp.asarray(i, jnp.float32)
    f = jnp.asarray(f, jnp.float32)
    x = j / (larger_dim / 2.0) - 1.0
    y = i / (larger_dim / 2.0) - 1.0
    t = f / (num_frames / 2.0) - 1.0
    return jnp.stack([x, y, t], axis=-1)
