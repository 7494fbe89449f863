"""Divisibility padding for conv networks (NHWC).

Covers both padder variants in the reference:
  * /8 'sintel' (symmetric) padding used by RAFT
    (src/models/stage_1/core/utils/utils.py:7-24), and
  * /32 'other' (left/right split width, all-bottom height) padding used by
    stage 2 (src/models/utils.py:626-645).
Both replicate edge pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Padder:
    def __init__(self, h: int, w: int, divisor: int = 8, mode: str = "sintel"):
        pad_h = (-h) % divisor
        pad_w = (-w) % divisor
        if mode == "sintel":
            self.top, self.bottom = pad_h // 2, pad_h - pad_h // 2
        else:  # 'other': all padding at the bottom
            self.top, self.bottom = 0, pad_h
        self.left, self.right = pad_w // 2, pad_w - pad_w // 2
        self.h, self.w = h, w

    @property
    def padded_hw(self):
        return (self.h + self.top + self.bottom, self.w + self.left + self.right)

    def pad(self, x: jax.Array) -> jax.Array:
        """x: (..., H, W, C) -> padded along H, W with edge replication."""
        pads = [(0, 0)] * (x.ndim - 3) + [(self.top, self.bottom),
                                          (self.left, self.right), (0, 0)]
        return jnp.pad(x, pads, mode="edge")

    def unpad(self, x: jax.Array) -> jax.Array:
        h, w = x.shape[-3], x.shape[-2]
        return x[..., self.top:h - self.bottom, self.left:w - self.right, :]
