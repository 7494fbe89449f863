"""Forward/backward flow consistency masks and flow resizing.

Re-implements, as jittable array ops, the host-side numpy/cv2 recipe the
reference uses when loading flow (reference:
src/models/stage_1/unwrap_utils.py:10-38): a pixel of the forward flow is
"consistent" when ||flow12(p) + flow21(p + flow12(p))|| < 1.0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import flow_warp


def compute_consistency(flow12: jax.Array, flow21: jax.Array) -> jax.Array:
    """Per-pixel forward-backward error of flow12 given flow21.

    flow12/flow21: (H, W, 2).  Returns (H, W) error magnitude.
    """
    wflow21 = flow_warp(flow21, flow12)
    diff = flow12 + wflow21
    return jnp.sqrt(diff[..., 0] ** 2 + diff[..., 1] ** 2)


def consistency_masks(flow12: jax.Array, flow21: jax.Array,
                      threshold: float = 1.0):
    """(mask_fwd, mask_bwd) boolean consistency masks for a flow pair."""
    m12 = compute_consistency(flow12, flow21) < threshold
    m21 = compute_consistency(flow21, flow12) < threshold
    return m12, m21


def resize_flow(flow: np.ndarray, newh: int, neww: int) -> np.ndarray:
    """Resize a flow field and rescale its displacement vectors (host-side).

    The reference's `resize_flow` (src/models/stage_1/unwrap_utils.py:33-38)
    scales the x-component by newh/oldh and the y-component by neww/oldw —
    a latent x/y swap that is invisible in the pipeline because both ratios
    are always equal (uniform downscale).  We scale each axis by its own
    ratio, which is identical for all pipeline inputs and correct otherwise.
    """
    import cv2

    oldh, oldw = flow.shape[:2]
    out = cv2.resize(flow, (neww, newh), interpolation=cv2.INTER_LINEAR)
    out = out.copy()
    out[:, :, 0] *= neww / oldw
    out[:, :, 1] *= newh / oldh
    return out
