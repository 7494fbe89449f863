"""Warp error (E_warp) — the paper's temporal-consistency metric.

The reference ships the recipe as dead code
(src/models/utils.py:532-572 `detect_occlusion` and flow_warping); this is a
live, tested implementation:

  E_warp(t) = mean over non-occluded pixels of || I_t - warp(I_{t+1}; F_bw) ||^2

where F_bw is the backward flow (t+1 -> t is warped into frame t using the
flow from t to t+1's inverse; in the reference convention `fw_flow` maps
frame1->frame2 and `bw_flow` maps frame2->frame1, and frame2 is warped to
frame1 by bw... see occlusion_mask docstring), and occlusion combines the
forward-backward check with a motion-boundary mask.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.sampling import flow_warp


def _flow_magnitude_sq_mean_terms(flow: np.ndarray) -> np.ndarray:
    """Per-pixel squared magnitude of an (H, W, 2) flow."""
    return flow[..., 0] ** 2 + flow[..., 1] ** 2


def occlusion_mask(fw_flow: np.ndarray, bw_flow: np.ndarray) -> np.ndarray:
    """Occlusion mask (1 = occluded) for warping frame2 into frame1.

    fw_flow: flow frame1 -> frame2; bw_flow: flow frame2 -> frame1, both
    (H, W, 2).  Reproduces the reference recipe
    (src/models/utils.py:532-572): warp fw_flow into frame2's grid by
    bw_flow, then
      mask1: ||fw_w + bw|| > 0.01 * (||fw_w|| + ||bw||) + 0.5
      mask2: motion-boundary of bw_flow:
             sum of squared one-sided gradients > 0.01 * ||bw|| + 0.002
    """
    fw = np.asarray(fw_flow, np.float32)
    bw = np.asarray(bw_flow, np.float32)
    fw_warped = np.asarray(flow_warp(jnp.asarray(fw), jnp.asarray(bw)))

    fb_sum = fw_warped + bw
    fb_mag = _flow_magnitude_sq_mean_terms(fb_sum)
    fw_w_mag = _flow_magnitude_sq_mean_terms(fw_warped)
    bw_mag = _flow_magnitude_sq_mean_terms(bw)
    mask1 = fb_mag > 0.01 * (fw_w_mag + bw_mag) + 0.5

    # motion boundaries: one-sided differences of each flow channel
    du = np.zeros_like(bw[..., 0])
    dv = np.zeros_like(bw[..., 0])
    gx_u = np.zeros_like(du); gx_v = np.zeros_like(du)
    gy_u = np.zeros_like(du); gy_v = np.zeros_like(du)
    gx_u[:, :-1] = bw[:, :-1, 0] - bw[:, 1:, 0]
    gx_v[:, :-1] = bw[:, :-1, 1] - bw[:, 1:, 1]
    gy_u[:-1, :] = bw[:-1, :, 0] - bw[1:, :, 0]
    gy_v[:-1, :] = bw[:-1, :, 1] - bw[1:, :, 1]
    fx_mag = gx_u ** 2 + gx_v ** 2
    fy_mag = gy_u ** 2 + gy_v ** 2
    mask2 = (fx_mag + fy_mag) > 0.01 * bw_mag + 0.002

    return np.logical_or(mask1, mask2).astype(np.float32)


def warp_error(frame1: np.ndarray, frame2: np.ndarray,
               fw_flow: np.ndarray, bw_flow: np.ndarray) -> float:
    """Occlusion-masked mean squared warp error between consecutive frames.

    frame1/frame2: (H, W, 3) in [0, 1]; fw_flow: frame1->frame2;
    bw_flow: frame2->frame1.  frame2 is warped into frame1's grid using
    bw_flow's inverse sense — i.e. warp(frame2; fw_flow) samples frame2 at
    p + fw_flow(p), which lands on frame1's grid.
    """
    warped = np.asarray(flow_warp(jnp.asarray(frame2, jnp.float32),
                                  jnp.asarray(fw_flow, jnp.float32)))
    occ = occlusion_mask(fw_flow, bw_flow)
    noc = 1.0 - occ
    denom = noc.sum()
    if denom == 0:
        return 0.0
    diff = ((np.asarray(frame1, np.float32) - warped) ** 2).sum(-1)
    return float((diff * noc).sum() / denom)
