"""Procedural training clips for stage-2 training (device-side, jittable).

The reference ships its stage-2 networks as pretrained blobs
(`neural_filter.pth`, `local_refinement_net.pth`, loaded at
src/neural_filter_and_refinement.py:46-66) and only vestigial training code
(src/models/datasets_local.py — a dataset of processed/original frame pairs
that does not exist in this environment).  This module replaces the missing
training DATA: procedurally generated video clips with

  * an exact ground-truth clean sequence (no flicker, temporally consistent),
  * the flickered input (global + spatially-smooth per-frame gain/bias — the
    degradation model of "blind deflickering": old film exposure flicker,
    per-frame processed-video inconsistency),
  * a "flawed atlas" rendering analog (temporally CONSISTENT but blurry and
    slightly misaligned — exactly the stage-1 atlas artifact profile the
    UNet filter is trained to fuse away, paper §3),
  * the exact backward optical flow between consecutive frames (for the
    refinement network's temporal-consistency loss).

Everything is built from random Fourier features evaluated at affine-warped
pixel coordinates, so there is no stored texture: frames, flow and the atlas
are closed-form functions of the per-clip random key, generated on device
inside the jitted training step (zero host I/O, zero H2D traffic).

  frame_t(p)  = tex(A_t p)            A_t: smooth random affine trajectory
  flow_bw_t(p) = A_{t-1}^{-1}(A_t p) - p   (exact: warp(frame_{t-1}) = frame_t)
  atlas_t(p)  = tex_lowpass(A_t p + d(A_t p))   d: small static displacement
  input_t(p)  = clip(frame_t(p) * gain_t(p) + bias_t, 0, 1)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Clip(NamedTuple):
    """All tensors f32; images in [0, 1]."""

    clean: jax.Array     # (T, H, W, 3) ground-truth (consistent, sharp)
    inp: jax.Array       # (T, H, W, 3) flickered input
    atlas: jax.Array     # (T, H, W, 3) flawed-atlas analog
    flow_bw: jax.Array   # (T, H, W, 2) flow_bw[t]: frame t -> t-1 (t=0: 0)


def _texture_params(key, n_freqs: int, min_period: float, max_period: float):
    """Random Fourier texture: per-channel amplitudes with a 1/f spectrum.

    Returns (freqs (K, 2) cycles/px, phases (K, 3), amps (K, 3))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mag = jnp.exp(jax.random.uniform(
        k1, (n_freqs,), minval=jnp.log(1.0 / max_period),
        maxval=jnp.log(1.0 / min_period)))
    ang = jax.random.uniform(k2, (n_freqs,), maxval=2.0 * jnp.pi)
    freqs = mag[:, None] * jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    phases = jax.random.uniform(k3, (n_freqs, 3), maxval=2.0 * jnp.pi)
    amps = jax.random.normal(k4, (n_freqs, 3)) / (
        mag[:, None] * max_period)          # ~1/f: energy at coarse scales
    amps = amps / jnp.sqrt(jnp.sum(amps ** 2, axis=0, keepdims=True) + 1e-8)
    return freqs, phases, amps


def _eval_texture(u, freqs, phases, amps, gain: float = 2.5):
    """tex(u): u (..., 2) px -> rgb (..., 3) in [0, 1]."""
    ph = 2.0 * jnp.pi * (u @ freqs.T)                    # (..., K)
    val = jnp.cos(ph[..., None] + phases) * amps         # (..., K, 3)
    return 0.5 + 0.5 * jnp.tanh(gain * jnp.sum(val, axis=-2))


def _affine_trajectory(key, T: int, H: int, W: int):
    """Smooth random camera path: per-frame 2x2 matrix M_t + offset o_t with
    u = M_t p + o_t.  Steps are Gaussian random walks in translation,
    rotation and log-zoom (a few px / centi-radians per frame — RAFT-scale
    motion at these resolutions)."""
    kt, kr, kz = jax.random.split(key, 3)
    trans = jnp.cumsum(jax.random.normal(kt, (T, 2)) * 1.5, axis=0)
    rot = jnp.cumsum(jax.random.normal(kr, (T,)) * 0.008, axis=0)
    zoom = jnp.exp(jnp.cumsum(jax.random.normal(kz, (T,)) * 0.004, axis=0))
    c, s = jnp.cos(rot), jnp.sin(rot)
    M = zoom[:, None, None] * jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2)  # (T, 2, 2)
    center = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0])
    # u = M (p - center) + center + trans  =>  offset = center + trans - M c
    offset = center[None] + trans - jnp.einsum("tij,j->ti", M, center)
    return M, offset


def _pixel_grid(H: int, W: int):
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return jnp.stack([xs, ys], axis=-1)                  # (H, W, 2) = (x, y)


def make_clip(key: jax.Array, T: int, H: int, W: int,
              n_freqs: int = 48, flicker_gain: float = 0.25,
              flicker_bias: float = 0.08, local_gain: float = 0.15,
              atlas_shift: float = 0.06, atlas_warp_px: float = 2.0,
              blur_period: float = 12.0) -> Clip:
    """One training clip.  See module docstring for the construction."""
    (k_tex, k_cam, k_shift, k_warp, k_gain, k_bias,
     k_field) = jax.random.split(key, 7)
    freqs, phases, amps = _texture_params(k_tex, n_freqs,
                                          min_period=4.0, max_period=96.0)
    M, off = _affine_trajectory(k_cam, T, H, W)
    grid = _pixel_grid(H, W)

    def frame_coords(t):
        return jnp.einsum("ij,hwj->hwi", M[t], grid) + off[t]

    coords = jax.vmap(frame_coords)(jnp.arange(T))       # (T, H, W, 2)
    clean = _eval_texture(coords, freqs, phases, amps)

    # -- flawed atlas: low-pass texture (drop fine frequencies — the atlas
    # blur), constant color shift, static misaligning displacement field
    fmag = jnp.sqrt(jnp.sum(freqs ** 2, axis=-1))
    lp_amps = amps * (fmag < 1.0 / blur_period)[:, None]
    shift = jax.random.uniform(k_shift, (3,), minval=-atlas_shift,
                               maxval=atlas_shift)
    wf, wp, wa = _texture_params(k_warp, 8, min_period=24.0, max_period=128.0)
    disp = (_eval_texture(coords, wf, wp, wa) - 0.5)[..., :2] \
        * (2.0 * atlas_warp_px)
    atlas = jnp.clip(
        _eval_texture(coords + disp, freqs, phases, lp_amps) + shift, 0., 1.)

    # -- flicker: per-frame global gain/bias + smooth spatial gain field
    g = 1.0 + jax.random.uniform(k_gain, (T, 1, 1, 3), minval=-flicker_gain,
                                 maxval=flicker_gain)
    b = jax.random.uniform(k_bias, (T, 1, 1, 3), minval=-flicker_bias,
                           maxval=flicker_bias)
    field = jax.random.uniform(k_field, (T, 3, 4, 1), minval=-local_gain,
                               maxval=local_gain)
    field = 1.0 + jax.image.resize(field, (T, H, W, 1), "linear")
    inp = jnp.clip(clean * g * field + b, 0.0, 1.0)

    # -- exact backward flow: flow_bw[t](p) = A_{t-1}^{-1}(A_t p) - p
    Minv = jnp.linalg.inv(M)                             # (T, 2, 2)

    def bw(t):
        u = coords[t]                                    # A_t p
        p_prev = jnp.einsum("ij,hwj->hwi", Minv[t - 1], u - off[t - 1])
        return p_prev - grid

    flow_bw = jnp.concatenate(
        [jnp.zeros((1, H, W, 2)),
         jax.vmap(bw)(jnp.arange(1, T))], axis=0)
    return Clip(clean, inp, atlas, flow_bw)


def make_image_clip(key: jax.Array, tex: jax.Array, T: int, H: int, W: int,
                    flicker_gain: float = 0.25, flicker_bias: float = 0.08,
                    local_gain: float = 0.15, atlas_shift: float = 0.06,
                    atlas_warp_px: float = 2.0) -> Clip:
    """A clip whose texture is a real IMAGE instead of Fourier features —
    same affine camera machinery, same exact flow, real image statistics.

    `tex`: (Ht, Wt, 3) f32 in [0, 1], larger than (H, W) by a safe margin
    (the trajectory keeps coordinates well inside; out-of-bounds sampling
    would read zeros).  The flawed-atlas analog blurs the texture by a
    down/up resize, adds a constant color shift and a static misaligning
    displacement.  Use alongside `make_clip` to mix real-image content
    into training (cli.train_stage2 --texture_dir).
    """
    from ..ops.sampling import bilinear_sample

    Ht, Wt = tex.shape[0], tex.shape[1]
    (k_cam, k_start, k_shift, k_warp, k_gain, k_bias,
     k_field) = jax.random.split(key, 7)
    M, off = _affine_trajectory(k_cam, T, H, W)
    # recenter into the texture with a random start inside the margin;
    # shrink a touch so rotation corners stay inside
    margin = jnp.array([(Wt - W) / 2.0, (Ht - H) / 2.0])
    start = (jnp.array([(Wt - W) / 2.0, (Ht - H) / 2.0])
             + jax.random.uniform(k_start, (2,), minval=-0.5, maxval=0.5)
             * margin * 0.5)
    M = 0.92 * M
    off = off + start[None]
    grid = _pixel_grid(H, W)

    def frame_coords(t):
        return jnp.einsum("ij,hwj->hwi", M[t], grid) + off[t]

    coords = jax.vmap(frame_coords)(jnp.arange(T))       # (T, H, W, 2)
    clean = jax.vmap(lambda c: bilinear_sample(tex, c))(coords)

    # flawed atlas: blurred texture + color shift + static misalignment
    blur = jax.image.resize(
        jax.image.resize(tex, (max(Ht // 6, 1), max(Wt // 6, 1), 3),
                         "linear"), (Ht, Wt, 3), "linear")
    shift = jax.random.uniform(k_shift, (3,), minval=-atlas_shift,
                               maxval=atlas_shift)
    wf, wp, wa = _texture_params(k_warp, 8, min_period=24.0, max_period=128.0)
    disp = (_eval_texture(coords, wf, wp, wa) - 0.5)[..., :2] \
        * (2.0 * atlas_warp_px)
    atlas = jnp.clip(jax.vmap(lambda c: bilinear_sample(blur, c))(
        coords + disp) + shift, 0.0, 1.0)

    g = 1.0 + jax.random.uniform(k_gain, (T, 1, 1, 3), minval=-flicker_gain,
                                 maxval=flicker_gain)
    b = jax.random.uniform(k_bias, (T, 1, 1, 3), minval=-flicker_bias,
                           maxval=flicker_bias)
    field = jax.random.uniform(k_field, (T, 3, 4, 1), minval=-local_gain,
                               maxval=local_gain)
    field = 1.0 + jax.image.resize(field, (T, H, W, 1), "linear")
    inp = jnp.clip(clean * g * field + b, 0.0, 1.0)

    Minv = jnp.linalg.inv(M)

    def bw(t):
        u = coords[t]
        p_prev = jnp.einsum("ij,hwj->hwi", Minv[t - 1], u - off[t - 1])
        return p_prev - grid

    flow_bw = jnp.concatenate(
        [jnp.zeros((1, H, W, 2)),
         jax.vmap(bw)(jnp.arange(1, T))], axis=0)
    return Clip(clean, inp, atlas, flow_bw)


def load_texture_bank(texture_dir, tex_h: int, tex_w: int,
                      max_textures: int = 64) -> "np.ndarray | None":
    """Host-side: load frames/images from a directory into a (N, th, tw, 3)
    f32 bank for `make_image_clip` (random crops resized to a fixed texture
    shape so the bank stacks).  Returns None if the directory has no images."""
    from pathlib import Path

    import cv2
    import numpy as np

    from ..io.media import list_frames, read_image

    texture_dir = Path(texture_dir)
    names = list_frames(texture_dir) if texture_dir.is_dir() else []
    if not names:
        return None
    step = max(1, len(names) // max_textures)
    bank = []
    for p in names[::step][:max_textures]:
        img = read_image(p).astype(np.float32)   # already RGB in [0, 1]
        if img.shape[:2] != (tex_h, tex_w):
            img = cv2.resize(img, (tex_w, tex_h),
                             interpolation=cv2.INTER_AREA)
        bank.append(img[..., :3])
    return np.stack(bank)


def warp_valid_mask(flow: jax.Array, H: int, W: int) -> jax.Array:
    """1.0 where p + flow(p) lands inside the image (flow_warp reads zeros
    outside — exclude those pixels from temporal losses).  flow: (..., H, W, 2)."""
    grid = _pixel_grid(H, W)
    tgt = grid + flow
    ok = ((tgt[..., 0] >= 0) & (tgt[..., 0] <= W - 1)
          & (tgt[..., 1] >= 0) & (tgt[..., 1] <= H - 1))
    return ok.astype(jnp.float32)[..., None]
