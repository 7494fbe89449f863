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

Distribution-breadth extensions (added after the schedule-scaling knee was
found — more steps overfit the affine-only distribution, BASELINE.md):

  * **Foreground layer** (probability `p_layer` per clip): a second Fourier
    texture on its own affine trajectory B_t, composited through a soft
    elliptical mask that RIDES the foreground surface (m_t(p) = M(B_t p)).
    The scene's backward flow is layered — foreground flow where the mask
    is on, background flow elsewhere — which is exactly the non-affine,
    occlusion-bearing flow structure of real video.  `Clip.valid` marks
    where the temporal correspondence is trustworthy: in-bounds AND not in
    the mask's soft edge band AND (for background pixels) not occluded by
    the foreground at t-1.
  * **Correlated flicker** (`corr_flicker`): per-clip AR(1) gain/bias
    series (rho ~ U(0, 0.9)) instead of iid — real exposure flicker drifts
    frame to frame; iid is the rho=0 corner of this family.
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
    valid: jax.Array     # (T, H, W, 1) 1.0 where the t->t-1 correspondence
    #                      is exact: in-bounds, off the fg-mask edge band,
    #                      and not occluded at t-1 (valid[0] = 1)


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


def _affine_trajectory(key, T: int, H: int, W: int, trans_px: float = 1.5):
    """Smooth random camera path: per-frame 2x2 matrix M_t + offset o_t with
    u = M_t p + o_t.  Steps are Gaussian random walks in translation,
    rotation and log-zoom (a few px / centi-radians per frame — RAFT-scale
    motion at these resolutions)."""
    kt, kr, kz = jax.random.split(key, 3)
    trans = jnp.cumsum(jax.random.normal(kt, (T, 2)) * trans_px, axis=0)
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


# ---------------------------------------------------------------------------
# foreground layer + correlated flicker (distribution-breadth machinery)
# ---------------------------------------------------------------------------

def _ellipse_params(key, H: int, W: int):
    """Random soft ellipse in foreground-TEXTURE space (u = B_t p, which at
    t=0 is ~image coordinates): center inside the middle half, radii
    10-28% of the image dims, random orientation."""
    kc, kr, ka = jax.random.split(key, 3)
    dims = jnp.array([W, H], jnp.float32)
    c = dims * (0.25 + 0.5 * jax.random.uniform(kc, (2,)))
    rad = dims * (0.10 + 0.18 * jax.random.uniform(kr, (2,)))
    ang = jax.random.uniform(ka, (), maxval=jnp.pi)
    return c, rad, ang


def _ellipse_mask(u, prm, sharpness: float = 12.0):
    """M(u) in [0, 1]: ~1 inside the ellipse, ~0 outside, smooth edge.
    u: (..., 2)."""
    c, rad, ang = prm
    d = u - c
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    x = (d[..., 0] * ca + d[..., 1] * sa) / rad[0]
    y = (-d[..., 0] * sa + d[..., 1] * ca) / rad[1]
    r = jnp.sqrt(x * x + y * y + 1e-8)
    return jax.nn.sigmoid(sharpness * (1.0 - r))[..., None]


def _layered_flow_valid(grid, H: int, W: int, m, flow_bg, flow_fg,
                        Mf, offf, prm, fg_on):
    """Compose the layered backward flow and its exact validity mask.

    m: (T, H, W, 1) foreground mask at t; flow_bg/flow_fg: (T, H, W, 2)
    with zero t=0 rows.  A pixel's flow is the visible surface's flow
    (foreground on top).  valid_t = in-bounds AND
      * foreground pixel (m > 0.8): always corresponded — the mask rides
        the surface, so M(B_{t-1} p_prev) == M(B_t p) identically;
      * background pixel (m < 0.2): the background point must be visible
        at t-1 too, i.e. NOT under the foreground: m_{t-1}(p_prev) < 0.2;
      * mask edge band (0.2 <= m <= 0.8): excluded — the composite mixes
        two motions there.
    """
    T = m.shape[0]
    sel = m > 0.5
    flow = jnp.where(sel, flow_fg, flow_bg)
    inb = warp_valid_mask(flow, H, W)
    p_prev = grid[None] + flow                           # (T, H, W, 2)

    def m_prev(t):
        u = jnp.einsum("ij,hwj->hwi", Mf[t - 1], p_prev[t]) + offf[t - 1]
        return _ellipse_mask(u, prm) * fg_on

    mp = jnp.concatenate([jnp.zeros((1, H, W, 1)),
                          jax.vmap(m_prev)(jnp.arange(1, T))], axis=0)
    ok = (m > 0.8) | ((m < 0.2) & (mp < 0.2))
    valid = inb * ok.astype(jnp.float32)
    return flow, valid.at[0].set(1.0)


def _corr_flicker_series(key, T: int, bound: float):
    """Per-frame (T, 1, 1, 3) multiplier offsets: stationary AR(1) with a
    per-clip correlation rho ~ U(0, 0.9), squashed by tanh so the series is
    bounded by `bound` (matching the iid-uniform legacy scale, whose std is
    bound/sqrt(3) ~ 0.58*bound vs tanh(N(0,1))'s ~0.61)."""
    k_rho, k_e = jax.random.split(key)
    rho = jax.random.uniform(k_rho, (), maxval=0.9)
    e = jax.random.normal(k_e, (T, 3))
    idx = jnp.arange(T)
    expo = jnp.maximum(idx[:, None] - idx[None, :], 0).astype(jnp.float32)
    L = jnp.tril(rho ** expo)
    # stationary scaling: the s=0 column carries the unit-variance initial
    # state, later columns the sqrt(1-rho^2)-scaled innovations
    scale = jnp.where(idx[None, :] == 0, 1.0,
                      jnp.sqrt(jnp.maximum(1.0 - rho ** 2, 1e-6)))
    w = (L * scale) @ e                                  # (T, 3), ~unit var
    return (bound * jnp.tanh(w))[:, None, None, :]


def _affine_backward_flow(coords, M, off, grid, T: int, H: int, W: int):
    """flow_bw[t](p) = A_{t-1}^{-1}(A_t p - o_{t-1}) - p, zero t=0 row."""
    Minv = jnp.linalg.inv(M)                             # (T, 2, 2)

    def bw(t):
        p_prev = jnp.einsum("ij,hwj->hwi", Minv[t - 1],
                            coords[t] - off[t - 1])
        return p_prev - grid

    return jnp.concatenate([jnp.zeros((1, H, W, 2)),
                            jax.vmap(bw)(jnp.arange(1, T))], axis=0)


def _flicker_input(clean, k_gain, k_bias, k_field, T, H, W,
                   flicker_gain, flicker_bias, local_gain,
                   corr_flicker: bool):
    """Flickered input: per-frame global gain/bias (iid uniform, or AR(1)
    when corr_flicker) + smooth iid spatial gain field."""
    if corr_flicker:
        g = 1.0 + _corr_flicker_series(k_gain, T, flicker_gain)
        b = _corr_flicker_series(k_bias, T, flicker_bias)
    else:
        g = 1.0 + jax.random.uniform(k_gain, (T, 1, 1, 3),
                                     minval=-flicker_gain,
                                     maxval=flicker_gain)
        b = jax.random.uniform(k_bias, (T, 1, 1, 3), minval=-flicker_bias,
                               maxval=flicker_bias)
    field = jax.random.uniform(k_field, (T, 3, 4, 1), minval=-local_gain,
                               maxval=local_gain)
    field = 1.0 + jax.image.resize(field, (T, H, W, 1), "linear")
    return jnp.clip(clean * g * field + b, 0.0, 1.0)


def make_clip(key: jax.Array, T: int, H: int, W: int,
              n_freqs: int = 48, flicker_gain: float = 0.25,
              flicker_bias: float = 0.08, local_gain: float = 0.15,
              atlas_shift: float = 0.06, atlas_warp_px: float = 2.0,
              blur_period: float = 12.0, p_layer: float = 0.0,
              corr_flicker: bool = False) -> Clip:
    """One training clip.  See module docstring for the construction.

    The defaults are the affine/iid distribution the SHIPPED stage-2
    weights were trained on (valid = the in-bounds mask); p_layer > 0
    adds the occlusion-bearing foreground layer and corr_flicker the
    AR(1) flicker series (both measured slightly negative on the single
    available real benchmark — BASELINE.md distribution study)."""
    (k_tex, k_cam, k_shift, k_warp, k_gain, k_bias,
     k_field, k_fg) = jax.random.split(key, 8)
    freqs, phases, amps = _texture_params(k_tex, n_freqs,
                                          min_period=4.0, max_period=96.0)
    M, off = _affine_trajectory(k_cam, T, H, W)
    grid = _pixel_grid(H, W)

    def frame_coords(Mt, ot):
        return jnp.einsum("tij,hwj->thwi", Mt, grid) + ot[:, None, None]

    coords = frame_coords(M, off)                        # (T, H, W, 2)
    clean_bg = _eval_texture(coords, freqs, phases, amps)

    # -- flawed atlas: low-pass texture (drop fine frequencies — the atlas
    # blur), constant color shift, static misaligning displacement field
    def atlas_of(cds, fr, ph, am, k_sh, k_wp):
        fmag = jnp.sqrt(jnp.sum(fr ** 2, axis=-1))
        lp = am * (fmag < 1.0 / blur_period)[:, None]
        sh = jax.random.uniform(k_sh, (3,), minval=-atlas_shift,
                                maxval=atlas_shift)
        wf, wp, wa = _texture_params(k_wp, 8, min_period=24.0,
                                     max_period=128.0)
        disp = (_eval_texture(cds, wf, wp, wa) - 0.5)[..., :2] \
            * (2.0 * atlas_warp_px)
        return jnp.clip(_eval_texture(cds + disp, fr, ph, lp) + sh, 0., 1.)

    atlas_bg = atlas_of(coords, freqs, phases, amps, k_shift, k_warp)
    flow_bg = _affine_backward_flow(coords, M, off, grid, T, H, W)

    # -- foreground layer (its own texture, trajectory and atlas artifact,
    # composited through a soft ellipse riding the foreground surface)
    (kf_tex, kf_cam, kf_ell, kf_on, kf_shift,
     kf_warp) = jax.random.split(k_fg, 6)
    Mf, offf = _affine_trajectory(kf_cam, T, H, W, trans_px=2.5)
    fg_coords = frame_coords(Mf, offf)
    ffreqs, fphases, famps = _texture_params(kf_tex, n_freqs,
                                             min_period=4.0, max_period=96.0)
    fg_clean = _eval_texture(fg_coords, ffreqs, fphases, famps)
    fg_atlas = atlas_of(fg_coords, ffreqs, fphases, famps, kf_shift, kf_warp)
    prm = _ellipse_params(kf_ell, H, W)
    fg_on = jax.random.bernoulli(kf_on, p_layer).astype(jnp.float32)
    m = _ellipse_mask(fg_coords, prm) * fg_on            # (T, H, W, 1)

    clean = m * fg_clean + (1.0 - m) * clean_bg
    atlas = m * fg_atlas + (1.0 - m) * atlas_bg
    flow_fg = _affine_backward_flow(fg_coords, Mf, offf, grid, T, H, W)
    flow_bw, valid = _layered_flow_valid(grid, H, W, m, flow_bg, flow_fg,
                                         Mf, offf, prm, fg_on)

    inp = _flicker_input(clean, k_gain, k_bias, k_field, T, H, W,
                         flicker_gain, flicker_bias, local_gain,
                         corr_flicker)
    return Clip(clean, inp, atlas, flow_bw, valid)


def make_image_clip(key: jax.Array, tex: jax.Array, T: int, H: int, W: int,
                    flicker_gain: float = 0.25, flicker_bias: float = 0.08,
                    local_gain: float = 0.15, atlas_shift: float = 0.06,
                    atlas_warp_px: float = 2.0, p_layer: float = 0.0,
                    corr_flicker: bool = False) -> Clip:
    """A clip whose BACKGROUND texture is a real IMAGE instead of Fourier
    features — same affine camera machinery, same exact flow, real image
    statistics.  The optional foreground layer (probability `p_layer`) is a
    Fourier texture on its own trajectory, exactly as in `make_clip`.

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
     k_field, k_fg) = jax.random.split(key, 8)
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

    def frame_coords(Mt, ot):
        return jnp.einsum("tij,hwj->thwi", Mt, grid) + ot[:, None, None]

    coords = frame_coords(M, off)                        # (T, H, W, 2)
    clean_bg = jax.vmap(lambda c: bilinear_sample(tex, c))(coords)

    # flawed atlas: blurred texture + color shift + static misalignment
    blur = jax.image.resize(
        jax.image.resize(tex, (max(Ht // 6, 1), max(Wt // 6, 1), 3),
                         "linear"), (Ht, Wt, 3), "linear")
    shift = jax.random.uniform(k_shift, (3,), minval=-atlas_shift,
                               maxval=atlas_shift)
    wf, wp, wa = _texture_params(k_warp, 8, min_period=24.0, max_period=128.0)
    disp = (_eval_texture(coords, wf, wp, wa) - 0.5)[..., :2] \
        * (2.0 * atlas_warp_px)
    atlas_bg = jnp.clip(jax.vmap(lambda c: bilinear_sample(blur, c))(
        coords + disp) + shift, 0.0, 1.0)
    flow_bg = _affine_backward_flow(coords, M, off, grid, T, H, W)

    # foreground layer: Fourier texture over the real-image background
    (kf_tex, kf_cam, kf_ell, kf_on, kf_shift,
     kf_warp) = jax.random.split(k_fg, 6)
    Mf, offf = _affine_trajectory(kf_cam, T, H, W, trans_px=2.5)
    fg_coords = frame_coords(Mf, offf)
    ffreqs, fphases, famps = _texture_params(kf_tex, 48, min_period=4.0,
                                             max_period=96.0)
    fg_clean = _eval_texture(fg_coords, ffreqs, fphases, famps)
    fmag = jnp.sqrt(jnp.sum(ffreqs ** 2, axis=-1))
    lp_famps = famps * (fmag < 1.0 / 12.0)[:, None]
    fshift = jax.random.uniform(kf_shift, (3,), minval=-atlas_shift,
                                maxval=atlas_shift)
    fwf, fwp, fwa = _texture_params(kf_warp, 8, min_period=24.0,
                                    max_period=128.0)
    fdisp = (_eval_texture(fg_coords, fwf, fwp, fwa) - 0.5)[..., :2] \
        * (2.0 * atlas_warp_px)
    fg_atlas = jnp.clip(_eval_texture(fg_coords + fdisp, ffreqs, fphases,
                                      lp_famps) + fshift, 0.0, 1.0)
    prm = _ellipse_params(kf_ell, H, W)
    fg_on = jax.random.bernoulli(kf_on, p_layer).astype(jnp.float32)
    m = _ellipse_mask(fg_coords, prm) * fg_on

    clean = m * fg_clean + (1.0 - m) * clean_bg
    atlas = m * fg_atlas + (1.0 - m) * atlas_bg
    flow_fg = _affine_backward_flow(fg_coords, Mf, offf, grid, T, H, W)
    flow_bw, valid = _layered_flow_valid(grid, H, W, m, flow_bg, flow_fg,
                                         Mf, offf, prm, fg_on)

    inp = _flicker_input(clean, k_gain, k_bias, k_field, T, H, W,
                         flicker_gain, flicker_bias, local_gain,
                         corr_flicker)
    return Clip(clean, inp, atlas, flow_bw, valid)


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
