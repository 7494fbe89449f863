"""Stage-1 renderer / evaluator.

Renders every frame from the fitted atlas — the output consumed by stage 2 —
and writes the reference's artifact set
(reference: src/models/stage_1/evaluate.py:616-793 single /
:203-602 dual): `results/<vid>/stage_1/output/%05d.png`, per-frame PSNR, a
`PSNR_<mean>` marker file, a reconstruction mp4, and a checkpoint.

TPU-first: a frame's full pixel grid is one (H*W)-row fused MLP forward
(the reference chunks 100k coordinates at a time through many small GPU
calls, evaluate.py:640-708); frames go through a single jitted function so
the renderer compiles once and streams D2H one frame at a time.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AtlasConfig
from ..metrics import psnr
from ..models.imlp import imlp_apply
from ..ops.coords import normalize_xyt
from ..utils.checkpoint import save_checkpoint
from .data import VideoData
from .engine import AtlasSpecs, Params, _squash_alpha


@partial(jax.jit, static_argnames=("specs", "H", "W", "T", "mesh"))
def render_frame(params: Params, specs: AtlasSpecs, f: jax.Array,
                 H: int, W: int, T: int, mesh=None) -> Dict[str, jax.Array]:
    """Render one frame (all H*W pixels) from the fitted models.

    Returns {'rgb': (H, W, 3), 'uv1': (H, W, 2)[, 'alpha': (H, W, 1)]} —
    rgb is the atlas reconstruction the reference writes to
    `output/%05d.png` (evaluate.py:729-733).  With a mesh, the pixel batch
    shards over the data axis (XLA SPMD splits the fused MLP forwards).
    """
    from ..parallel import shard_constraint

    L = max(H, W)
    ii, jj = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    jif = (jj.reshape(-1), ii.reshape(-1), jnp.full((H * W,), f))
    xyt = shard_constraint(normalize_xyt(*jif, L, T), mesh)

    uv1 = imlp_apply(params["mapping1"], xyt, specs.mapping1)
    rgb1 = (imlp_apply(params["atlas"], uv1 * 0.5 + 0.5, specs.atlas) + 1.0) * 0.5
    out = {"uv1": uv1.reshape(H, W, 2)}
    if specs.dual:
        uv2 = imlp_apply(params["mapping2"], xyt, specs.mapping2)
        rgb2 = (imlp_apply(params["atlas"], uv2 * 0.5 - 0.5, specs.atlas) + 1.0) * 0.5
        a = _squash_alpha(imlp_apply(params["alpha"], xyt, specs.alpha))
        rgb = rgb1 * a + rgb2 * (1.0 - a)
        out["alpha"] = a.reshape(H, W, 1)
        out["uv2"] = uv2.reshape(H, W, 2)
    else:
        rgb = rgb1
    out["rgb"] = rgb.reshape(H, W, 3)
    return out


@partial(jax.jit, static_argnames=("specs", "H", "W", "T", "mesh"))
def _render_all(params: Params, specs: AtlasSpecs,
                H: int, W: int, T: int, mesh=None) -> jax.Array:
    """All frames in ONE compiled program (lax.map over t) — one dispatch
    and one D2H instead of T of each, which matters on remotely-attached
    devices; frames stream through lax.map so peak memory stays
    O(frame), not O(video)."""
    def one(f):
        return render_frame(params, specs, f, H, W, T, mesh=mesh)["rgb"]

    return jax.lax.map(one, jnp.arange(T))


@partial(jax.jit, static_argnames=("specs", "n", "H", "W", "T", "mesh"))
def _render_span(params: Params, specs: AtlasSpecs, f0: jax.Array,
                 n: int, H: int, W: int, T: int, mesh=None) -> jax.Array:
    """Render frames [f0, f0+n) — fixed shape, so every span reuses one
    compile regardless of f0."""
    def one(f):
        return render_frame(params, specs, f, H, W, T, mesh=mesh)["rgb"]

    return jax.lax.map(one, f0 + jnp.arange(n))


def render_frames(params: Params, specs: AtlasSpecs,
                  T: int, H: int, W: int, mesh=None,
                  t_chunk: int | None = None,
                  max_device_bytes: float = 1.5e9) -> np.ndarray:
    """Render all frames -> (T, H, W, 3) float32 on host.

    For small videos this is ONE dispatch + ONE D2H (`_render_all`).  When
    the full rendered video would exceed `max_device_bytes` of HBM (e.g.
    200 frames at --down 1), frames stream out in fixed-size spans of
    `t_chunk` frames instead — peak device memory O(t_chunk·H·W), one
    compile total (the final span overlaps backwards rather than shrinking,
    keeping its shape static)."""
    if t_chunk is None:
        frame_bytes = H * W * 3 * 4
        if T * frame_bytes > max_device_bytes:
            t_chunk = max(1, int(max_device_bytes // frame_bytes))
    if not t_chunk or t_chunk >= T:
        return np.asarray(_render_all(params, specs, H, W, T, mesh=mesh))
    out = np.zeros((T, H, W, 3), np.float32)
    for s0 in range(0, T, t_chunk):
        f0 = min(s0, T - t_chunk)
        out[f0:f0 + t_chunk] = np.asarray(_render_span(
            params, specs, jnp.int32(f0), t_chunk, H, W, T, mesh=mesh))
    return out


@partial(jax.jit, static_argnames=("specs", "cfg"))
def render_diagnostics(params: Params, specs: AtlasSpecs, data: VideoData,
                       f: jax.Array, cfg: AtlasConfig) -> Dict[str, jax.Array]:
    """Per-pixel diagnostic maps for one frame: reconstruction, residual,
    rigidity loss, flow loss — the reference's `_all` loss visualizations
    (loss_utils.py:283-295,360-382; evaluate.py:672-712)."""
    from ..losses import rigidity_loss, safe_norm
    from ..models.imlp import imlp_apply
    from .engine import _squash_alpha

    T, (H, W) = data.num_frames, data.res
    L = data.larger_dim
    d = cfg.derivative_amount
    ii, jj = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    j = jj.reshape(-1)
    i = ii.reshape(-1)
    ff = jnp.full((H * W,), f)

    ffwd = data.flow_fwd[ff, i, j]
    mfwd = data.mask_fwd[ff, i, j]

    def uv_at(jx, iy, fz):
        return imlp_apply(params["mapping1"],
                          normalize_xyt(jx, iy, fz, L, T), specs.mapping1)

    uv = uv_at(j, i, ff)
    uv_ym = uv_at(j, i - d, ff)
    uv_xm = uv_at(j - d, i, ff)
    uv_fwd = uv_at(j + ffwd[:, 0], i + ffwd[:, 1],
                   ff.astype(jnp.float32) + 1.0)

    rgb1 = (imlp_apply(params["atlas"], uv * 0.5 + 0.5, specs.atlas) + 1) * 0.5
    extra = {}
    if specs.dual:
        uv2 = imlp_apply(params["mapping2"],
                         normalize_xyt(j, i, ff, L, T), specs.mapping2)
        rgb2 = (imlp_apply(params["atlas"], uv2 * 0.5 - 0.5,
                           specs.atlas) + 1) * 0.5
        a = _squash_alpha(imlp_apply(params["alpha"],
                                     normalize_xyt(j, i, ff, L, T),
                                     specs.alpha))
        rgb = rgb1 * a + rgb2 * (1.0 - a)
        extra["uv2"] = uv2.reshape(H, W, 2)
        extra["alpha"] = a.reshape(H, W)
    else:
        rgb = rgb1

    rig = rigidity_loss(uv, uv_ym, uv_xm, d, L, cfg.uv_mapping_scale,
                        reduce=False)
    flow_err = (safe_norm(uv_fwd - uv) * L / (2.0 * cfg.uv_mapping_scale)
                * mfwd)
    gt = data.video[f].reshape(H * W, 3)
    return {
        "rgb": rgb.reshape(H, W, 3),
        "residual": (gt - rgb).reshape(H, W, 3),
        "uv1": uv.reshape(H, W, 2),
        "rigidity_map": rig.reshape(H, W),
        "flow_map": flow_err.reshape(H, W),
        "rgb_error_map": jnp.sum((gt - rgb) ** 2, axis=-1).reshape(H, W),
        **extra,
    }


def _global_info_panel(diag: Dict[str, np.ndarray],
                       original: np.ndarray) -> np.ndarray:
    """One matplotlib "global info" frame: reconstruction / original / RGB
    error / flow loss / rigidity loss in the reference's subplot layout and
    value ranges (evaluate.py:745-773)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(20, 10))
    plt.subplot(3, 4, 1)
    plt.imshow(np.clip(diag["rgb"], 0, 1), vmin=0.0, vmax=1.0)
    plt.colorbar()
    plt.title("video_reconstruction")
    plt.subplot(3, 4, 2)
    plt.imshow(original, vmin=0.0, vmax=1.0)
    plt.colorbar()
    plt.title("original_video")
    plt.subplot(3, 4, 3)
    plt.imshow(diag["rgb_error_map"], vmin=0.0, vmax=0.2)
    plt.colorbar()
    plt.title("RGB error")
    plt.subplot(3, 4, 9)
    plt.imshow(diag["flow_map"], vmin=0.0, vmax=2.0)
    plt.colorbar()
    plt.title("flow_loss1")
    plt.subplot(3, 4, 12)
    plt.imshow(diag["rigidity_map"], vmin=2.8, vmax=50.0)
    plt.colorbar()
    plt.title("rigidity_loss1")
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img


def save_diagnostic_videos(params: Params, specs: AtlasSpecs,
                           data: VideoData, cfg: AtlasConfig,
                           results_folder: str | Path, fps: int = 10,
                           global_info: bool = True) -> None:
    """residuals / uv / per-pixel-loss mp4s (the reference evaluator's
    visualization set, evaluate.py:729-773 single path), plus for the dual
    path: alpha, alpha-vs-mask, uv_2 and masked-uv_1 videos
    (evaluate.py:503-583), and the matplotlib `global_info.mp4` panels."""
    import cv2

    results_folder = Path(results_folder)
    results_folder.mkdir(parents=True, exist_ok=True)
    T, (H, W) = data.num_frames, data.res
    video_np = None

    names = ["residuals", "uv_1", "rigidity_loss", "flow_loss", "rgb_error"]
    if specs.dual:
        names += ["alpha", "alpha_vs_mask", "uv_2", "uv_1_masked"]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writers = {name: cv2.VideoWriter(str(results_folder / f"{name}.mp4"),
                                     fourcc, fps, (W, H))
               for name in names}
    w_info = None
    try:
        for f in range(T):
            diag = jax.tree_util.tree_map(
                np.asarray, render_diagnostics(params, specs, data, f, cfg))
            res = np.clip(diag["residual"] + 0.5, 0, 1)
            writers["residuals"].write(
                (res[..., ::-1] * 255).astype(np.uint8))
            # uv in [-1,1] -> [0,1] (normalize_uv_images with edge 1)
            uv_img = np.zeros((H, W, 3), np.float32)
            uv_img[..., :2] = np.clip(diag["uv1"] * 0.5 + 0.5, 0, 1)
            writers["uv_1"].write((uv_img[..., ::-1] * 255).astype(np.uint8))
            for name, key in (("rigidity_loss", "rigidity_map"),
                              ("flow_loss", "flow_map"),
                              ("rgb_error", "rgb_error_map")):
                m = diag[key]
                m = m / max(float(m.max()), 1e-6)
                gray = (np.stack([m] * 3, -1) * 255).astype(np.uint8)
                writers[name].write(gray)
            if specs.dual:
                a = np.clip(diag["alpha"], 0, 1)
                writers["alpha"].write(
                    (np.stack([a] * 3, -1)[..., ::-1] * 255).astype(np.uint8))
                # red = provided mask, green = learned alpha
                # (alpha_vs_mask_rcnn, evaluate.py:552-557)
                mask_f = np.asarray(data.mask[f])
                avm = np.stack([mask_f, a, np.zeros_like(a)], axis=-1)
                writers["alpha_vs_mask"].write(
                    (avm[..., ::-1] * 255).astype(np.uint8))
                uv2_img = np.zeros((H, W, 3), np.float32)
                uv2_img[..., :2] = np.clip(diag["uv2"] * 0.5 + 0.5, 0, 1)
                writers["uv_2"].write(
                    (uv2_img[..., ::-1] * 255).astype(np.uint8))
                writers["uv_1_masked"].write(
                    ((uv_img * a[..., None])[..., ::-1] * 255
                     ).astype(np.uint8))
            if global_info:
                if video_np is None:
                    video_np = np.asarray(data.video)
                panel = _global_info_panel(diag, video_np[f])
                if w_info is None:
                    ph, pw = panel.shape[:2]
                    w_info = cv2.VideoWriter(
                        str(results_folder / "global_info.mp4"), fourcc,
                        fps, (pw, ph))
                w_info.write(panel[..., ::-1])
    finally:
        for w in writers.values():
            w.release()
        if w_info is not None:
            w_info.release()


def save_mask_flow_videos(data: VideoData, results_folder: str | Path,
                          fps: int = 10) -> None:
    """Diagnostic videos: input video + forward-flow consistency mask
    overlay (masked-out pixels painted red), the reference's
    `save_mask_flow` (src/models/stage_1/unwrap_utils.py:200-231)."""
    import cv2

    results_folder = Path(results_folder)
    results_folder.mkdir(parents=True, exist_ok=True)
    video = np.asarray(data.video)
    mfwd = np.asarray(data.mask_fwd)
    T, H, W, _ = video.shape

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w_in = cv2.VideoWriter(str(results_folder / "input_video.mp4"),
                           fourcc, fps, (W, H))
    w_mask = cv2.VideoWriter(str(results_folder / "filter_flow_0.mp4"),
                             fourcc, fps, (W, H))
    for t in range(T):
        frame = video[t].copy()
        if mfwd[t].any():
            bad = mfwd[t] == 0
            frame[bad] = [1.0, 0.0, 0.0]
            w_mask.write((frame[..., ::-1] * 255).astype(np.uint8))
        w_in.write((video[t][..., ::-1] * 255).astype(np.uint8))
    w_in.release()
    w_mask.release()


def evaluate_and_save(params: Params, specs: AtlasSpecs, data: VideoData,
                      cfg: AtlasConfig, results_folder: str | Path,
                      iteration: int, opt_state=None,
                      save_video: bool = True,
                      save_ckpt: bool = True,
                      frame_offset: int = 0,
                      first_saved_frame: int = 0,
                      psnr_marker: bool = True) -> Tuple[np.ndarray, float]:
    """Render, write output PNGs + PSNR marker (+ mp4, + checkpoint).

    Returns (rendered (T,H,W,3), mean PSNR).  Artifact layout matches the
    reference stage-1 results folder (SURVEY.md §1 filesystem contract).

    `frame_offset` / `first_saved_frame` serve the auto-chunked long-video
    path: frame f of `data` saves as `%05d % (f + frame_offset)`, frames
    below `first_saved_frame` are rendered but not written (the last
    chunk's overlap region, already owned by the previous chunk), and the
    returned PSNR averages saved frames only.
    """
    from ..io.media import frames_to_video, write_image

    results_folder = Path(results_folder)
    out_dir = results_folder / "output"
    out_dir.mkdir(parents=True, exist_ok=True)

    T, (H, W) = data.num_frames, data.res
    video_np = np.asarray(data.video)

    rendered = render_frames(params, specs, T, H, W)
    psnrs = np.zeros(T - first_saved_frame)
    for f in range(first_saved_frame, T):
        write_image(rendered[f], out_dir / f"{f + frame_offset:05d}.png")
        psnrs[f - first_saved_frame] = psnr(video_np[f], rendered[f],
                                            data_range=1.0)

    mean_psnr = float(psnrs.mean())
    # PSNR marker file, like the reference's `PSNR_<val>` (evaluate.py:782-783)
    if psnr_marker:
        (results_folder / f"PSNR_{mean_psnr:.2f}").touch()

    if save_video:
        frames_to_video(out_dir, results_folder / "reconstruction.mp4", fps=10)
    if cfg.save_diagnostics:
        save_diagnostic_videos(params, specs, data, cfg, results_folder)

    if save_ckpt:
        save_checkpoint(results_folder / "checkpoint", {
            "params": params,
            "opt_state": opt_state,
            "iteration": iteration,
            "dual": specs.dual,
        })
    return rendered, mean_psnr
