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


def render_frames(params: Params, specs: AtlasSpecs,
                  T: int, H: int, W: int, mesh=None) -> np.ndarray:
    """Render all frames -> (T, H, W, 3) float32 on host."""
    return np.asarray(_render_all(params, specs, H, W, T, mesh=mesh))


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
    if specs.dual:
        uv2 = imlp_apply(params["mapping2"],
                         normalize_xyt(j, i, ff, L, T), specs.mapping2)
        rgb2 = (imlp_apply(params["atlas"], uv2 * 0.5 - 0.5,
                           specs.atlas) + 1) * 0.5
        a = _squash_alpha(imlp_apply(params["alpha"],
                                     normalize_xyt(j, i, ff, L, T),
                                     specs.alpha))
        rgb = rgb1 * a + rgb2 * (1.0 - a)
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
    }


def save_diagnostic_videos(params: Params, specs: AtlasSpecs,
                           data: VideoData, cfg: AtlasConfig,
                           results_folder: str | Path, fps: int = 10) -> None:
    """residuals / uv / per-pixel-loss mp4s (the reference evaluator's
    visualization set, evaluate.py:729-773 single path)."""
    import cv2

    results_folder = Path(results_folder)
    results_folder.mkdir(parents=True, exist_ok=True)
    T, (H, W) = data.num_frames, data.res

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writers = {name: cv2.VideoWriter(str(results_folder / f"{name}.mp4"),
                                     fourcc, fps, (W, H))
               for name in ("residuals", "uv_1", "rigidity_loss",
                            "flow_loss", "rgb_error")}
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
            for name, key, scale in (("rigidity_loss", "rigidity_map", None),
                                     ("flow_loss", "flow_map", None),
                                     ("rgb_error", "rgb_error_map", None)):
                m = diag[key]
                m = m / max(float(m.max()), 1e-6)
                gray = (np.stack([m] * 3, -1) * 255).astype(np.uint8)
                writers[name].write(gray)
    finally:
        for w in writers.values():
            w.release()


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
                      save_ckpt: bool = True) -> Tuple[np.ndarray, float]:
    """Render, write output PNGs + PSNR marker (+ mp4, + checkpoint).

    Returns (rendered (T,H,W,3), mean PSNR).  Artifact layout matches the
    reference stage-1 results folder (SURVEY.md §1 filesystem contract).
    """
    from ..io.media import frames_to_video, write_image

    results_folder = Path(results_folder)
    out_dir = results_folder / "output"
    out_dir.mkdir(parents=True, exist_ok=True)

    T, (H, W) = data.num_frames, data.res
    video_np = np.asarray(data.video)

    rendered = render_frames(params, specs, T, H, W)
    psnrs = np.zeros(T)
    for f in range(T):
        write_image(rendered[f], out_dir / f"{f:05d}.png")
        psnrs[f] = psnr(video_np[f], rendered[f], data_range=1.0)

    mean_psnr = float(psnrs.mean())
    # PSNR marker file, like the reference's `PSNR_<val>` (evaluate.py:782-783)
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
