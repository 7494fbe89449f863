"""Dual-atlas texture export + texture-space rendering.

TPU-native re-design of the reference dual evaluator's atlas machinery
(src/models/stage_1/evaluate.py:24-202 + evaluate_model:203-602):

  * `get_mapping_area` — uv bounding box that the (masked, alpha-passing)
    video pixels map into (evaluate.py:142-189); vectorized single device
    pass instead of 100k-chunked host loops;
  * `get_high_res_texture` — discretize the neural atlas into an RxR image
    (evaluate.py:87-126), one batched forward instead of a per-row loop;
    optional text-pattern overlay for visualizing the mapping;
  * `render_from_texture` — reconstruct frames by bilinearly sampling the
    DISCRETIZED texture at mapped uv (evaluate.py:24-83 get_colors path) —
    the capability that makes atlas-space video editing possible: edit the
    texture PNG, re-render the video;
  * `export_atlas_artifacts` — write the fg/bg texture PNGs, alpha maps and
    normalized uv visualizations the reference emits.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.imlp import imlp_apply
from ..ops.coords import normalize_xyt
from ..ops.sampling import bilinear_sample
from .data import VideoData
from .engine import AtlasSpecs, Params
from .render import render_frame


@functools.partial(jax.jit, static_argnames=(
    "specs", "use_mapping2", "invert_alpha", "larger_dim", "num_frames",
    "chunk", "n_chunks"))
def _area_chunk_reduce(params: Params, mask: jax.Array,
                       alpha_thresh: jax.Array, *, specs: AtlasSpecs,
                       use_mapping2: bool, invert_alpha: bool,
                       larger_dim: int, num_frames: int, chunk: int,
                       n_chunks: int):
    """One compiled pass over the whole (T*H*W) index space in fixed-size
    chunks (lax.map): per-chunk masked uv min/max + count, reduced on
    device.  Peak memory is O(chunk), never O(T*H*W) — the reference
    equivalently chunks 100k points (evaluate.py:156-170)."""
    T, H, W = mask.shape
    total = T * H * W
    mkey = "mapping2" if use_mapping2 else "mapping1"
    mspec = specs.mapping2 if use_mapping2 else specs.mapping1

    def one(k):
        idx = k * chunk + jnp.arange(chunk)
        valid = idx < total
        ix = jnp.minimum(idx, total - 1)
        f = ix // (H * W)
        rem = ix % (H * W)
        i = rem // W
        j = rem % W
        m = mask[f, i, j] > 0.5
        xyt = normalize_xyt(j, i, f, larger_dim, num_frames)
        uv = imlp_apply(params[mkey], xyt, mspec)
        a = imlp_apply(params["alpha"], xyt, specs.alpha)[:, 0]
        if invert_alpha:
            a = -a
        sel = (valid & m & (a > alpha_thresh))[:, None]
        lo = jnp.where(sel, uv, jnp.inf).min(axis=0)
        hi = jnp.where(sel, uv, -jnp.inf).max(axis=0)
        return lo, hi, jnp.sum(sel)

    lo, hi, n = jax.lax.map(one, jnp.arange(n_chunks))
    return lo.min(axis=0), hi.max(axis=0), n.sum()


def get_mapping_area(params: Params, specs: AtlasSpecs, mask: jax.Array,
                     larger_dim: int, num_frames: int, uv_shift: float,
                     use_mapping2: bool = False, invert_alpha: bool = False,
                     alpha_thresh: float = -0.5, chunk: int = 1 << 17
                     ) -> Tuple[float, float, float, float, float]:
    """(maxx, minx, maxy, miny, edge_size) of the uv area covered by pixels
    with mask==1 and (raw tanh) alpha > alpha_thresh, after uv*0.5+uv_shift.
    mask: (T, H, W).  Mirrors evaluate.py:142-189 (thresholds on the RAW
    alpha output, not the squashed one).

    Scales to full-res videos: the MLPs see `chunk` points at a time inside
    one scanned device program; only the (2,) min/max come back to host.
    """
    T, H, W = mask.shape
    total = T * H * W
    n_chunks = -(-total // chunk)
    fn = functools.partial(
        _area_chunk_reduce, specs=specs, use_mapping2=use_mapping2,
        invert_alpha=invert_alpha, larger_dim=larger_dim,
        num_frames=num_frames, chunk=chunk, n_chunks=n_chunks)
    lo, hi, n = fn(params, mask, jnp.float32(alpha_thresh))
    if int(n) == 0:
        return 1.0, -1.0, 1.0, -1.0, 2.0
    lo = np.asarray(lo) * 0.5 + uv_shift
    hi = np.asarray(hi) * 0.5 + uv_shift
    minx = float(max(lo[0], -1.0))
    miny = float(max(lo[1], -1.0))
    maxx = float(min(hi[0], 1.0))
    maxy = float(min(hi[1], 1.0))
    edge = float(max(maxx - minx, maxy - miny))
    return maxx, minx, maxy, miny, edge


def get_high_res_texture(resolution: int, minx: float, maxx: float,
                         miny: float, maxy: float, atlas_params,
                         specs: AtlasSpecs,
                         add_text_pattern: bool = False
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Discretize the neural atlas over [minx,maxx]x[miny,maxy] into an
    (R, R, 3) image in [0,1] (evaluate.py:87-126).  Returns
    (marked_texture, original_texture); the marked one carries the
    reference's text pattern for visualizing the mapping."""
    xs = jnp.linspace(minx, maxx, resolution)
    ys = jnp.linspace(miny, maxy, resolution)
    gx, gy = jnp.meshgrid(xs, ys)                  # row i = y value ys[i]
    uv = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    rgb = imlp_apply(atlas_params, uv, specs.atlas)
    # writable contiguous copy: np.asarray of a jax array is read-only and
    # cv2.putText rejects it
    tex = np.array(0.5 * (rgb + 1.0), dtype=np.float32).reshape(
        resolution, resolution, 3).copy()
    orig = tex.copy()

    if add_text_pattern:
        import colorsys

        import cv2

        # modern OpenCV only draws on uint8
        canvas = (tex * 255.0).astype(np.uint8)
        for base in (0, 500):
            for ii in range(40, 500, 80):
                color = tuple(255.0 * c for c in
                              colorsys.hsv_to_rgb((ii - 40) / 500, 1.0, 1.0))
                cv2.putText(canvas, "abcdefghijlmnopqrstuvwxyz1234567890!@#$%^&*()-+=>",
                            (10, ii + base), cv2.FONT_HERSHEY_SIMPLEX, 1.2,
                            color, 2, cv2.LINE_AA)
                cv2.putText(canvas, "ABCDEFGHIJKLMNOPQRSTUVWXYZ?~;:<./\\|][{},",
                            (10, ii + 40 + base), cv2.FONT_HERSHEY_SIMPLEX,
                            1.1, color, 2, cv2.LINE_AA)
        tex = canvas.astype(np.float32) / 255.0
    return tex, orig


def render_from_texture(texture: np.ndarray, minx: float, maxx: float,
                        miny: float, maxy: float, uv: np.ndarray
                        ) -> np.ndarray:
    """Sample the discretized texture at uv points (already shifted into the
    texture's quadrant): uv -> texture pixel coords -> bilinear
    (evaluate.py:63-83).  uv: (..., 2); returns (..., 3)."""
    resolution = texture.shape[0]
    pixel_size = resolution / (maxx - minx)
    px = (uv[..., 0] - minx) * pixel_size
    py = (uv[..., 1] - miny) * pixel_size
    coords = jnp.stack([jnp.asarray(px), jnp.asarray(py)], axis=-1)
    return np.asarray(bilinear_sample(jnp.asarray(texture, jnp.float32),
                                      coords))


def export_atlas_artifacts(params: Params, specs: AtlasSpecs,
                           data: VideoData, results_folder: str | Path,
                           resolution: int = 1000,
                           texture_render_check: bool = True) -> Dict:
    """Write the dual-atlas artifact set: fg/bg texture PNGs (marked +
    original), per-frame alpha maps, and a texture-space reconstruction
    sanity value.  Requires specs.dual."""
    from ..io.media import write_image

    assert specs.dual, "texture export needs the dual-atlas models"
    results_folder = Path(results_folder)
    results_folder.mkdir(parents=True, exist_ok=True)
    T, (H, W) = data.num_frames, data.res
    L = data.larger_dim

    # fg area from mask, bg area from inverted alpha over the whole frame
    fg_box = get_mapping_area(params, specs, data.mask, L, T, uv_shift=0.5)
    bg_box = get_mapping_area(params, specs, jnp.ones_like(data.mask), L, T,
                              uv_shift=-0.5, use_mapping2=True,
                              invert_alpha=True)

    out: Dict = {"fg_box": fg_box, "bg_box": bg_box}
    for name, box, quadrant in (("texture1", fg_box, 0.5),
                                ("texture2", bg_box, -0.5)):
        maxx, minx, maxy, miny, _ = box
        marked, orig = get_high_res_texture(resolution, minx, maxx, miny,
                                            maxy, params["atlas"], specs,
                                            add_text_pattern=True)
        write_image(marked, results_folder / f"{name}_marked.png")
        write_image(orig, results_folder / f"{name}.png")
        out[name] = orig

    # alpha maps per frame
    alpha_dir = results_folder / "alpha"
    for f in range(T):
        rf = render_frame(params, specs, f, H, W, T)
        a = np.asarray(rf["alpha"])[..., 0]
        write_image(np.stack([a] * 3, axis=-1), alpha_dir / f"{f:05d}.png")

    if texture_render_check:
        # texture-space render of frame 0 (the editable-texture path)
        rf0 = render_frame(params, specs, 0, H, W, T)
        uv1 = np.asarray(rf0["uv1"]) * 0.5 + 0.5
        maxx, minx, maxy, miny, _ = fg_box
        tex_rgb = render_from_texture(out["texture1"], minx, maxx, miny,
                                      maxy, uv1)
        out["texture_render_psnr_proxy"] = float(
            np.mean((tex_rgb - np.asarray(rf0["rgb"])) ** 2))
    return out
