"""End-to-end pipeline: decode -> flow -> (masks) -> atlas fit -> filter.

In-process replacement for the reference's subprocess chain
(test.py -> os.system(stage1) -> subprocess(flow) -> os.system(stage2)):
stages call each other as functions, but every stage still reads/writes the
SAME filesystem artifacts (SURVEY.md §1 contract), so each remains
independently runnable, idempotent and resumable.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..atlas import (build_specs, evaluate_and_save, fit_atlas, init_models,
                     load_video_data, pretrain_mapping)
from ..config import AtlasConfig, PipelineConfig, load_atlas_config
from ..flow import FarnebackFlow, RAFTFlow, preprocess_optical_flow
from ..io.media import list_frames, video_to_frames
from ..utils.checkpoint import load_checkpoint
from ..utils.logging import ScalarLogger


def prepare_frames(cfg: PipelineConfig) -> Path:
    """Stage 0: decode the video (or adopt a frame folder) into
    `<root>/<vid>/%05d.png` (reference: test.py:17-29)."""
    root = Path(cfg.root)
    root.mkdir(parents=True, exist_ok=True)
    if cfg.video_name:
        vid = Path(cfg.video_name).stem
        frames_dir = root / vid
        if not list_frames(frames_dir):
            video_to_frames(cfg.video_name, frames_dir, fps=cfg.fps)
    elif cfg.video_frame_folder:
        src = Path(cfg.video_frame_folder)
        vid = src.name
        frames_dir = root / vid
        if not list_frames(frames_dir) and src.resolve() != frames_dir.resolve():
            shutil.copytree(src, frames_dir)
    else:
        raise ValueError("need --video_name or --video_frame_folder")
    if not list_frames(frames_dir):
        raise FileNotFoundError(f"no frames in {frames_dir}")
    return frames_dir


def make_flow_provider(cfg: PipelineConfig, mesh=None):
    ckpt = Path(cfg.ckpt_raft)
    for candidate in (ckpt, ckpt.with_suffix(".pth")):
        if candidate.exists():
            return RAFTFlow(candidate, mesh=mesh)
    print(f"[deflicker_tpu] RAFT checkpoint {ckpt} not found — "
          "falling back to Farneback flow (reduced quality)")
    return FarnebackFlow()


def run_stage1(frames_dir: Path, cfg: PipelineConfig,
               atlas_cfg: AtlasConfig, dual: bool,
               mesh=None, results_root: Optional[Path] = None) -> Dict:
    """Flow preprocessing + atlas fit + render; mirrors
    src/stage1_neural_atlas[_seg].py main()."""
    t0 = time.time()
    preprocess_optical_flow(frames_dir, make_flow_provider(cfg, mesh=mesh),
                            max_long_edge=cfg.max_long_edge)
    t_flow = time.time() - t0

    vid = frames_dir.name
    results_root = Path(results_root or cfg.results_root)
    results_folder = results_root / vid / "stage_1"
    results_folder.mkdir(parents=True, exist_ok=True)
    with open(results_folder / "config.json", "w") as f:
        json.dump(atlas_cfg.to_reference_json(), f, indent=4)

    # working resolution = first frame / down (config resx/resy ignored,
    # exactly like the reference — stage1_neural_atlas.py:31-38)
    from ..io.media import read_image

    first = read_image(list_frames(frames_dir)[0])
    resy, resx = first.shape[0], first.shape[1]
    down = cfg.down if cfg.down is not None else (1 if dual else 4)
    if down:
        resx, resy = int(resx / down), int(resy / down)

    data = load_video_data(frames_dir, resy, resx,
                           atlas_cfg.maximum_number_of_frames,
                           use_masks=dual)
    T, (H, W) = data.num_frames, data.res

    # diagnostic masked-flow / input videos (reference: save_mask_flow call
    # at stage1_neural_atlas.py:110)
    from ..atlas.render import save_mask_flow_videos

    save_mask_flow_videos(data, results_folder)

    specs = build_specs(atlas_cfg, dual=dual)
    key = jax.random.key(atlas_cfg.seed)
    k_init, k_pre1, k_pre2, k_fit = jax.random.split(key, 4)

    start_iteration = 0
    opt_state = None
    t_pretrain = 0.0          # stays 0 on the resume branch (no pretrain)
    if atlas_cfg.load_checkpoint and atlas_cfg.checkpoint_path:
        ckpt = load_checkpoint(atlas_cfg.checkpoint_path)
        params = ckpt["params"]
        opt_state = ckpt.get("opt_state")
        start_iteration = int(ckpt["iteration"])
    else:
        params = init_models(k_init, specs)
        t1 = time.time()
        if atlas_cfg.pretrain_mapping1:
            params["mapping1"] = pretrain_mapping(
                params["mapping1"], specs.mapping1, k_pre1, T, H, W,
                atlas_cfg.uv_mapping_scale, atlas_cfg.pretrain_iter_number)
        if dual and atlas_cfg.pretrain_mapping2:
            params["mapping2"] = pretrain_mapping(
                params["mapping2"], specs.mapping2, k_pre2, T, H, W,
                atlas_cfg.uv_mapping_scale, atlas_cfg.pretrain_iter_number)
        t_pretrain = time.time() - t1

    logger = ScalarLogger(results_folder)

    def eval_cb(iteration, p, opt):
        evaluate_and_save(p, specs, data, atlas_cfg, results_folder,
                          iteration, opt)

    # optional profiler trace of the fit (DEFLICKER_PROFILE=<dir>)
    import contextlib
    import os

    prof_dir = os.environ.get("DEFLICKER_PROFILE")
    prof_ctx = (jax.profiler.trace(prof_dir) if prof_dir
                else contextlib.nullcontext())

    t2 = time.time()
    with prof_ctx:
        result = fit_atlas(params, specs, data, atlas_cfg, k_fit,
                           start_iteration=start_iteration,
                           opt_state=opt_state, eval_callback=eval_cb,
                           log_callback=lambda i, rec: logger.log(i, rec),
                           mesh=mesh)
    t_fit = time.time() - t2

    # final render (the reference's eval at iteration iters_num-1 == 10000)
    t3 = time.time()
    rendered, mean_psnr = evaluate_and_save(
        result.params, specs, data, atlas_cfg, results_folder,
        result.iteration - 1, result.opt_state)
    if dual:
        # fg/bg texture PNGs + alpha maps (the dual evaluator's artifact
        # set, reference: evaluate.py:203-602)
        from ..atlas.texture import export_atlas_artifacts

        export_atlas_artifacts(result.params, specs, data,
                               results_folder / "texture")
    t_render = time.time() - t3
    # TensorBoard images like the reference evaluator (evaluate.py:784-793)
    logger.log_image(result.iteration - 1, "reconstruction", rendered[0])
    logger.log_image(result.iteration - 1, "input", np.asarray(data.video[0]))
    logger.close()

    iters_done = result.iteration - start_iteration
    return {
        "results_folder": results_folder,
        "psnr": mean_psnr,
        "num_frames": T,
        "res": (H, W),
        "t_flow": t_flow,
        "t_pretrain": t_pretrain,
        "t_fit": t_fit,
        "t_render": t_render,
        "iters_per_sec": iters_done / t_fit if t_fit > 0 else 0.0,
    }


def run_stage2(frames_dir: Path, cfg: PipelineConfig,
               results_root: Optional[Path] = None,
               style_dir: Optional[Path] = None, mesh=None) -> Dict:
    """Neural filter + local refinement; mirrors
    src/neural_filter_and_refinement.py."""
    from ..filter import load_filter_engine

    vid = frames_dir.name
    results_root = Path(results_root or cfg.results_root)
    style_dir = style_dir or results_root / vid / "stage_1" / "output"
    t0 = time.time()
    engine = load_filter_engine(cfg.ckpt_filter, cfg.ckpt_local, mesh=mesh)
    engine.run(frames_dir, style_dir, results_root / vid, fps=cfg.fps)
    return {"t_stage2": time.time() - t0,
            "final_dir": results_root / vid / "final" / "output"}


def run_pipeline(cfg: PipelineConfig,
                 atlas_cfg: Optional[AtlasConfig] = None,
                 mesh=None) -> Dict:
    """The full test.py-equivalent pipeline.  Returns a metrics dict."""
    if atlas_cfg is None:
        cfg_path = Path(cfg.config)
        atlas_cfg = (load_atlas_config(cfg_path) if cfg_path.exists()
                     else AtlasConfig())

    t_start = time.time()
    frames_dir = prepare_frames(cfg)
    dual = cfg.class_name is not None
    if dual:
        from ..seg import get_mask_provider, preprocess_masks

        provider = get_mask_provider(cfg.class_name, cfg.mask_provider)
        preprocess_masks(frames_dir, provider)

    s1 = run_stage1(frames_dir, cfg, atlas_cfg, dual, mesh=mesh)
    s2 = run_stage2(frames_dir, cfg, mesh=mesh)

    total = time.time() - t_start
    out = {**s1, **s2, "t_total": total,
           "frames_per_sec": s1["num_frames"] / total}

    # final-output temporal-consistency metrics (E_warp needs the cached
    # flow; skip silently if unavailable)
    try:
        from .evaluate import compute_video_metrics

        m = compute_video_metrics(frames_dir, s2["final_dir"])
        out["final_psnr"] = m["psnr_mean"]
        if "ewarp_mean" in m:
            out["final_ewarp"] = m["ewarp_mean"]
            m_in = compute_video_metrics(frames_dir, frames_dir)
            out["input_ewarp"] = m_in.get("ewarp_mean")
    except Exception as e:                     # metrics must never kill a run
        print(f"[deflicker_tpu] final metrics skipped: {e}")

    ew = (f", E_warp {out['input_ewarp']*100:.3f} -> "
          f"{out['final_ewarp']*100:.3f} (x100)"
          if out.get("final_ewarp") is not None else "")
    print(f"[deflicker_tpu] {frames_dir.name}: {s1['num_frames']} frames in "
          f"{total:.1f}s ({out['frames_per_sec']:.2f} fps end-to-end), "
          f"stage-1 PSNR {s1['psnr']:.2f} dB, "
          f"fit {s1['iters_per_sec']:.1f} it/s{ew}")
    return out
