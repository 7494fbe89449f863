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


def _stage1_resolution(frames_dir: Path, down: Optional[int],
                       dual: bool) -> tuple:
    """Stage-1 working resolution = first frame / down; config resx/resy
    are IGNORED exactly like the reference (stage1_neural_atlas.py:31-38).
    down=None means the reference scripts' defaults: 1 (seg) / 4 (single)."""
    from ..io.media import read_image

    first = read_image(list_frames(frames_dir)[0])
    resy, resx = first.shape[0], first.shape[1]
    down = down if down is not None else (1 if dual else 4)
    if down:
        resx, resy = int(resx / down), int(resy / down)
    return resy, resx


def _chunk_starts(T_all: int, cap: int):
    """Equal-size chunk starts covering [0, T_all); the last chunk is
    anchored backward (overlapping its predecessor) so every chunk has the
    SAME length — one XLA shape, one vmapped fit for the whole group."""
    n = -(-T_all // cap)
    size = -(-T_all // n)
    starts = [min(k * size, T_all - size) for k in range(n)]
    return size, starts


def _run_stage1_chunked(frames_dir: Path, atlas_cfg: AtlasConfig,
                        dual: bool, resy: int, resx: int,
                        results_folder: Path, mesh=None) -> Dict:
    """Long-video stage 1: T > maximum_number_of_frames.

    The reference silently truncates at the cap and its README tells users
    to split long videos by hand (README.md:117) — which also resets
    stage-2 temporal consistency at every split.  Here the video is split
    into equal same-shaped chunks, ALL chunks fit SIMULTANEOUSLY as one
    vmapped multi-video group (atlas/multifit.py — on a mesh each chunk
    can own a device), every frame is rendered with continuous numbering,
    and stage 2 later runs its refinement recurrence unbroken across the
    whole sequence.  Chunk edges use video-edge flow semantics (zero
    flow/consistency at the boundary frame), exactly what a manual split
    would produce.

    Checkpoint/resume: the stacked carry (params_v, opt_state_v, RNG keys)
    is checkpointed at the eval cadence and at fit end; with
    `load_checkpoint` set (same JSON flags as the single-fit path,
    config_flow_100.json:37-38) a matching checkpoint resumes the group
    fit with the exact state and sample stream of the uninterrupted run
    (equal up to XLA recompile float noise — see fit_atlas_multi).
    """
    import time as _time

    from ..atlas.multifit import (fit_atlas_multi, init_models_multi,
                                  pretrain_mapping_multi, stack_video_data)
    from ..utils.checkpoint import save_checkpoint

    files = list_frames(frames_dir)
    T_all = len(files)
    cap = atlas_cfg.maximum_number_of_frames
    size, starts = _chunk_starts(T_all, cap)
    n = len(starts)
    print(f"[deflicker_tpu] {frames_dir.name}: {T_all} frames > cap {cap} "
          f"-> {n} chunks of {size}, fit as one parallel group")

    datas = [load_video_data(frames_dir, resy, resx, size, use_masks=dual,
                             start_frame=s) for s in starts]
    # masked-flow / input diagnostic videos, one set per chunk (the single
    # -fit path writes them at the stage_1 root; see save_mask_flow_videos)
    from ..atlas.render import save_mask_flow_videos

    for k, d in enumerate(datas):
        save_mask_flow_videos(d, results_folder / f"chunk_{k:02d}")
    data_v = stack_video_data(datas)
    specs = build_specs(atlas_cfg, dual=dual)
    key = jax.random.key(atlas_cfg.seed)
    k_init, k_pre1, k_pre2, k_fit = jax.random.split(key, 4)

    ckpt_file = results_folder / "checkpoint"

    def save_group_ckpt(iteration, carry):
        import jax.random as jrandom

        p_v, o_v, keys_v = carry
        save_checkpoint(ckpt_file, {
            "params_v": p_v, "opt_state_v": o_v,
            "key_data": np.array(jrandom.key_data(keys_v), copy=True),
            "iteration": int(iteration),
            "chunk_starts": starts, "chunk_size": size, "dual": dual})

    resume = None
    if atlas_cfg.load_checkpoint:
        path = Path(atlas_cfg.checkpoint_path or ckpt_file)
        if path.exists():
            c = load_checkpoint(path)
            if (list(c.get("chunk_starts", [])) == list(starts)
                    and c.get("chunk_size") == size and "opt_state_v" in c):
                resume = c
            else:
                print(f"[deflicker_tpu] checkpoint {path} does not match "
                      f"this chunking ({c.get('chunk_starts')} vs {starts})"
                      " — starting fresh")

    t1 = _time.time()
    if resume is not None:
        params_v = jax.tree_util.tree_map(jax.numpy.asarray,
                                          resume["params_v"])
        opt_state_v = resume["opt_state_v"]
        fit_keys = jax.random.wrap_key_data(
            jax.numpy.asarray(resume["key_data"]))
        start_iteration = int(resume["iteration"])
        print(f"[deflicker_tpu] resuming chunked fit at iteration "
              f"{start_iteration} from {ckpt_file}")
    else:
        start_iteration, opt_state_v, fit_keys = 0, None, None
        params_v = init_models_multi(k_init, specs, n)
        if atlas_cfg.pretrain_mapping1:
            params_v["mapping1"] = pretrain_mapping_multi(
                params_v["mapping1"], specs.mapping1, k_pre1, n, size, resy,
                resx, atlas_cfg.uv_mapping_scale,
                atlas_cfg.pretrain_iter_number)
        if dual and atlas_cfg.pretrain_mapping2:
            params_v["mapping2"] = pretrain_mapping_multi(
                params_v["mapping2"], specs.mapping2, k_pre2, n, size, resy,
                resx, atlas_cfg.uv_mapping_scale,
                atlas_cfg.pretrain_iter_number)
    t_pretrain = _time.time() - t1

    logger = ScalarLogger(results_folder)
    t2 = _time.time()
    results = fit_atlas_multi(
        params_v, specs, data_v, atlas_cfg, k_fit, mesh=mesh,
        start_iteration=start_iteration, opt_state_v=opt_state_v,
        keys=fit_keys, checkpoint_callback=save_group_ckpt,
        log_callback=lambda i, v, rec: logger.log(
            i, {f"chunk{v}/{k}": val for k, val in rec.items()}))
    t_fit = _time.time() - t2

    t3 = _time.time()
    psnrs, weights = [], []
    for k in range(n):
        prev_end = (starts[k - 1] + size) if k else 0
        first_saved = max(0, prev_end - starts[k])
        _, p = evaluate_and_save(
            results[k].params, specs, datas[k], atlas_cfg, results_folder,
            results[k].iteration - 1, results[k].opt_state,
            frame_offset=starts[k],
            first_saved_frame=first_saved,
            save_video=(k == n - 1), save_ckpt=False, psnr_marker=False)
        psnrs.append(p)
        weights.append(size - first_saved)   # frames this chunk contributed
        if dual:
            # per-chunk editable-atlas artifact set (each chunk owns its
            # own atlas; the single-fit path writes stage_1/texture)
            from ..atlas.texture import export_atlas_artifacts

            export_atlas_artifacts(results[k].params, specs, datas[k],
                                   results_folder / "texture"
                                   / f"chunk_{k:02d}")
    # saved-frame-weighted mean: the overlap-anchored last chunk saves fewer
    # frames than it fits, so a plain chunk mean would over-weight it
    mean_psnr = float(np.average(psnrs, weights=weights))
    (results_folder / f"PSNR_{mean_psnr:.2f}").touch()
    t_render = _time.time() - t3
    logger.close()

    iters = results[0].iteration - start_iteration
    return {"psnr": mean_psnr, "num_frames": T_all, "res": (resy, resx),
            "t_pretrain": t_pretrain, "t_fit": t_fit, "t_render": t_render,
            "iters_per_sec": n * iters / t_fit if t_fit > 0 else 0.0,
            "chunks": n}


def run_stage1(frames_dir: Path, cfg: PipelineConfig,
               atlas_cfg: AtlasConfig, dual: bool,
               mesh=None, results_root: Optional[Path] = None,
               flow_provider=None) -> Dict:
    """Flow preprocessing + atlas fit + render; mirrors
    src/stage1_neural_atlas[_seg].py main().  Videos longer than
    `maximum_number_of_frames` route to the auto-chunked parallel fit
    (_run_stage1_chunked) instead of the reference's silent truncation.

    `flow_provider` lets a warm caller (api.Deflickerer, cli.batch) reuse
    loaded RAFT weights across videos."""
    t0 = time.time()
    if flow_provider is None:
        flow_provider = make_flow_provider(cfg, mesh=mesh)
    preprocess_optical_flow(frames_dir, flow_provider,
                            max_long_edge=cfg.max_long_edge)
    t_flow = time.time() - t0

    vid = frames_dir.name
    results_root = Path(results_root or cfg.results_root)
    results_folder = results_root / vid / "stage_1"
    results_folder.mkdir(parents=True, exist_ok=True)
    with open(results_folder / "config.json", "w") as f:
        json.dump(atlas_cfg.to_reference_json(), f, indent=4)

    resy, resx = _stage1_resolution(frames_dir, cfg.down, dual)

    T_all = len(list_frames(frames_dir))
    if T_all > atlas_cfg.maximum_number_of_frames:
        out = _run_stage1_chunked(frames_dir, atlas_cfg, dual, resy, resx,
                                  results_folder, mesh=mesh)
        out.update(results_folder=results_folder, t_flow=t_flow)
        return out

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
               style_dir: Optional[Path] = None, mesh=None,
               engine=None) -> Dict:
    """Neural filter + local refinement; mirrors
    src/neural_filter_and_refinement.py.  `engine` lets a warm caller
    reuse loaded UNet/TransformNet weights across videos."""
    import jax.numpy as jnp

    from ..filter import load_filter_engine

    vid = frames_dir.name
    results_root = Path(results_root or cfg.results_root)
    style_dir = style_dir or results_root / vid / "stage_1" / "output"
    t0 = time.time()
    if engine is None:
        engine = load_filter_engine(cfg.ckpt_filter, cfg.ckpt_local,
                                    mesh=mesh,
                                    dtype=jnp.dtype(cfg.stage2_dtype),
                                    unpad=getattr(cfg, "stage2_unpad",
                                                  "crop"))
    engine.run(frames_dir, style_dir, results_root / vid, fps=cfg.fps,
               return_output=False)
    return {"t_stage2": time.time() - t0,
            "final_dir": results_root / vid / "final" / "output"}


def run_pipeline(cfg: PipelineConfig,
                 atlas_cfg: Optional[AtlasConfig] = None,
                 mesh=None, flow_provider=None,
                 filter_engine=None) -> Dict:
    """The full test.py-equivalent pipeline.  Returns a metrics dict.

    `flow_provider` / `filter_engine` let warm callers (api.Deflickerer)
    reuse loaded network weights across many videos in one process."""
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

    s1 = run_stage1(frames_dir, cfg, atlas_cfg, dual, mesh=mesh,
                    flow_provider=flow_provider)
    s2 = run_stage2(frames_dir, cfg, mesh=mesh, engine=filter_engine)

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
    if out.get("final_psnr") is not None:
        ew += f", final PSNR {out['final_psnr']:.2f} dB"
    print(f"[deflicker_tpu] {frames_dir.name}: {s1['num_frames']} frames in "
          f"{total:.1f}s ({out['frames_per_sec']:.2f} fps end-to-end), "
          f"stage-1 PSNR {s1['psnr']:.2f} dB, "
          f"fit {s1['iters_per_sec']:.1f} it/s{ew}")
    return out
