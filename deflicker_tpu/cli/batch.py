"""Batch multi-video CLI (BASELINE.md benchmark config 5).

    python -m deflicker_tpu.cli.batch --videos a.mp4 b.mp4 ...
    python -m deflicker_tpu.cli.batch --video_dir path/to/mp4s [--parallel_fit]

Default mode runs videos through the full pipeline sequentially; multi-host
deployments fan videos out across hosts over DCN — one `run_pipeline` per
host, no cross-host communication needed (the workload is embarrassingly
parallel at video granularity).

`--parallel_fit` is the TPU-native throughput mode the reference cannot
express: same-shaped videos' atlas fits run SIMULTANEOUSLY via a vmapped,
video-axis-sharded fit (`atlas.multifit`) — one compiled program fits the
whole group, scaling over a mesh with zero collectives and batching the
MLP matmuls even on one chip.

Prints one JSON summary line per video plus an aggregate.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def run_batch_parallel(videos, args, atlas_cfg, mesh=None) -> dict:
    """Group-parallel pipeline: flow per video, then ONE vmapped fit per
    same-shape group, then render + stage 2 per video."""
    import jax

    from ..atlas import (build_specs, evaluate_and_save, load_video_data)
    from ..atlas.multifit import (fit_atlas_multi, group_by_shape,
                                  init_models_multi, pretrain_mapping_multi,
                                  stack_video_data)
    from ..config import PipelineConfig
    from ..io.media import list_frames, read_image
    from ..seg import get_mask_provider, preprocess_masks
    from .pipeline import (_stage1_resolution, make_flow_provider,
                           prepare_frames, run_pipeline)
    from ..flow import preprocess_optical_flow

    dual = args.class_name is not None
    results_root = Path(args.results_root)

    def pipe_cfg(v):
        return PipelineConfig(
            video_name=v, fps=args.fps, class_name=args.class_name,
            down=args.down, root=args.root, results_root=args.results_root,
            ckpt_raft=args.ckpt_raft, ckpt_filter=args.ckpt_filter,
            ckpt_local=args.ckpt_local,
            mask_provider=getattr(args, "mask_provider", None),
            stage2_dtype=getattr(args, "stage2_precision", "bfloat16"),
            stage2_unpad=getattr(args, "stage2_unpad", "crop"))

    t0 = time.time()
    # host/RAFT preprocessing stays per video (batched internally)
    frames_dirs, datas, long_videos = [], [], []
    flow_provider = None
    for v in videos:
        cfg = pipe_cfg(v)
        fd = prepare_frames(cfg)
        if len(list_frames(fd)) > atlas_cfg.maximum_number_of_frames:
            # past the atlas cap: the full pipeline's auto-chunked path
            # handles it (its chunks are themselves a parallel multifit
            # group); grouping it with short clips here would silently
            # truncate stage 1 and break stage 2's frame-count contract
            long_videos.append(v)
            continue
        if flow_provider is None:
            flow_provider = make_flow_provider(cfg, mesh=mesh)
        preprocess_optical_flow(fd, flow_provider,
                                max_long_edge=cfg.max_long_edge)
        if dual:
            preprocess_masks(fd, get_mask_provider(
                args.class_name, getattr(args, "mask_provider", None)))
        resy, resx = _stage1_resolution(fd, args.down, dual)
        frames_dirs.append(fd)
        datas.append(load_video_data(fd, resy, resx,
                                     atlas_cfg.maximum_number_of_frames,
                                     use_masks=dual))

    specs = build_specs(atlas_cfg, dual=dual)
    psnrs = [0.0] * len(datas)
    for g, (shape, idxs) in enumerate(group_by_shape(datas).items()):
        V = len(idxs)
        T, H, W = shape
        data_v = stack_video_data([datas[i] for i in idxs])
        key = jax.random.fold_in(jax.random.key(atlas_cfg.seed), g)
        k_init, k_pre1, k_pre2, k_fit = jax.random.split(key, 4)
        params_v = init_models_multi(k_init, specs, V)
        if atlas_cfg.pretrain_mapping1:
            params_v["mapping1"] = pretrain_mapping_multi(
                params_v["mapping1"], specs.mapping1, k_pre1, V, T, H, W,
                atlas_cfg.uv_mapping_scale, atlas_cfg.pretrain_iter_number)
        if dual and atlas_cfg.pretrain_mapping2:
            params_v["mapping2"] = pretrain_mapping_multi(
                params_v["mapping2"], specs.mapping2, k_pre2, V, T, H, W,
                atlas_cfg.uv_mapping_scale, atlas_cfg.pretrain_iter_number)
        results = fit_atlas_multi(params_v, specs, data_v, atlas_cfg,
                                  k_fit, mesh=mesh)
        for v, i in enumerate(idxs):
            folder = results_root / frames_dirs[i].name / "stage_1"
            folder.mkdir(parents=True, exist_ok=True)
            with open(folder / "config.json", "w") as f:
                json.dump(atlas_cfg.to_reference_json(), f, indent=4)
            _, psnrs[i] = evaluate_and_save(
                results[v].params, specs, datas[i], atlas_cfg, folder,
                results[v].iteration - 1, results[v].opt_state)
            if dual:
                # editable-atlas artifact set — same contract as the
                # sequential (pipeline.py run_stage1) and chunked paths
                from ..atlas.texture import export_atlas_artifacts

                export_atlas_artifacts(results[v].params, specs, datas[i],
                                       folder / "texture")

    # stage 2: group by full resolution; the refinement recurrence advances
    # each group's videos in lockstep (FilterEngine.run_multi)
    from ..filter import load_filter_engine

    import jax.numpy as jnp

    engine = load_filter_engine(
        args.ckpt_filter, args.ckpt_local, mesh=mesh,
        dtype=jnp.dtype(getattr(args, "stage2_precision", "bfloat16")),
        unpad=getattr(args, "stage2_unpad", "crop"))
    res_groups = {}
    for i, fd in enumerate(frames_dirs):
        hw = read_image(list_frames(fd)[0]).shape[:2]
        res_groups.setdefault(hw, []).append(i)
    for idxs in res_groups.values():
        engine.run_multi(
            [(frames_dirs[i],
              results_root / frames_dirs[i].name / "stage_1" / "output",
              results_root / frames_dirs[i].name) for i in idxs],
            fps=args.fps, return_output=False)

    total_frames = 0
    for i in range(len(frames_dirs)):
        total_frames += datas[i].num_frames
        print(json.dumps({"video": frames_dirs[i].name,
                          "frames": datas[i].num_frames,
                          "psnr": round(psnrs[i], 2)}))

    # videos past the atlas cap: full pipeline (auto-chunked stage 1),
    # reusing the already-loaded RAFT weights and stage-2 engine
    for v in long_videos:
        if flow_provider is None:       # every video was long
            flow_provider = make_flow_provider(pipe_cfg(v), mesh=mesh)
        out = run_pipeline(pipe_cfg(v), atlas_cfg, mesh=mesh,
                           flow_provider=flow_provider, filter_engine=engine)
        total_frames += out["num_frames"]
        print(json.dumps({"video": Path(v).stem,
                          "frames": out["num_frames"],
                          "psnr": round(out["psnr"], 2),
                          "chunks": out.get("chunks")}))

    dt = time.time() - t0
    summary = {"videos": len(videos), "frames": total_frames,
               "t_total": round(dt, 1), "parallel_fit": True,
               "frames_per_sec": round(total_frames / dt, 3)}
    print(json.dumps(summary))
    return summary


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="batch multi-video deflickering")
    p.add_argument("--videos", nargs="*", default=None, type=str)
    p.add_argument("--video_dir", default=None, type=str,
                   help="process every .mp4/.avi/.mov in this directory")
    p.add_argument("--fps", default=10, type=int)
    p.add_argument("--class_name", default=None, type=str)
    p.add_argument("--mask_provider", default=None, type=str,
                   choices=["carvekit", "maskrcnn", "grabcut"],
                   help="override the seg backend (default: reference "
                        "semantics — portrait->carvekit, else Mask-RCNN)")
    p.add_argument("--down", default=None, type=int)
    p.add_argument("--iters", default=None, type=int)
    p.add_argument("--root", default="data/test/", type=str)
    p.add_argument("--results_root", default="results", type=str)
    p.add_argument("--config", default="config_flow_100.json", type=str)
    p.add_argument("--ckpt_raft",
                   default="./pretrained_weights/raft-things.pth", type=str)
    p.add_argument("--ckpt_filter",
                   default="./pretrained_weights/neural_filter.pth", type=str)
    p.add_argument("--ckpt_local",
                   default="./pretrained_weights/local_refinement_net.pth",
                   type=str)
    p.add_argument("--parallel_fit", action="store_true",
                   help="fit same-shaped videos simultaneously (vmapped, "
                        "video-axis-sharded over the mesh)")
    p.add_argument("--stage2_precision", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--stage2_unpad", choices=["crop", "resize"],
                   default="crop",
                   help="map padded stage-2 outputs back to frame size: "
                        "exact crop (default) or the reference's "
                        "unpad-by-resize quirk (byte parity)")
    p.add_argument("--dcn", action="store_true",
                   help="multi-host fan-out: initialize jax.distributed "
                        "(JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID env or TPU-pod auto-detection) and "
                        "process this host's round-robin share of the "
                        "video list (parallel/multihost.py)")
    p.add_argument("--coordinator", default=None, type=str,
                   help="jax.distributed coordinator address (with --dcn)")
    p.add_argument("--num_processes", default=None, type=int)
    p.add_argument("--process_id", default=None, type=int)
    args = p.parse_args(argv)

    videos = list(args.videos or [])
    if args.video_dir:
        for ext in ("*.mp4", "*.avi", "*.mov"):
            videos += [str(v) for v in sorted(Path(args.video_dir).glob(ext))]
    if not videos:
        p.error("no videos given (use --videos or --video_dir)")

    if args.dcn:
        from ..parallel import assign_videos, init_distributed

        pid, nproc = init_distributed(args.coordinator, args.num_processes,
                                      args.process_id)
        videos = assign_videos(videos, pid, nproc)
        print(json.dumps({"process": pid, "processes": nproc,
                          "videos_assigned": len(videos)}))
        if not videos:
            return 0

    import dataclasses

    from ..config import AtlasConfig, PipelineConfig, load_atlas_config
    from .pipeline import run_pipeline

    cfg_path = Path(args.config)
    atlas_cfg = (load_atlas_config(cfg_path) if cfg_path.exists()
                 else AtlasConfig())
    if args.iters is not None:
        atlas_cfg = dataclasses.replace(
            atlas_cfg, iters_num=args.iters,
            evaluate_every=max(1, args.iters - 1))

    import jax

    mesh = None
    if args.dcn:
        # within-video parallelism must stay on local ICI — the video axis
        # is already split across hosts, so no program may span DCN
        from ..parallel import local_mesh

        mesh = local_mesh()
    elif len(jax.devices()) > 1:
        from ..parallel import make_mesh

        mesh = make_mesh()

    if args.parallel_fit:
        run_batch_parallel(videos, args, atlas_cfg, mesh=mesh)
        return 0

    t0 = time.time()
    total_frames = 0
    for v in videos:
        cfg = PipelineConfig(
            video_name=v, fps=args.fps, class_name=args.class_name,
            down=args.down, root=args.root, results_root=args.results_root,
            ckpt_raft=args.ckpt_raft, ckpt_filter=args.ckpt_filter,
            ckpt_local=args.ckpt_local,
            stage2_dtype=args.stage2_precision,
            stage2_unpad=args.stage2_unpad)
        out = run_pipeline(cfg, atlas_cfg, mesh=mesh)
        total_frames += out["num_frames"]
        print(json.dumps({"video": Path(v).stem,
                          "frames": out["num_frames"],
                          "t_total": round(out["t_total"], 1),
                          "psnr": round(out["psnr"], 2)}))
    dt = time.time() - t0
    print(json.dumps({"videos": len(videos), "frames": total_frames,
                      "t_total": round(dt, 1),
                      "frames_per_sec": round(total_frames / dt, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
