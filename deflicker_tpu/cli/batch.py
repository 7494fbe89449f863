"""Batch multi-video CLI (BASELINE.md benchmark config 5).

    python -m deflicker_tpu.cli.batch --videos a.mp4 b.mp4 ...
    python -m deflicker_tpu.cli.batch --video_dir path/to/mp4s [--jobs 1]

Videos run through the full pipeline sequentially on this host (each video
already saturates the chip via the batch/frame sharding in `parallel/`);
multi-host deployments fan videos out across hosts over DCN — one
`run_pipeline` per host, same code path, no cross-host communication needed
(the workload is embarrassingly parallel at video granularity).

Prints one JSON summary line per video plus an aggregate.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="batch multi-video deflickering")
    p.add_argument("--videos", nargs="*", default=None, type=str)
    p.add_argument("--video_dir", default=None, type=str,
                   help="process every .mp4/.avi/.mov in this directory")
    p.add_argument("--fps", default=10, type=int)
    p.add_argument("--class_name", default=None, type=str)
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
    args = p.parse_args(argv)

    videos = list(args.videos or [])
    if args.video_dir:
        for ext in ("*.mp4", "*.avi", "*.mov"):
            videos += [str(v) for v in sorted(Path(args.video_dir).glob(ext))]
    if not videos:
        p.error("no videos given (use --videos or --video_dir)")

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

    t0 = time.time()
    total_frames = 0
    for v in videos:
        cfg = PipelineConfig(
            video_name=v, fps=args.fps, class_name=args.class_name,
            down=args.down, root=args.root, results_root=args.results_root,
            ckpt_raft=args.ckpt_raft, ckpt_filter=args.ckpt_filter,
            ckpt_local=args.ckpt_local)
        out = run_pipeline(cfg, atlas_cfg)
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
