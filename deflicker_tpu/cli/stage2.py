"""Stage-2-only CLI — the `src/neural_filter_and_refinement.py` equivalent.

    python -m deflicker_tpu.cli.stage2 --video_name X [--fps 10]
        [--ckpt_filter ...] [--ckpt_local ...]

Reads `data/test/<vid>` + `results/<vid>/stage_1/output`, writes
`results/<vid>/{neural_filter/{concat,output},final/output}` + mp4s.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="stage 2: filter + refinement")
    # reference flags (neural_filter_and_refinement.py:19-24)
    p.add_argument("--ckpt_filter",
                   default="./pretrained_weights/neural_filter.pth", type=str)
    p.add_argument("--ckpt_local",
                   default="./pretrained_weights/local_refinement_net.pth",
                   type=str)
    p.add_argument("--fps", default=10, type=int)
    p.add_argument("--video_name", default=None, type=str, required=True)
    p.add_argument("--gpu", type=int, default=0, help="CLI parity; unused")
    # extensions
    p.add_argument("--root", type=str, default="data/test/")
    p.add_argument("--results_root", type=str, default="results")
    return p


def main(argv=None) -> int:
    from ..config import PipelineConfig
    from .pipeline import run_stage2

    args = build_parser().parse_args(argv)
    cfg = PipelineConfig(fps=args.fps, ckpt_filter=args.ckpt_filter,
                         ckpt_local=args.ckpt_local, root=args.root,
                         results_root=args.results_root)
    out = run_stage2(Path(args.root) / args.video_name, cfg)
    print(f"stage 2 done -> {out['final_dir']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
