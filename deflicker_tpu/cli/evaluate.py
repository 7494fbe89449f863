"""Evaluation CLI: PSNR + E_warp (the paper's temporal-consistency metric)
for a processed video.

    python -m deflicker_tpu.cli.evaluate --video_name X
        [--target final] [--root data/test/] [--results_root results]

E_warp follows the reference's (dead-code) recipe — occlusion-masked mean
squared warp error between consecutive frames using cached RAFT flow
(src/models/utils.py:532-572; see deflicker_tpu.metrics.ewarp).  PSNR is
measured between the processed frames and the originals.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def compute_video_metrics(frames_dir: Path, processed_dir: Path,
                          flow_dir: Path | None = None) -> dict:
    from ..io.media import list_frames, read_image
    from ..metrics import psnr

    orig_files = list_frames(frames_dir)
    proc_files = list_frames(processed_dir)
    assert len(orig_files) > 0, f"no frames in {frames_dir}"
    T = min(len(orig_files), len(proc_files))
    flow_dir = flow_dir or frames_dir.parent / f"{frames_dir.name}_flow"

    import cv2

    from ..metrics.ewarp import warp_error_video

    # warp error runs in fixed-size batched device calls: per-pair
    # dispatches each pay a host<->device round trip (158 for an 80-frame
    # video), while one whole-video stack is O(T*H*W) host+device memory
    # (>10 GB for a 200-frame 1080p clip).  Chunking keeps memory O(CHUNK)
    # and, with a repeated-pair pad on the tail, ONE compiled shape.
    CHUNK = 16
    psnrs, ewarps = [], []
    f1s, f2s, fws, bws = [], [], [], []

    def flush():
        if not f1s:
            return
        n = len(f1s)
        while len(f1s) < CHUNK:        # pad tail with the last pair
            f1s.append(f1s[-1]); f2s.append(f2s[-1])
            fws.append(fws[-1]); bws.append(bws[-1])
        vals = warp_error_video(np.stack(f1s), np.stack(f2s),
                                np.stack(fws), np.stack(bws))
        ewarps.extend(vals[:n])
        f1s.clear(); f2s.clear(); fws.clear(); bws.clear()

    prev = None
    for t in range(T):
        orig = read_image(orig_files[t])
        proc = read_image(proc_files[t])
        if proc.shape != orig.shape:
            proc = cv2.resize(proc, (orig.shape[1], orig.shape[0]),
                              interpolation=cv2.INTER_LINEAR)
        psnrs.append(psnr(orig, proc))
        if prev is not None:
            fn1, fn2 = orig_files[t - 1].name, orig_files[t].name
            p12 = flow_dir / f"{fn1}_{fn2}.npy"
            p21 = flow_dir / f"{fn2}_{fn1}.npy"
            if p12.exists() and p21.exists():
                f12, f21 = np.load(p12), np.load(p21)
                if f12.shape[:2] != prev.shape[:2]:
                    from ..ops.consistency import resize_flow

                    f12 = resize_flow(f12, prev.shape[0], prev.shape[1])
                    f21 = resize_flow(f21, prev.shape[0], prev.shape[1])
                f1s.append(prev); f2s.append(proc)
                fws.append(f12); bws.append(f21)
                if len(f1s) == CHUNK:
                    flush()
        prev = proc
    flush()
    out = {"psnr_mean": float(np.mean(psnrs)), "num_frames": T}
    if len(ewarps):
        out["ewarp_mean"] = float(np.mean(ewarps))
        out["ewarp_x100"] = float(np.mean(ewarps) * 100.0)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="PSNR + E_warp evaluation")
    p.add_argument("--video_name", required=True, type=str)
    p.add_argument("--root", default="data/test/", type=str)
    p.add_argument("--results_root", default="results", type=str)
    p.add_argument("--target", default="final",
                   choices=["final", "stage_1", "neural_filter", "input"],
                   help="which output to evaluate (input = the original)")
    args = p.parse_args(argv)

    frames_dir = Path(args.root) / args.video_name
    if args.target == "input":
        processed = frames_dir
    elif args.target == "stage_1":
        processed = Path(args.results_root) / args.video_name / "stage_1" / "output"
    elif args.target == "neural_filter":
        processed = (Path(args.results_root) / args.video_name
                     / "neural_filter" / "output")
    else:
        processed = Path(args.results_root) / args.video_name / "final" / "output"

    out = compute_video_metrics(frames_dir, processed)
    out["target"] = args.target
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
