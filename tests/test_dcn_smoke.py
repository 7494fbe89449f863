"""Two-process DCN smoke on localhost (VERDICT round-3 item 8).

`parallel/multihost.py`'s jax.distributed wiring previously had only
single-process unit tests; this launches TWO real local CPU processes
running `cli.batch --dcn` against one coordinator, each taking its
round-robin share of two tiny videos, and asserts both complete with
disjoint outputs — exercising the coordinator handshake, process-grid
agreement and video assignment end to end.

Kept tiny (3 frames, 48x64, 12 iters, small MLPs): this box has one CPU
core, so the two processes timeshare it.
"""

import dataclasses
import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the child must force the CPU backend AFTER import (the machine's
# sitecustomize force-sets jax_platforms="axon,cpu" and ignores the env
# var — same dance as tests/conftest.py)
CHILD = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from deflicker_tpu.cli.batch import main
sys.exit(main(sys.argv[1:]))
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dcn_batch(tmp_path):
    import cv2

    from deflicker_tpu.config import AtlasConfig
    from deflicker_tpu.io.media import frames_to_video

    # two tiny flickery clips -> mp4 (cli.batch takes video files)
    rng = np.random.default_rng(0)
    videos = []
    for name in ("clip_a", "clip_b"):
        frames = tmp_path / (name + "_frames")
        frames.mkdir()
        base = rng.uniform(40, 215, (48, 64, 3)).astype(np.uint8)
        for t in range(3):
            f = np.clip(np.roll(base, t, axis=1).astype(np.float32)
                        * (1.0 + 0.1 * ((-1) ** t)), 0, 255)
            cv2.imwrite(str(frames / f"{t:05d}.png"), f.astype(np.uint8))
        mp4 = tmp_path / f"{name}.mp4"
        frames_to_video(frames, mp4, fps=10)
        videos.append(str(mp4))

    tiny = dataclasses.replace(
        AtlasConfig(), iters_num=12, samples_batch=128, steps_per_call=6,
        evaluate_every=11, pretrain_iter_number=2,
        number_of_channels_atlas=32, number_of_layers_atlas=4,
        number_of_channels_mapping1=32, number_of_layers_mapping1=3,
        stop_global_rigidity=6)
    cfg_json = tmp_path / "tiny_config.json"
    cfg_json.write_text(json.dumps({
        **tiny.to_reference_json(),
        "samples_batch": tiny.samples_batch,
        "steps_per_call": tiny.steps_per_call,
        "pretrain_iter_number": tiny.pretrain_iter_number}))

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid))
        argv = [sys.executable, "-c", CHILD, "--dcn",
                "--videos", *videos,
                "--iters", "12", "--down", "2", "--fps", "10",
                "--config", str(cfg_json),
                "--root", str(tmp_path / f"p{pid}" / "data"),
                "--results_root", str(tmp_path / f"p{pid}" / "results"),
                "--ckpt_raft", str(tmp_path / "missing.pth"),
                "--ckpt_filter", "none_missing.pth",
                "--ckpt_local", "none_missing.pth"]
        procs.append(subprocess.Popen(
            argv, cwd=REPO, env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        recs = [json.loads(ln) for ln in out.splitlines()
                if ln.startswith("{")]
        hello = next(r for r in recs if "videos_assigned" in r)
        assert hello == {"process": pid, "processes": 2,
                         "videos_assigned": 1}
        done = [r for r in recs if "psnr" in r and "video" in r]
        assert len(done) == 1 and done[0]["frames"] == 3

    # disjoint round-robin assignment: p0 -> clip_a, p1 -> clip_b —
    # each produced the full artifact set for ITS video only
    for pid, mine, other in ((0, "clip_a", "clip_b"),
                             (1, "clip_b", "clip_a")):
        res = tmp_path / f"p{pid}" / "results"
        assert len(list((res / mine / "final" / "output").glob("*.png"))) == 3
        assert not (res / other).exists()
