"""Warm serving daemon (cli.serve): job protocol + spool-dir loop.

Exercises the same warm path the BENCH_E2E `warm` measurement uses: one
Deflickerer, several videos, no per-video reload."""

import dataclasses
import io
import json

import numpy as np
import pytest


@pytest.fixture
def tiny_env(tmp_path):
    import cv2

    root = tmp_path / "data" / "test"
    dirs = []
    rng = np.random.default_rng(0)
    for name in ("vid_a", "vid_b"):
        frames = root / name
        frames.mkdir(parents=True)
        base = rng.uniform(40, 215, (48, 64, 3)).astype(np.uint8)
        for t in range(3):
            f = np.clip(np.roll(base, t, axis=1).astype(np.float32)
                        * (1.0 + 0.1 * ((-1) ** t)), 0, 255)
            cv2.imwrite(str(frames / f"{t:05d}.png"), f.astype(np.uint8))
        dirs.append(frames)
    return tmp_path, dirs


def make_deflickerer(tmp, tiny=True):
    from deflicker_tpu.api import Deflickerer
    from deflicker_tpu.config import AtlasConfig

    d = Deflickerer(ckpt_raft=str(tmp / "missing.pth"),
                    ckpt_filter=None, ckpt_local=None,
                    root=str(tmp / "data" / "test"),
                    results_root=str(tmp / "results"),
                    mesh=None)
    if tiny:
        d.atlas_cfg = dataclasses.replace(
            AtlasConfig(), iters_num=20, samples_batch=128,
            steps_per_call=10, evaluate_every=19, pretrain_iter_number=2,
            number_of_channels_atlas=32, number_of_layers_atlas=4,
            number_of_channels_mapping1=32, number_of_layers_mapping1=3,
            stop_global_rigidity=10)
    return d


def test_serve_lines_protocol(tiny_env):
    from deflicker_tpu.cli.serve import serve_lines

    tmp, (vid_a, vid_b) = tiny_env
    d = make_deflickerer(tmp)
    jobs = [
        json.dumps({"frame_folder": str(vid_a), "down": 2}),
        "",                                       # blank line: ignored
        "not json",                               # bad line: error result
        json.dumps({"frame_folder": str(vid_b), "down": 2}),
        json.dumps({"frame_folder": str(vid_b), "nope": 1}),  # bad key
    ]
    out = io.StringIO()
    n = serve_lines(d, jobs, out=out)
    assert n == 3            # parsed jobs (the bad-JSON line is not one)
    results = [json.loads(line) for line in out.getvalue().splitlines()]
    assert len(results) == 4                      # but it DID get a reply
    assert [r["ok"] for r in results] == [True, False, True, False]
    assert results[0]["psnr"] > 0
    assert "wall_s" in results[0]
    assert "unknown job keys" in results[3]["error"]
    # both videos produced the full artifact set through the warm engine
    for name in ("vid_a", "vid_b"):
        final = tmp / "results" / name / "final" / "output"
        assert len(sorted(final.glob("*.png"))) == 3


def test_serve_watch_spool(tiny_env):
    from deflicker_tpu.cli.serve import serve_watch

    tmp, (vid_a, _) = tiny_env
    d = make_deflickerer(tmp)
    spool = tmp / "jobs"
    spool.mkdir()
    (spool / "001.json").write_text(
        json.dumps({"frame_folder": str(vid_a), "down": 2}))
    (spool / "002.json").write_text(json.dumps({"video": "missing.mp4"}))
    n = serve_watch(d, spool, poll_s=0.01, max_jobs=2)
    assert n == 2
    r1 = json.loads((spool / "001.result.json").read_text())
    r2 = json.loads((spool / "002.result.json").read_text())
    assert r1["ok"] is True and r1["psnr"] > 0
    assert r2["ok"] is False
    # job files renamed -> a restarted daemon would not re-run them
    assert all(p.name.endswith(".result.json")
               for p in spool.glob("*.json"))
    assert (spool / "001.done").exists() and (spool / "002.done").exists()
