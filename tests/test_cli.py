"""CLI surface tests (parsers + config plumbing; no heavy execution)."""

import dataclasses

import numpy as np
import pytest


class TestMainParser:
    def test_reference_flags_accepted(self):
        from deflicker_tpu.cli.main import args_to_configs, build_parser

        p = build_parser()
        args = p.parse_args([
            "--video_name", "data/test/X.mp4", "--class_name", "portrait",
            "--fps", "15", "--gpu", "1",
            "--ckpt_filter", "w/f.pth", "--ckpt_local", "w/l.pth"])
        cfg, atlas_cfg = args_to_configs(args)
        assert cfg.video_name == "data/test/X.mp4"
        assert cfg.class_name == "portrait"
        assert cfg.fps == 15
        assert atlas_cfg.iters_num == 10001   # defaults when no config file

    def test_overrides(self):
        from deflicker_tpu.cli.main import args_to_configs, build_parser

        args = build_parser().parse_args([
            "--video_name", "x.mp4", "--iters", "500", "--seed", "7",
            "--fit_precision", "default", "--down", "2"])
        cfg, atlas_cfg = args_to_configs(args)
        assert atlas_cfg.iters_num == 500
        assert atlas_cfg.evaluate_every == 499
        assert atlas_cfg.seed == 7
        assert atlas_cfg.fit_precision == "default"
        assert cfg.down == 2

    def test_reference_config_json_loads(self):
        from deflicker_tpu.cli.main import args_to_configs, build_parser

        args = build_parser().parse_args([
            "--video_name", "x.mp4",
            "--config", "/root/reference/src/config/config_flow_100.json"])
        _, atlas_cfg = args_to_configs(args)
        assert atlas_cfg.samples_batch == 10000
        assert atlas_cfg.uv_mapping_scale == 0.8


class TestStageParsers:
    def test_stage1(self):
        from deflicker_tpu.cli.stage1 import build_parser

        a = build_parser().parse_args(["--vid_name", "v", "--down", "4"])
        assert a.vid_name == "v" and a.down == 4

    def test_preprocess_flow(self):
        from deflicker_tpu.cli.preprocess_flow import build_parser

        a = build_parser().parse_args(["--vid_name", "v",
                                       "--max_long_edge", "1000"])
        assert a.max_long_edge == 1000

    def test_stage2(self):
        from deflicker_tpu.cli.stage2 import build_parser

        a = build_parser().parse_args(["--video_name", "v", "--fps", "12"])
        assert a.fps == 12


class TestFailureDetection:
    def test_nonfinite_loss_raises_with_rescue(self, tmp_path, monkeypatch):
        import jax

        from deflicker_tpu.atlas.engine import (build_specs, fit_atlas,
                                                init_models)
        from tests.test_atlas_engine import synthetic_data, tiny_config

        monkeypatch.chdir(tmp_path)
        cfg = dataclasses.replace(tiny_config(iters=10),
                                  learning_rate=1e10)   # forces divergence
        data = synthetic_data()
        specs = build_specs(cfg, dual=False)
        params = init_models(jax.random.key(0), specs)
        with pytest.raises(FloatingPointError, match="non-finite"):
            fit_atlas(params, specs, data, cfg, jax.random.key(1))
        assert (tmp_path / "deflicker_rescue_checkpoint").exists()


class TestEvaluateCLI:
    def test_metrics_on_identical_dirs(self, tmp_path):
        import cv2

        from deflicker_tpu.cli.evaluate import compute_video_metrics

        frames = tmp_path / "vid"
        frames.mkdir()
        rng = np.random.default_rng(0)
        for t in range(3):
            cv2.imwrite(str(frames / f"{t:05d}.png"),
                        rng.uniform(0, 255, (24, 32, 3)).astype(np.uint8))
        flow_dir = tmp_path / "vid_flow"
        flow_dir.mkdir()
        zero = np.zeros((24, 32, 2), np.float32)
        for t in range(2):
            np.save(flow_dir / f"{t:05d}.png_{t+1:05d}.png.npy", zero)
            np.save(flow_dir / f"{t+1:05d}.png_{t:05d}.png.npy", zero)

        out = compute_video_metrics(frames, frames)
        assert out["psnr_mean"] == float("inf")
        assert "ewarp_mean" in out and out["ewarp_mean"] >= 0

    def test_batched_warp_error_matches_scalar(self):
        """warp_error_video (one device dispatch per video) must reproduce
        the per-pair numpy-oracle warp_error."""
        from deflicker_tpu.metrics.ewarp import warp_error, warp_error_video

        rng = np.random.default_rng(1)
        B, H, W = 3, 20, 28
        f1 = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
        f2 = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
        fw = rng.normal(0, 2, (B, H, W, 2)).astype(np.float32)
        bw = -fw + rng.normal(0, 0.2, (B, H, W, 2)).astype(np.float32)
        batched = warp_error_video(f1, f2, fw, bw)
        for b in range(B):
            np.testing.assert_allclose(
                batched[b], warp_error(f1[b], f2[b], fw[b], bw[b]),
                rtol=1e-5, atol=1e-7)


class TestConvertWeightsCLI:
    def test_raft_roundtrip(self, tmp_path):
        """Convert a random torch RAFT checkpoint and load it without torch
        involvement on the read side."""
        torch = pytest.importorskip("torch")
        from tests.test_raft import make_torch_raft

        _, model = make_torch_raft()
        src = tmp_path / "raft.pth"
        torch.save(model.state_dict(), src)

        from deflicker_tpu.cli.convert_weights import main

        dst = tmp_path / "raft.ckpt"
        assert main(["--kind", "raft", "--src", str(src),
                     "--dst", str(dst)]) == 0

        from deflicker_tpu.flow.convert import load_raft_checkpoint

        variables = load_raft_checkpoint(dst)
        assert "params" in variables and "batch_stats" in variables
