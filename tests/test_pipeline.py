"""End-to-end pipeline smoke test on a tiny synthetic video (CPU).

Exercises: frame adoption, Farneback flow fallback + .npy cache, atlas fit,
stage-1 artifacts, stage-2 (random-init weights) artifacts — the full
filesystem contract of SURVEY.md §1.
"""

import numpy as np
import pytest


@pytest.fixture
def tiny_video_dir(tmp_path):
    import cv2

    root = tmp_path / "data" / "test"
    frames = root / "vid"
    frames.mkdir(parents=True)
    rng = np.random.default_rng(0)
    base = rng.uniform(40, 215, (48, 64, 3)).astype(np.uint8)
    for t in range(5):
        frame = np.roll(base, t, axis=1).astype(np.float32)
        frame = np.clip(frame * (1.0 + 0.1 * ((-1) ** t)), 0, 255)  # flicker
        cv2.imwrite(str(frames / f"{t:05d}.png"), frame.astype(np.uint8))
    return tmp_path, frames


def test_full_pipeline_artifacts(tiny_video_dir):
    import dataclasses

    from deflicker_tpu.config import AtlasConfig, PipelineConfig
    from deflicker_tpu.cli.pipeline import run_pipeline

    tmp, frames = tiny_video_dir
    cfg = PipelineConfig(
        video_frame_folder=str(frames),
        root=str(frames.parent),
        results_root=str(tmp / "results"),
        down=2,
        ckpt_raft=str(tmp / "missing.pth"),     # forces Farneback fallback
        ckpt_filter=None, ckpt_local=None)      # random-init stage 2
    atlas_cfg = dataclasses.replace(
        AtlasConfig(), iters_num=30, samples_batch=128, steps_per_call=10,
        evaluate_every=29, pretrain_iter_number=2,
        number_of_channels_atlas=32, number_of_layers_atlas=4,
        number_of_channels_mapping1=32, number_of_layers_mapping1=3,
        stop_global_rigidity=15)

    out = run_pipeline(cfg, atlas_cfg)
    assert out["psnr"] > 0

    results = tmp / "results" / "vid"
    stage1_out = sorted((results / "stage_1" / "output").glob("*.png"))
    assert len(stage1_out) == 5
    assert (results / "stage_1" / "checkpoint").exists()
    assert (results / "stage_1" / "config.json").exists()
    assert (results / "stage_1" / "scalars.jsonl").exists()
    for sub in ("neural_filter/concat", "neural_filter/output", "final/output"):
        assert len(sorted((results / sub).glob("*.png"))) == 5, sub
    assert (results / "final" / "output.mp4").exists()

    # flow cache written next to the frames with the reference's naming
    flow_dir = frames.parent / "vid_flow"
    assert len(list(flow_dir.glob("*.npy"))) == 2 * 4

    # resumability: stage-1 checkpoint restores and continues
    from deflicker_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(results / "stage_1" / "checkpoint")
    assert ckpt["iteration"] == 29
    assert "params" in ckpt and "opt_state" in ckpt


def test_chunk_starts():
    from deflicker_tpu.cli.pipeline import _chunk_starts

    assert _chunk_starts(7, 3) == (3, [0, 3, 4])      # last span anchored
    assert _chunk_starts(6, 3) == (3, [0, 3])         # exact split
    assert _chunk_starts(200, 200) == (200, [0])      # at the cap
    assert _chunk_starts(201, 200) == (101, [0, 100])


def test_long_video_auto_chunking(tiny_video_dir):
    """A video longer than maximum_number_of_frames: stage 1 splits into
    same-shaped chunks fit as one parallel group; EVERY frame is rendered
    (the reference truncates at the cap) and stage 2 refines the full
    sequence in one unbroken recurrence."""
    import dataclasses

    import cv2

    from deflicker_tpu.cli.pipeline import run_pipeline
    from deflicker_tpu.config import AtlasConfig, PipelineConfig

    tmp, frames = tiny_video_dir
    # extend the 5-frame fixture to 7 frames
    base = cv2.imread(str(frames / "00000.png"))
    for t in (5, 6):
        cv2.imwrite(str(frames / f"{t:05d}.png"), np.roll(base, t, axis=1))

    cfg = PipelineConfig(
        video_frame_folder=str(frames), root=str(frames.parent),
        results_root=str(tmp / "results_long"), down=2,
        ckpt_raft=str(tmp / "missing.pth"),
        ckpt_filter=None, ckpt_local=None)
    atlas_cfg = dataclasses.replace(
        AtlasConfig(), iters_num=20, samples_batch=128, steps_per_call=10,
        evaluate_every=19, pretrain_iter_number=2,
        maximum_number_of_frames=3,          # forces 3 chunks of 3
        number_of_channels_atlas=32, number_of_layers_atlas=4,
        number_of_channels_mapping1=32, number_of_layers_mapping1=3,
        stop_global_rigidity=10)

    out = run_pipeline(cfg, atlas_cfg)
    assert out["num_frames"] == 7 and out["chunks"] == 3
    results = tmp / "results_long" / "vid"
    # all 7 frames rendered with continuous numbering, none truncated
    names = sorted(p.name for p in (results / "stage_1" / "output").glob("*.png"))
    assert names == [f"{t:05d}.png" for t in range(7)]
    assert len(sorted((results / "final" / "output").glob("*.png"))) == 7
    assert (results / "stage_1" / "checkpoint").exists()


def test_batch_parallel_fit(tmp_path):
    """--parallel_fit batch mode: two same-shape videos fit in ONE vmapped
    program, a third different-shape video in its own group; all three get
    the full artifact set."""
    import dataclasses

    import cv2

    from deflicker_tpu.cli import batch as batch_cli
    from deflicker_tpu.config import AtlasConfig

    root = tmp_path / "data" / "test"
    shapes = {"clip_a": (48, 64), "clip_b": (48, 64), "clip_c": (32, 48)}
    rng = np.random.default_rng(1)
    for name, (h, w) in shapes.items():
        frames = root / name
        frames.mkdir(parents=True)
        base = rng.uniform(40, 215, (h, w, 3)).astype(np.float32)
        for t in range(4):
            frame = np.clip(np.roll(base, t, axis=1)
                            * (1.0 + 0.1 * ((-1) ** t)), 0, 255)
            cv2.imwrite(str(frames / f"{t:05d}.png"), frame.astype(np.uint8))

    atlas_cfg = dataclasses.replace(
        AtlasConfig(), iters_num=20, samples_batch=128, steps_per_call=10,
        evaluate_every=19, pretrain_iter_number=2,
        number_of_channels_atlas=32, number_of_layers_atlas=4,
        number_of_channels_mapping1=32, number_of_layers_mapping1=3,
        stop_global_rigidity=10)

    from types import SimpleNamespace

    args = SimpleNamespace(
        fps=10, class_name=None, down=2, root=str(root),
        results_root=str(tmp_path / "results"),
        ckpt_raft=str(tmp_path / "missing.pth"),
        ckpt_filter=None, ckpt_local=None)

    summary = batch_cli.run_batch_parallel(
        [str(root / n) for n in shapes], args, atlas_cfg)
    assert summary["videos"] == 3 and summary["frames"] == 12
    for name in shapes:
        results = tmp_path / "results" / name
        assert len(sorted((results / "stage_1" / "output").glob("*.png"))) == 4
        assert len(sorted((results / "final" / "output").glob("*.png"))) == 4
        assert (results / "stage_1" / "config.json").exists()


def test_batch_parallel_routes_long_videos(tmp_path):
    """--parallel_fit with a video past the atlas cap: the short clip goes
    through the parallel group, the long one through the auto-chunked full
    pipeline — no truncation, no stage-2 frame-count mismatch."""
    import dataclasses
    from types import SimpleNamespace

    import cv2

    from deflicker_tpu.cli import batch as batch_cli
    from deflicker_tpu.config import AtlasConfig

    root = tmp_path / "data" / "test"
    rng = np.random.default_rng(7)
    for name, T in (("short", 3), ("long", 5)):
        frames = root / name
        frames.mkdir(parents=True)
        base = rng.uniform(40, 215, (32, 48, 3)).astype(np.float32)
        for t in range(T):
            cv2.imwrite(str(frames / f"{t:05d}.png"),
                        np.clip(np.roll(base, t, axis=1), 0, 255)
                        .astype(np.uint8))

    atlas_cfg = dataclasses.replace(
        AtlasConfig(), iters_num=16, samples_batch=128, steps_per_call=8,
        evaluate_every=15, pretrain_iter_number=2,
        maximum_number_of_frames=3,           # "long" = 5 frames > cap
        number_of_channels_atlas=32, number_of_layers_atlas=4,
        number_of_channels_mapping1=32, number_of_layers_mapping1=3,
        stop_global_rigidity=8)
    args = SimpleNamespace(
        fps=10, class_name=None, down=2, root=str(root),
        results_root=str(tmp_path / "results"),
        ckpt_raft=str(tmp_path / "missing.pth"),
        ckpt_filter=None, ckpt_local=None)

    summary = batch_cli.run_batch_parallel(
        [str(root / "short"), str(root / "long")], args, atlas_cfg)
    assert summary["videos"] == 2 and summary["frames"] == 8
    for name, T in (("short", 3), ("long", 5)):
        results = tmp_path / "results" / name
        assert len(sorted((results / "stage_1" / "output").glob("*.png"))) == T
        assert len(sorted((results / "final" / "output").glob("*.png"))) == T


def test_dual_pipeline_with_precomputed_masks(tiny_video_dir):
    """Seg path end-to-end with masks already on disk (the PrecomputedMasks
    contract): dual-atlas fit + texture export + stage 2."""
    import dataclasses

    import cv2

    from deflicker_tpu.cli.pipeline import run_pipeline
    from deflicker_tpu.config import AtlasConfig, PipelineConfig

    tmp, frames = tiny_video_dir
    seg = frames.parent / "vid_seg"
    seg.mkdir()
    mask = np.zeros((48, 64), np.uint8)
    mask[10:30, 20:50] = 255
    for t in range(5):
        cv2.imwrite(str(seg / f"{t:05d}.png"), mask)

    cfg = PipelineConfig(
        video_frame_folder=str(frames), root=str(frames.parent),
        results_root=str(tmp / "results_seg"), down=2,
        class_name="anything", mask_provider="grabcut",  # files exist: reused
        ckpt_raft=str(tmp / "missing.pth"),
        ckpt_filter=None, ckpt_local=None)
    atlas_cfg = dataclasses.replace(
        AtlasConfig(), iters_num=20, samples_batch=128, steps_per_call=10,
        evaluate_every=19, pretrain_iter_number=2,
        number_of_channels_atlas=32, number_of_layers_atlas=4,
        number_of_channels_alpha=32, number_of_layers_alpha=4,
        number_of_channels_mapping1=32, number_of_layers_mapping1=3,
        number_of_channels_mapping2=32, number_of_layers_mapping2=3,
        stop_global_rigidity=10, stop_bootstrapping_iteration=15)

    out = run_pipeline(cfg, atlas_cfg)
    results = tmp / "results_seg" / "vid"
    assert len(sorted((results / "stage_1" / "output").glob("*.png"))) == 5
    # dual-atlas artifact set
    tex = results / "stage_1" / "texture"
    assert (tex / "texture1.png").exists()
    assert (tex / "texture2.png").exists()
    assert len(sorted((tex / "alpha").glob("*.png"))) == 5
    assert len(sorted((results / "final" / "output").glob("*.png"))) == 5
