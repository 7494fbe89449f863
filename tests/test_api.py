"""Warm serving API (deflicker_tpu.api.Deflickerer)."""

import numpy as np


def _write_clip(root, name, T=4, h=48, w=64, seed=0):
    import cv2

    frames = root / name
    frames.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    base = rng.uniform(40, 215, (h, w, 3)).astype(np.float32)
    for t in range(T):
        f = np.clip(np.roll(base, t, axis=1) * (1.0 + 0.1 * ((-1) ** t)),
                    0, 255)
        cv2.imwrite(str(frames / f"{t:05d}.png"), f.astype(np.uint8))
    return frames


def test_deflickerer_processes_two_videos_warm(tmp_path):
    """Two same-shape clips through one Deflickerer: both produce the full
    artifact set and the loaded engines are REUSED (not re-built)."""
    import dataclasses

    from deflicker_tpu import Deflickerer
    from deflicker_tpu.config import AtlasConfig

    root = tmp_path / "data"
    a = _write_clip(root, "clip_a", seed=0)
    _write_clip(root, "clip_b", seed=1)

    d = Deflickerer(ckpt_raft=str(tmp_path / "missing.pth"),
                    ckpt_filter=None, ckpt_local=None,
                    root=str(root), results_root=str(tmp_path / "results"),
                    mesh=None)
    d.atlas_cfg = dataclasses.replace(
        AtlasConfig(), iters_num=20, samples_batch=128, steps_per_call=10,
        evaluate_every=19, pretrain_iter_number=2,
        number_of_channels_atlas=32, number_of_layers_atlas=4,
        number_of_channels_mapping1=32, number_of_layers_mapping1=3,
        stop_global_rigidity=10)

    out_a = d.process(frame_folder=str(a), down=2)
    flow_first = d._flow_provider
    engine_first = d._filter_engine
    assert flow_first is not None and engine_first is not None

    out_b = d.process(frame_folder=str(root / "clip_b"), down=2)
    # warm: the same provider/engine objects served both videos
    assert d._flow_provider is flow_first
    assert d._filter_engine is engine_first

    for name, out in (("clip_a", out_a), ("clip_b", out_b)):
        assert out["num_frames"] == 4
        final = tmp_path / "results" / name / "final" / "output"
        assert len(sorted(final.glob("*.png"))) == 4
