"""Flow file I/O + visualization tests."""

import numpy as np

from deflicker_tpu.io.flow_io import (flow_to_image, read_flo,
                                      read_kitti_flow, write_flo,
                                      write_kitti_flow)


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    flow = rng.uniform(-30, 30, (24, 32, 2)).astype(np.float32)
    p = tmp_path / "x.flo"
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_array_equal(back, flow)


def test_kitti_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    flow = (np.round(rng.uniform(-30, 30, (16, 20, 2)) * 64) / 64).astype(
        np.float32)
    valid = rng.uniform(0, 1, (16, 20)) > 0.3
    p = tmp_path / "x.png"
    write_kitti_flow(p, flow, valid)
    back, vback = read_kitti_flow(p)
    np.testing.assert_allclose(back, flow, atol=1 / 64)
    np.testing.assert_array_equal(vback, valid)


class TestFlowToImage:
    def test_shape_and_dtype(self):
        rng = np.random.default_rng(2)
        img = flow_to_image(rng.uniform(-5, 5, (16, 20, 2)))
        assert img.shape == (16, 20, 3) and img.dtype == np.uint8

    def test_zero_flow_is_white(self):
        img = flow_to_image(np.zeros((8, 8, 2)), normalize=False)
        assert (img > 250).all()   # zero magnitude -> fully desaturated

    def test_direction_changes_hue(self):
        right = flow_to_image(np.full((4, 4, 2), [1.0, 0.0]), normalize=False)
        left = flow_to_image(np.full((4, 4, 2), [-1.0, 0.0]), normalize=False)
        assert not np.array_equal(right, left)


def test_diagnostic_videos(tmp_path):
    import jax

    from deflicker_tpu.atlas.engine import build_specs, init_models
    from deflicker_tpu.atlas.render import save_diagnostic_videos
    from tests.test_atlas_engine import synthetic_data, tiny_config

    cfg = tiny_config()
    specs = build_specs(cfg, dual=False)
    params = init_models(jax.random.key(0), specs)
    data = synthetic_data()
    save_diagnostic_videos(params, specs, data, cfg, tmp_path)
    for n in ("residuals", "uv_1", "rigidity_loss", "flow_loss", "rgb_error"):
        assert (tmp_path / f"{n}.mp4").stat().st_size > 0, n


def test_pfm_roundtrip(tmp_path):
    from deflicker_tpu.io.flow_io import read_pfm, write_pfm

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 10, (12, 16, 3)).astype(np.float32)
    write_pfm(tmp_path / "x.pfm", img)
    back, scale = read_pfm(tmp_path / "x.pfm")
    np.testing.assert_array_equal(back, img)
    assert scale == 1.0

    gray = rng.uniform(0, 1, (8, 10)).astype(np.float32)
    write_pfm(tmp_path / "g.pfm", gray)
    back, _ = read_pfm(tmp_path / "g.pfm")
    np.testing.assert_array_equal(back, gray)
