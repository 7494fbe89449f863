"""Dual-atlas texture export tests."""

import numpy as np

import jax
import jax.numpy as jnp

from deflicker_tpu.atlas.engine import build_specs, init_models
from deflicker_tpu.atlas.texture import (export_atlas_artifacts,
                                         get_high_res_texture,
                                         get_mapping_area,
                                         render_from_texture)
from tests.test_atlas_engine import synthetic_data, tiny_config


def _setup():
    cfg = tiny_config(dual=True)
    specs = build_specs(cfg, dual=True)
    params = init_models(jax.random.key(0), specs)
    data = synthetic_data()
    return cfg, specs, params, data


def test_mapping_area_bounds():
    _, specs, params, data = _setup()
    maxx, minx, maxy, miny, edge = get_mapping_area(
        params, specs, data.mask, data.larger_dim, data.num_frames,
        uv_shift=0.5)
    assert -1.0 <= minx <= maxx <= 1.0
    assert -1.0 <= miny <= maxy <= 1.0
    assert 0.0 < edge <= 2.0


def test_texture_roundtrip():
    """Rendering through the discretized texture approximates the direct
    neural-atlas render (the editable-texture consistency property)."""
    _, specs, params, data = _setup()
    # atlas fg quadrant with a generous box
    tex, orig = get_high_res_texture(256, 0.0, 1.0, 0.0, 1.0,
                                     params["atlas"], specs)
    assert orig.shape == (256, 256, 3)
    assert 0.0 <= orig.min() and orig.max() <= 1.0

    from deflicker_tpu.models.imlp import imlp_apply

    rng = np.random.default_rng(0)
    uv = rng.uniform(0.05, 0.95, (500, 2)).astype(np.float32)
    direct = np.asarray(
        0.5 * (imlp_apply(params["atlas"], jnp.asarray(uv), specs.atlas) + 1))
    via_tex = render_from_texture(orig, 0.0, 1.0, 0.0, 1.0, uv)
    err = np.abs(via_tex - direct).mean()
    assert err < 0.01, f"texture render diverges from neural atlas: {err}"


def test_export_artifacts(tmp_path):
    _, specs, params, data = _setup()
    out = export_atlas_artifacts(params, specs, data, tmp_path,
                                 resolution=128)
    for n in ("texture1.png", "texture1_marked.png", "texture2.png",
              "texture2_marked.png"):
        assert (tmp_path / n).exists(), n
    assert len(list((tmp_path / "alpha").glob("*.png"))) == data.num_frames
    assert "texture_render_psnr_proxy" in out
