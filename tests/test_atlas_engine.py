"""Stage-1 engine tests on tiny synthetic videos (CPU, 8 virtual devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflicker_tpu.atlas.data import VideoData
from deflicker_tpu.atlas.engine import (build_specs, fit_atlas, init_models,
                                        make_loss_fn, pretrain_mapping)
from deflicker_tpu.atlas.render import render_frame, render_frames
from deflicker_tpu.config import AtlasConfig


def tiny_config(dual=False, iters=40):
    return AtlasConfig(
        iters_num=iters,
        samples_batch=256,
        steps_per_call=10,
        evaluate_every=20,
        number_of_channels_atlas=32, number_of_layers_atlas=4,
        number_of_channels_alpha=32, number_of_layers_alpha=4,
        number_of_channels_mapping1=32, number_of_layers_mapping1=4,
        number_of_channels_mapping2=32, number_of_layers_mapping2=3,
        stop_global_rigidity=15,
        stop_bootstrapping_iteration=25,
        pretrain_iter_number=3,
    )


def synthetic_data(T=4, H=16, W=20, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.2, 0.8, (H, W, 3)).astype(np.float32)
    video = np.stack([np.clip(base + 0.02 * t, 0, 1) for t in range(T)])
    dx = np.zeros_like(video)
    dy = np.zeros_like(video)
    dx[:, :, :-1] = video[:, :, 1:] - video[:, :, :-1]
    dy[:, :-1, :] = video[:, 1:] - video[:, :-1]
    mask = np.zeros((T, H, W), np.float32)
    mask[:, 4:12, 5:15] = 1.0
    flow_fwd = np.zeros((T, H, W, 2), np.float32)
    flow_bwd = np.zeros((T, H, W, 2), np.float32)
    mask_fwd = np.zeros((T, H, W), np.float32)
    mask_bwd = np.zeros((T, H, W), np.float32)
    mask_fwd[:-1] = 1.0
    mask_bwd[1:] = 1.0
    j = jnp.asarray
    return VideoData(j(video), j(dx), j(dy), j(mask), j(flow_fwd),
                     j(flow_bwd), j(mask_fwd), j(mask_bwd))


class TestLossFn:
    def test_single_finite_and_positive(self):
        cfg = tiny_config()
        data = synthetic_data()
        specs = build_specs(cfg, dual=False)
        params = init_models(jax.random.key(0), specs)
        loss_fn = make_loss_fn(specs, cfg, data, include_global=True,
                               include_bootstrap=False)
        B = 64
        rng = np.random.default_rng(1)
        jj = jnp.asarray(rng.integers(0, 20, B))
        ii = jnp.asarray(rng.integers(0, 16, B))
        ff = jnp.asarray(rng.integers(0, 4, B))
        total, aux = loss_fn(params, data, jj, ii, ff)
        assert np.isfinite(float(total)) and float(total) > 0
        for k in ("rgb", "gradient", "rigidity1", "global_rigidity1", "flow1"):
            assert np.isfinite(float(aux[k])), k

    def test_dual_has_all_terms(self):
        cfg = tiny_config(dual=True)
        data = synthetic_data()
        specs = build_specs(cfg, dual=True)
        params = init_models(jax.random.key(0), specs)
        loss_fn = make_loss_fn(specs, cfg, data, include_global=True,
                               include_bootstrap=True)
        B = 32
        jj = jnp.zeros(B, jnp.int32) + 3
        ii = jnp.zeros(B, jnp.int32) + 5
        ff = jnp.zeros(B, jnp.int32) + 1
        total, aux = loss_fn(params, data, jj, ii, ff)
        expected = {"rgb", "gradient", "rigidity1", "rigidity2",
                    "global_rigidity1", "global_rigidity2", "flow1", "flow2",
                    "sparsity", "alpha_flow", "alpha_bootstrap", "total"}
        assert expected <= set(aux)
        assert np.isfinite(float(total))


class TestPretrain:
    def test_drives_identity(self):
        cfg = tiny_config()
        specs = build_specs(cfg, dual=False)
        params = init_models(jax.random.key(0), specs)
        H, W, T = 16, 20, 4
        pre = pretrain_mapping(params["mapping1"], specs.mapping1,
                               jax.random.key(1), T, H, W,
                               uv_mapping_scale=0.8, pretrain_iters=50,
                               batch=512, lr=1e-3)
        from deflicker_tpu.models.imlp import imlp_apply
        from deflicker_tpu.ops.coords import normalize_xyt
        rng = np.random.default_rng(0)
        jj = rng.integers(0, W, 128)
        ii = rng.integers(0, H, 128)
        ff = rng.integers(0, T, 128)
        xyt = normalize_xyt(jj, ii, ff, max(H, W), T)
        target = np.asarray(xyt[:, :2]) * 0.8

        def mean_err(p):
            uv = imlp_apply(p, xyt, specs.mapping1)
            return np.abs(np.asarray(uv) - target).mean()

        err0, err1 = mean_err(params["mapping1"]), mean_err(pre)
        assert err1 < 0.5 * err0, f"pretrain did not converge: {err0} -> {err1}"
        assert err1 < 0.15, f"pretrain error too high: {err1}"


class TestFit:
    def test_fit_reduces_rgb_loss_and_evals(self):
        cfg = tiny_config()
        data = synthetic_data()
        specs = build_specs(cfg, dual=False)
        params = init_models(jax.random.key(0), specs)
        evals = []
        result = fit_atlas(params, specs, data, cfg, jax.random.key(2),
                           eval_callback=lambda i, p, o: evals.append(i))
        assert result.iteration == cfg.iters_num
        first, last = result.logs[0], result.logs[-1]
        assert last["rgb"] < first["rgb"]
        assert evals == [20], evals  # i % 20 == 0 and i > 0 within 0..39

    def test_fit_dual_runs(self):
        cfg = tiny_config(dual=True, iters=12)
        data = synthetic_data()
        specs = build_specs(cfg, dual=True)
        params = init_models(jax.random.key(0), specs)
        result = fit_atlas(params, specs, data, cfg, jax.random.key(2))
        assert np.isfinite(result.logs[-1]["total"])

    def test_resume_continues(self):
        cfg = tiny_config(iters=20)
        data = synthetic_data()
        specs = build_specs(cfg, dual=False)
        params = init_models(jax.random.key(0), specs)
        r1 = fit_atlas(params, specs, data, cfg, jax.random.key(2))
        r2 = fit_atlas(r1.params, specs, data, tiny_config(iters=30),
                       jax.random.key(3), start_iteration=r1.iteration,
                       opt_state=r1.opt_state)
        assert r2.iteration == 30


class TestRender:
    def test_shapes_and_range(self):
        cfg = tiny_config()
        specs = build_specs(cfg, dual=False)
        params = init_models(jax.random.key(0), specs)
        out = render_frame(params, specs, 0, 16, 20, 4)
        assert out["rgb"].shape == (16, 20, 3)
        rgb = np.asarray(out["rgb"])
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        frames = render_frames(params, specs, 2, 16, 20)
        assert frames.shape == (2, 16, 20, 3)

    def test_dual_render_has_alpha(self):
        cfg = tiny_config(dual=True)
        specs = build_specs(cfg, dual=True)
        params = init_models(jax.random.key(0), specs)
        out = render_frame(params, specs, 1, 16, 20, 4)
        assert out["alpha"].shape == (16, 20, 1)
        a = np.asarray(out["alpha"])
        assert a.min() > 0.0 and a.max() < 1.0


class TestNumericsRegression:
    def test_seeded_loss_trajectory_is_stable(self):
        """Golden guard: the seeded fp32 fit on fixed synthetic data must
        keep producing finite, monotone-ish losses in a pinned range.
        Catches silent numerics regressions (precision routing, loss
        reformulations) without pinning exact floats across backends."""
        import dataclasses

        cfg = dataclasses.replace(tiny_config(iters=30),
                                  fit_precision="highest")
        data = synthetic_data()
        specs = build_specs(cfg, dual=False)
        params = init_models(jax.random.key(0), specs)
        result = fit_atlas(params, specs, data, cfg, jax.random.key(2))
        first, last = result.logs[0], result.logs[-1]
        assert 0.0 < last["rgb"] < first["rgb"] < 1.0
        assert 0.0 < last["rigidity1"] < 1e4
        assert last["total"] < first["total"]
        # pinned coarse envelope for the seeded run (wide enough for any
        # backend, tight enough to catch a broken loss term)
        assert 10.0 < last["total"] < 1e5, last["total"]
