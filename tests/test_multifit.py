"""Multi-video parallel fit (atlas/multifit.py) on the virtual CPU mesh."""

import numpy as np
import pytest

import jax

from deflicker_tpu.atlas.engine import build_specs, fit_atlas, init_models
from deflicker_tpu.atlas.multifit import (fit_atlas_multi, group_by_shape,
                                          init_models_multi,
                                          pretrain_mapping_multi,
                                          stack_video_data, unstack_tree)
from tests.test_atlas_engine import synthetic_data, tiny_config


def _max_leaf_diff(a, b):
    diffs = jax.tree_util.tree_map(
        lambda x, y: float(np.max(np.abs(np.asarray(x) - np.asarray(y)))),
        a, b)
    return max(jax.tree_util.tree_leaves(diffs))


def test_group_by_shape():
    datas = [synthetic_data(T=4), synthetic_data(T=4, seed=1),
             synthetic_data(T=6, seed=2)]
    groups = group_by_shape(datas)
    assert sorted(len(v) for v in groups.values()) == [1, 2]


def test_stack_rejects_mixed_shapes():
    with pytest.raises(ValueError):
        stack_video_data([synthetic_data(T=4), synthetic_data(T=6)])


class TestMultiMatchesSingle:
    def test_single_atlas(self):
        """fit_atlas_multi(V videos) must reproduce fit_atlas per video when
        the per-video keys line up (vmap changes layout, not math).

        One step + fp32 multiplies: more steps compound layout-induced
        float noise chaotically through Adam and the ill-conditioned
        rigidity inverse (same rationale as test_parallel.py's 1-step
        cap)."""
        import dataclasses

        cfg = dataclasses.replace(tiny_config(iters=1),
                                  fit_precision="highest")
        datas = [synthetic_data(seed=0), synthetic_data(seed=5)]
        specs = build_specs(cfg, dual=False)

        key = jax.random.key(42)
        data_v = stack_video_data(datas)
        params_v = init_models_multi(jax.random.key(0), specs, 2)
        results = fit_atlas_multi(
            jax.tree_util.tree_map(lambda x: x.copy(), params_v),
            specs, data_v, cfg, key)

        fit_keys = jax.random.split(key, 2)
        init_keys = jax.random.split(jax.random.key(0), 2)
        for v, data in enumerate(datas):
            p0 = init_models(init_keys[v], specs)
            single = fit_atlas(p0, specs, data, cfg, fit_keys[v])
            # losses must agree bitwise-tight; params to 3*lr — Adam's
            # first step is ~±lr per coordinate, so a near-zero gradient
            # coordinate whose sign flips under vmap's layout moves 2*lr
            np.testing.assert_allclose(
                single.logs[-1]["total"], results[v].logs[-1]["total"],
                rtol=1e-6)
            assert _max_leaf_diff(single.params, results[v].params) < 3e-4

    def test_multi_converges(self):
        """Longer multi-fit: loss decreases for every video."""
        cfg = tiny_config(iters=30)
        datas = [synthetic_data(seed=0), synthetic_data(seed=5)]
        specs = build_specs(cfg, dual=False)
        results = fit_atlas_multi(
            init_models_multi(jax.random.key(0), specs, 2), specs,
            stack_video_data(datas), cfg, jax.random.key(42))
        for r in results:
            assert r.logs[-1]["total"] < r.logs[0]["total"]

    def test_dual_atlas_runs(self):
        cfg = tiny_config(iters=12, dual=True)
        datas = [synthetic_data(seed=0), synthetic_data(seed=3)]
        specs = build_specs(cfg, dual=True)
        data_v = stack_video_data(datas)
        params_v = init_models_multi(jax.random.key(1), specs, 2)
        results = fit_atlas_multi(params_v, specs, data_v, cfg,
                                  jax.random.key(2))
        assert len(results) == 2
        for r in results:
            assert np.isfinite(r.logs[-1]["total"])
            assert "alpha_bootstrap" in r.logs[0]


def test_sharded_multi_matches_unsharded():
    """Video axis sharded over the 8-device mesh == unsharded vmap (videos
    are independent; SPMD adds no collectives to perturb numerics)."""
    from deflicker_tpu.parallel import make_mesh

    import dataclasses

    cfg = dataclasses.replace(tiny_config(iters=1), fit_precision="highest")
    datas = [synthetic_data(seed=s) for s in range(8)]
    specs = build_specs(cfg, dual=False)
    data_v = stack_video_data(datas)
    params_v = init_models_multi(jax.random.key(3), specs, 8)
    key = jax.random.key(9)

    r_plain = fit_atlas_multi(
        jax.tree_util.tree_map(lambda x: x.copy(), params_v),
        specs, data_v, cfg, key, mesh=None)
    r_mesh = fit_atlas_multi(params_v, specs, data_v, cfg, key,
                             mesh=make_mesh(8))
    for v in range(8):
        # same ±lr sign-flip caveat as the vmap-vs-single comparison
        assert _max_leaf_diff(r_plain[v].params, r_mesh[v].params) < 3e-4


def test_uneven_group_falls_back():
    """V=3 on an 8-device mesh: runs unsharded instead of failing."""
    from deflicker_tpu.parallel import make_mesh

    cfg = tiny_config(iters=8)
    datas = [synthetic_data(seed=s) for s in range(3)]
    specs = build_specs(cfg, dual=False)
    data_v = stack_video_data(datas)
    params_v = init_models_multi(jax.random.key(0), specs, 3)
    results = fit_atlas_multi(params_v, specs, data_v, cfg,
                              jax.random.key(1), mesh=make_mesh(8))
    assert len(results) == 3


def test_resume_matches_uninterrupted():
    """Checkpoint mid-fit (carry incl. RNG keys), resume, and land on the
    final params of the uninterrupted fit (chunked-fit resume contract,
    cli/pipeline._run_stage1_chunked).

    Tolerance note: the restored STATE is bitwise (asserted via a device
    copy at capture time elsewhere; np.array copies are exact), but the
    continuation recompiles the step program and XLA CPU recompilation is
    not bitwise stable — two compiles of identical HLO differ at float
    noise, ~1e-4 params drift over a few Adam steps (measured; with the
    persistent compile cache serving one binary the match IS exact).
    """
    import dataclasses

    cfg = dataclasses.replace(tiny_config(iters=12), evaluate_every=6)
    datas = [synthetic_data(seed=0), synthetic_data(seed=5)]
    specs = build_specs(cfg, dual=False)
    data_v = stack_video_data(datas)
    params_v = init_models_multi(jax.random.key(0), specs, 2)
    # pretrain mapping1 like production: an un-pretrained random mapping
    # makes the rigidity Jacobian near-singular -> fp32-overflow-scale
    # gradients whose threaded reductions are not even run-to-run
    # deterministic (observed nu ~1e29); bitwise resume only makes sense
    # in the well-conditioned regime production actually runs in
    params_v["mapping1"] = pretrain_mapping_multi(
        params_v["mapping1"], specs.mapping1, jax.random.key(8), 2,
        datas[0].num_frames, *datas[0].res, cfg.uv_mapping_scale,
        pretrain_iters=3)
    key = jax.random.key(42)

    saved = {}

    def ckpt_cb(iteration, carry):
        if iteration < cfg.iters_num and "carry" not in saved:
            saved["iteration"] = iteration
            # owned copies: np.asarray is zero-copy on CPU and the next
            # donated step call would reuse these buffers (see
            # utils.checkpoint.to_host)
            saved["carry"] = jax.tree_util.tree_map(
                lambda x: np.array(x, copy=True), carry[:2])
            saved["key_data"] = np.array(jax.random.key_data(carry[2]),
                                         copy=True)

    full = fit_atlas_multi(
        jax.tree_util.tree_map(lambda x: x.copy(), params_v),
        specs, data_v, cfg, key, checkpoint_callback=ckpt_cb)
    assert saved["iteration"] == 7      # eval at last=6, resume point i=7

    p_v, o_v = jax.tree_util.tree_map(jax.numpy.asarray, saved["carry"])
    keys = jax.random.wrap_key_data(jax.numpy.asarray(saved["key_data"]))
    resumed = fit_atlas_multi(p_v, specs, data_v, cfg, key,
                              start_iteration=saved["iteration"],
                              opt_state_v=o_v, keys=keys)
    for v in range(2):
        assert _max_leaf_diff(full[v].params, resumed[v].params) < 5e-3
        # same sample stream -> the logged loss points line up closely
        assert resumed[v].logs[-1]["total"] == pytest.approx(
            full[v].logs[-1]["total"], rel=1e-2)


def test_eval_cadence_matches_fit_atlas():
    """Both fit paths fire eval at the same iterations — including an eval
    point landing on the final iteration (reference cadence:
    stage1_neural_atlas.py:246-251)."""
    import dataclasses

    for iters, every in ((9, 4), (9, 8)):
        cfg = dataclasses.replace(tiny_config(iters=iters),
                                  evaluate_every=every)
        data = synthetic_data(seed=0)
        specs = build_specs(cfg, dual=False)

        fired_single = []
        fit_atlas(init_models(jax.random.key(0), specs), specs, data, cfg,
                  jax.random.key(1),
                  eval_callback=lambda i, p, o: fired_single.append(i))

        fired_multi = []
        fit_atlas_multi(init_models_multi(jax.random.key(0), specs, 1),
                        specs, stack_video_data([data]), cfg,
                        jax.random.key(1),
                        eval_callback=lambda i, v, p, o: fired_multi.append(i))
        assert fired_single == fired_multi, (iters, every)
        assert fired_single, (iters, every)


def test_pretrain_multi_matches_single():
    from deflicker_tpu.atlas.engine import pretrain_mapping

    cfg = tiny_config()
    specs = build_specs(cfg, dual=False)
    params_v = init_models_multi(jax.random.key(0), specs, 2)
    keys = jax.random.split(jax.random.key(4), 2)
    multi = pretrain_mapping_multi(params_v["mapping1"], specs.mapping1,
                                   jax.random.key(4), 2, 4, 16, 20,
                                   cfg.uv_mapping_scale, pretrain_iters=2)
    for v in range(2):
        single = pretrain_mapping(
            unstack_tree(params_v["mapping1"], 2)[v], specs.mapping1,
            keys[v], 4, 16, 20, cfg.uv_mapping_scale, pretrain_iters=2)
        assert _max_leaf_diff(single, unstack_tree(multi, 2)[v]) < 1e-5
