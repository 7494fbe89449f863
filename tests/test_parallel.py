"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp


def test_mesh_has_8_devices():
    from deflicker_tpu.parallel import make_mesh

    mesh = make_mesh()
    assert mesh.size == 8


def test_sharded_fit_matches_single_device():
    """Same key -> identical sampled batch; the sharding constraint changes
    layout only, so per-step losses must agree with the unsharded run."""
    import dataclasses

    import optax

    from deflicker_tpu.atlas.engine import (_run_chunk, build_specs,
                                            init_models, make_loss_fn,
                                            make_scan_step)
    from deflicker_tpu.config import AtlasConfig
    from deflicker_tpu.parallel import make_mesh, replicated
    from tests.test_atlas_engine import synthetic_data, tiny_config

    cfg = dataclasses.replace(tiny_config(), samples_batch=256)
    data = synthetic_data()
    T, (H, W) = data.num_frames, data.res
    specs = build_specs(cfg, dual=False)
    optimizer = optax.adam(cfg.learning_rate)
    loss_fn = make_loss_fn(specs, cfg, data, True, False)

    def run(mesh):
        # fresh params per run: _run_chunk donates its carry buffers
        p = init_models(jax.random.key(0), specs)
        opt = optimizer.init(p)
        if mesh is not None:
            p = jax.device_put(p, replicated(mesh))
            opt = jax.device_put(opt, replicated(mesh))
        step = make_scan_step(loss_fn, optimizer, cfg.samples_batch, H, W, T,
                              mesh=mesh)
        # one step: same key -> same sampled batch; only the cross-device
        # reduction order differs.  (More steps would compound float noise
        # chaotically through Adam + the ill-conditioned rigidity inverse.)
        carry, aux = _run_chunk((p, opt, jax.random.key(7)), data,
                                step_fn=step, n_steps=1)
        return float(aux["total"])

    single = run(None)
    sharded = run(make_mesh(8))
    np.testing.assert_allclose(sharded, single, rtol=1e-4)


def test_sharded_raft_matches_single_device():
    """RAFT pair batch sharded over the mesh == unsharded (pure data
    parallelism: replicated params, per-pair independent compute)."""
    from deflicker_tpu.models.raft import raft_flow, raft_init
    from deflicker_tpu.parallel import batch_sharding, make_mesh

    variables = raft_init(jax.random.key(0), image_hw=(32, 32))
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.uniform(0, 255, (8, 32, 32, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (8, 32, 32, 3)).astype(np.float32))

    _, single = raft_flow(variables, im1, im2, iters=2,
                          corr_mode="materialized")
    mesh = make_mesh(8)
    sh = batch_sharding(mesh)
    _, sharded = raft_flow(variables, jax.device_put(im1, sh),
                           jax.device_put(im2, sh), iters=2,
                           corr_mode="materialized", mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-4, atol=1e-4)


def test_sharded_filter_matches_single_device():
    """Stage-2 UNet frame batch sharded over the mesh == unsharded."""
    from deflicker_tpu.filter.engine import filter_frames
    from deflicker_tpu.models.unet import unet_init
    from deflicker_tpu.parallel import batch_sharding, make_mesh

    variables = unet_init(jax.random.key(0))
    rng = np.random.default_rng(1)
    content = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))

    single = filter_frames(variables, content, style)
    mesh = make_mesh(8)
    sh = batch_sharding(mesh)
    sharded = filter_frames(variables, jax.device_put(content, sh),
                            jax.device_put(style, sh), mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-5)


class TestMultihost:
    """Multi-host DCN fan-out (parallel/multihost.py) — single-process
    semantics; a real pod exercises the same code path with
    process_count > 1."""

    def test_assign_videos_partitions(self):
        from deflicker_tpu.parallel import assign_videos

        vids = [f"v{i}" for i in range(10)]
        shares = [assign_videos(vids, k, 4) for k in range(4)]
        # disjoint, complete, round-robin interleaved
        flat = sorted(sum(shares, []))
        assert flat == sorted(vids)
        assert shares[0] == ["v0", "v4", "v8"]
        assert shares[3] == ["v3", "v7"]

    def test_assign_videos_rejects_bad_pid(self):
        import pytest

        from deflicker_tpu.parallel import assign_videos

        with pytest.raises(ValueError):
            assign_videos(["a"], 2, 2)

    def test_init_distributed_single_process(self):
        """Nothing configured -> no jax.distributed, identity process grid."""
        from deflicker_tpu.parallel import init_distributed

        pid, nproc = init_distributed()
        assert (pid, nproc) == (0, 1)

    def test_local_mesh_covers_local_devices(self):
        from deflicker_tpu.parallel import local_mesh

        mesh = local_mesh()
        assert mesh is not None and mesh.size == 8   # virtual CPU devices

    def test_batch_cli_dcn_single_process(self, tmp_path, monkeypatch):
        """--dcn with an implicit 1-process grid assigns every video and
        runs the normal path (smoke of the flag wiring, not a real pod)."""
        from deflicker_tpu.cli import batch as batch_cli
        from deflicker_tpu.parallel import assign_videos, init_distributed

        pid, nproc = init_distributed(None, None, None)
        vids = assign_videos(["a.mp4", "b.mp4"], pid, nproc)
        assert vids == ["a.mp4", "b.mp4"]
        # the argparse surface accepts the flags; pipeline mocked out
        parser_smoke = ["--videos", "x.mp4", "--dcn", "--num_processes", "1",
                        "--process_id", "0"]
        called = {}

        def fake_pipeline(cfg, atlas_cfg, mesh=None, **kw):
            called["video"] = cfg.video_name
            return {"num_frames": 1, "t_total": 0.0, "psnr": 0.0}

        monkeypatch.setattr("deflicker_tpu.cli.pipeline.run_pipeline",
                            fake_pipeline)
        try:
            batch_cli.main(parser_smoke)
        except SystemExit as e:          # argparse error would raise 2
            assert e.code in (0, None)
        assert called.get("video") == "x.mp4"


def test_sharded_render_matches():
    from deflicker_tpu.atlas.engine import build_specs, init_models
    from deflicker_tpu.atlas.render import render_frame
    from deflicker_tpu.config import AtlasConfig
    from deflicker_tpu.parallel import make_mesh
    from tests.test_atlas_engine import tiny_config

    cfg = tiny_config()
    specs = build_specs(cfg, dual=False)
    params = init_models(jax.random.key(0), specs)
    # H*W must divide by 8 for even sharding: 16*24
    a = render_frame(params, specs, 1, 16, 24, 4)["rgb"]
    b = render_frame(params, specs, 1, 16, 24, 4, mesh=make_mesh(8))["rgb"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
