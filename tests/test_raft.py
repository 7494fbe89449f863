"""RAFT port tests.

The parity test instantiates the reference's own torch RAFT (imported from
/root/reference, never copied) with RANDOM weights, converts the state dict
through deflicker_tpu.flow.convert, and checks the JAX forward reproduces the
torch forward — validating encoder semantics, batch/instance norm handling,
correlation-volume layout (including the reference's x-outer window channel
order), GRU arithmetic and convex upsampling, all without pretrained files.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"


def make_torch_raft(seed=0):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from argparse import Namespace

    from src.models.stage_1.core.raft import RAFT

    torch.manual_seed(seed)
    args = Namespace(small=False, mixed_precision=False)
    model = RAFT(args)
    model.eval()
    return torch, model


@pytest.fixture(scope="module")
def torch_and_model():
    return make_torch_raft()


class TestRAFTParity:
    def test_flow_matches_reference(self, torch_and_model):
        torch, model = torch_and_model
        from deflicker_tpu.flow.convert import convert_raft_state_dict
        from deflicker_tpu.models.raft import raft_flow

        rng = np.random.default_rng(0)
        im1 = rng.uniform(0, 255, (1, 128, 160, 3)).astype(np.float32)
        im2 = rng.uniform(0, 255, (1, 128, 160, 3)).astype(np.float32)

        with torch.no_grad():
            t1 = torch.from_numpy(im1.transpose(0, 3, 1, 2))
            t2 = torch.from_numpy(im2.transpose(0, 3, 1, 2))
            flow_low_t, flow_up_t = model(t1, t2, iters=3, test_mode=True)
        flow_low_t = flow_low_t.numpy().transpose(0, 2, 3, 1)
        flow_up_t = flow_up_t.numpy().transpose(0, 2, 3, 1)

        variables = convert_raft_state_dict(model.state_dict())
        flow_low_j, flow_up_j = raft_flow(variables, jnp.asarray(im1),
                                          jnp.asarray(im2), iters=3,
                                          dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(flow_low_j), flow_low_t,
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(flow_up_j), flow_up_t,
                                   rtol=1e-3, atol=2e-3)

    def test_convert_covers_all_keys(self, torch_and_model):
        """Every torch parameter lands in the flax tree and vice versa."""
        import jax

        from deflicker_tpu.flow.convert import convert_raft_state_dict
        from deflicker_tpu.models.raft import raft_init

        _, model = torch_and_model
        converted = convert_raft_state_dict(model.state_dict())
        expected = raft_init(jax.random.key(0), image_hw=(32, 32))

        conv_paths = {jax.tree_util.keystr(p)
                      for p, _ in jax.tree_util.tree_leaves_with_path(converted)}
        init_paths = {jax.tree_util.keystr(p)
                      for p, _ in jax.tree_util.tree_leaves_with_path(expected)}
        assert conv_paths == init_paths

        def check(a, b):
            assert a.shape == b.shape
        jax.tree_util.tree_map(check, converted, expected)


class TestFlowEngine:
    def test_farneback_and_cache(self, tmp_path):
        import cv2

        from deflicker_tpu.flow.engine import (FarnebackFlow,
                                               preprocess_optical_flow)

        frames = tmp_path / "vid"
        frames.mkdir()
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (32, 40, 3)).astype(np.uint8)
        for t in range(3):
            shifted = np.roll(base, t, axis=1)
            cv2.imwrite(str(frames / f"{t:05d}.png"), shifted)

        paths = preprocess_optical_flow(frames, FarnebackFlow(), verbose=False)
        assert len(paths) == 2
        flow = np.load(paths[0])
        assert flow.shape == (32, 40, 2) and flow.dtype == np.float32
        # idempotent: second call reuses the files (same mtimes)
        mtimes = [p.stat().st_mtime_ns for p in paths]
        paths2 = preprocess_optical_flow(frames, FarnebackFlow(), verbose=False)
        assert [p.stat().st_mtime_ns for p in paths2] == mtimes


class TestOnlineCorr:
    def test_matches_materialized(self):
        import jax.numpy as jnp

        from deflicker_tpu.models.raft import (build_corr_pyramid,
                                               build_fmap_pyramid,
                                               corr_lookup,
                                               corr_lookup_online)

        rng = np.random.default_rng(0)
        f1 = jnp.asarray(rng.normal(size=(2, 16, 20, 32)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(2, 16, 20, 32)).astype(np.float32))
        ys, xs = jnp.meshgrid(jnp.arange(16.0), jnp.arange(20.0),
                              indexing="ij")
        coords = jnp.broadcast_to(jnp.stack([xs, ys], -1)[None],
                                  (2, 16, 20, 2))
        coords = coords + jnp.asarray(
            rng.uniform(-3, 3, coords.shape).astype(np.float32))
        a = corr_lookup(build_corr_pyramid(f1, f2), coords)
        b = corr_lookup_online(f1, build_fmap_pyramid(f2), coords, chunk=64)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_raft_flow_online_mode_runs(self):
        import jax

        from deflicker_tpu.models.raft import raft_flow, raft_init

        variables = raft_init(jax.random.key(0), image_hw=(128, 160))
        rng = np.random.default_rng(0)
        im1 = jnp.asarray(rng.uniform(0, 255, (1, 128, 160, 3)).astype(np.float32))
        im2 = jnp.asarray(rng.uniform(0, 255, (1, 128, 160, 3)).astype(np.float32))
        low_m, up_m = raft_flow(variables, im1, im2, iters=2,
                                corr_mode="materialized")
        low_o, up_o = raft_flow(variables, im1, im2, iters=2,
                                corr_mode="online")
        np.testing.assert_allclose(np.asarray(up_o), np.asarray(up_m),
                                   rtol=1e-3, atol=1e-3)


def test_batched_flow_preprocess(tmp_path):
    """pair_batch path computes both directions of several pairs per call
    and writes the same cache files as the per-pair path."""
    import cv2

    from deflicker_tpu.flow.engine import preprocess_optical_flow

    frames = tmp_path / "vid"
    frames.mkdir()
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (32, 40, 3)).astype(np.uint8)
    for t in range(5):
        cv2.imwrite(str(frames / f"{t:05d}.png"), np.roll(base, t, axis=1))

    class CountingProvider:
        calls = 0

        def compute_batch(self, a, b):
            CountingProvider.calls += 1
            return np.zeros(a.shape[:3] + (2,), np.float32)

        def compute_pair(self, im1, im2):  # pragma: no cover
            raise AssertionError("batched path should be used")

    paths = preprocess_optical_flow(frames, CountingProvider(),
                                    verbose=False, pair_batch=3)
    assert len(paths) == 4
    assert CountingProvider.calls == 2         # ceil(4/3)
    flow_dir = frames.parent / "vid_flow"
    assert len(list(flow_dir.glob("*.npy"))) == 8
