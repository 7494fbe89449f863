"""Stage-2 model parity + engine tests.

Parity tests instantiate the reference torch UNet/TransformNet (imported
from /root/reference) with RANDOM weights, convert via filter/convert, and
check the flax forwards agree — validating conv/padding semantics, the
bilinear-upsample path, reflection padding, the ConvLSTM zero-state
reduction and the dead-InstanceNorm quirk.
"""

import sys
from argparse import Namespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


class TestUNetParity:
    def test_matches_reference(self):
        torch = pytest.importorskip("torch")
        from src.models.network_filter import UNet as TorchUNet

        from deflicker_tpu.filter.convert import convert_conv_state_dict
        from deflicker_tpu.models.unet import UNet

        torch.manual_seed(0)
        tnet = TorchUNet(in_channels=6, out_channels=3, init_features=32)
        tnet.eval()
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (2, 64, 96, 6)).astype(np.float32)
        with torch.no_grad():
            yt = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        yt = yt.numpy().transpose(0, 2, 3, 1)

        variables = convert_conv_state_dict(tnet.state_dict())
        yj = UNet(6, 3, 32).apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(yj), yt, rtol=1e-4, atol=1e-4)


class TestTransformNetParity:
    def test_matches_reference(self):
        torch = pytest.importorskip("torch")
        from src.models.network_local import TransformNet as TorchTN

        from deflicker_tpu.filter.convert import convert_conv_state_dict
        from deflicker_tpu.models.refine import TransformNet

        torch.manual_seed(0)
        opts = Namespace(nf=32, norm="IN", model="TransformNet", blocks=5)
        tnet = TorchTN(opts, nc_in=12, nc_out=3)
        tnet.eval()
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (1, 64, 96, 12)).astype(np.float32)
        with torch.no_grad():
            yt, _state = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)), None)
        yt = yt.numpy().transpose(0, 2, 3, 1)

        variables = convert_conv_state_dict(tnet.state_dict())
        yj = TransformNet(nf=32, blocks=5, nc_out=3).apply(variables,
                                                           jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(yj), yt, rtol=1e-4, atol=1e-4)


class TestFilterEngine:
    def test_resolve_ckpt_falls_back_to_shipped(self, tmp_path):
        """A relative .pth path that exists nowhere near the cwd resolves
        to the framework's shipped pretrained_weights/<name>.ckpt (the
        pipeline is commonly launched from a scratch dir)."""
        from pathlib import Path

        from deflicker_tpu.filter.engine import _resolve_ckpt

        shipped = (Path(__file__).resolve().parents[1] /
                   "pretrained_weights" / "neural_filter.ckpt")
        assert shipped.exists(), "shipped stage-2 weights missing"
        got = _resolve_ckpt(tmp_path / "pretrained_weights"
                            / "neural_filter.pth")
        assert got == shipped
        # explicit existing path always wins
        p = tmp_path / "neural_filter.pth"
        p.write_bytes(b"x")
        assert _resolve_ckpt(p) == p
        assert _resolve_ckpt(None) is None
        assert _resolve_ckpt(tmp_path / "no_such_net.pth") is None

    def test_end_to_end_artifacts(self, tmp_path):
        import cv2

        from deflicker_tpu.filter.engine import load_filter_engine

        rng = np.random.default_rng(0)
        content_dir = tmp_path / "vid"
        style_dir = tmp_path / "style"
        content_dir.mkdir()
        style_dir.mkdir()
        T, H, W = 3, 40, 52      # non-divisible by 32: exercises the padder
        for t in range(T):
            img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
            cv2.imwrite(str(content_dir / f"{t:05d}.png"), img)
            cv2.imwrite(str(style_dir / f"{t:05d}.png"), img)

        engine = load_filter_engine(None, None)  # random-init smoke
        results = tmp_path / "results"
        refined = engine.run(content_dir, style_dir, results, fps=10)
        assert refined.shape[0] == T
        for sub in ("neural_filter/concat", "neural_filter/output",
                    "final/output"):
            files = sorted((results / sub).glob("*.png"))
            assert len(files) == T, sub
        out0 = cv2.imread(str(results / "final/output/00000.png"))
        assert out0.shape == (H, W, 3)
        assert (results / "final/output.mp4").exists()

    def test_unpad_crop_vs_resize(self, tmp_path):
        """unpad="crop" (default) slices the replicate padding off exactly;
        unpad="resize" reproduces the reference's squashing quirk
        (neural_filter_and_refinement.py:111-121).  Checked directly on
        _write_span with a marker pattern: under crop the written PNG is
        the top-left (H, W) window of the padded frame byte-for-byte;
        under resize it matches cv2.resize of the whole padded frame."""
        import cv2

        from deflicker_tpu.filter.engine import FilterEngine
        from deflicker_tpu.ops.pad import Padder

        rng = np.random.default_rng(7)
        H, W = 40, 52                       # pads to 64x64 ('other' mode)
        padder = Padder(H, W, divisor=32, mode="other")
        Hp, Wp = padder.padded_hw
        preds = rng.integers(0, 256, (2, Hp, Wp, 3), dtype=np.uint8)
        refined = rng.integers(0, 256, (2, Hp, Wp, 3), dtype=np.uint8)
        content = rng.integers(0, 256, (2, H, W, 3), dtype=np.uint8)

        for mode in ("crop", "resize"):
            eng = FilterEngine({}, {}, unpad=mode)
            out = tmp_path / mode
            eng._write_span(0, content, content, preds, refined, out,
                            False, (W, H), padder)
            for t in range(2):
                got = cv2.imread(str(out / "final" / "output"
                                     / f"{t:05d}.png"))[..., ::-1]
                if mode == "crop":
                    want = refined[t, padder.top:Hp - padder.bottom,
                                   padder.left:Wp - padder.right]
                else:
                    want = cv2.resize(refined[t], (W, H),
                                      interpolation=cv2.INTER_LINEAR)
                assert got.shape == (H, W, 3)
                np.testing.assert_array_equal(got, want, err_msg=mode)

    def test_refine_first_frame_identity(self):
        from deflicker_tpu.filter.engine import refine_sequence
        from deflicker_tpu.models.refine import transformnet_init

        lvars = transformnet_init(jax.random.key(0))
        preds = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (3, 32, 32, 3)).astype(np.float32))
        out = np.asarray(refine_sequence(lvars, preds))
        # O_0 = P_0 exactly (reference: frame_id == 0 branch)
        np.testing.assert_array_equal(out[0], np.asarray(preds[0]))

    def test_bf16_close_to_f32(self):
        """The bf16 stage-2 fast path (default on TPU) must track the f32
        reference numerics — catches dtype-wiring bugs, not precision."""
        from deflicker_tpu.filter.engine import filter_frames, refine_sequence
        from deflicker_tpu.models.refine import transformnet_init
        from deflicker_tpu.models.unet import unet_init

        fv = unet_init(jax.random.key(0))
        lv = transformnet_init(jax.random.key(1))
        rng = np.random.default_rng(3)
        c = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        s = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        f32 = np.asarray(filter_frames(fv, c, s, dtype=jnp.float32))
        f16 = np.asarray(filter_frames(fv, c, s, dtype=jnp.bfloat16))
        assert np.max(np.abs(f32 - f16)) < 0.05 * max(1.0, np.abs(f32).max())
        p = jnp.asarray(rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32))
        r32 = np.asarray(refine_sequence(lv, p, dtype=jnp.float32))
        r16 = np.asarray(refine_sequence(lv, p, dtype=jnp.bfloat16))
        assert np.max(np.abs(r32 - r16)) < 0.05 * max(1.0, np.abs(r32).max())

    def test_refine_multi_matches_single(self):
        """Lockstep multi-video refinement == per-video scan (the V batch
        goes through the same convs; only the batch dim changes)."""
        from deflicker_tpu.filter.engine import (refine_sequence,
                                                 refine_sequence_multi)
        from deflicker_tpu.models.refine import transformnet_init

        lvars = transformnet_init(jax.random.key(0))
        preds_v = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (3, 4, 32, 32, 3)).astype(np.float32))
        multi = np.asarray(refine_sequence_multi(lvars, preds_v))
        for v in range(3):
            single = np.asarray(refine_sequence(lvars, preds_v[v]))
            np.testing.assert_allclose(multi[v], single, atol=1e-5)

    def test_refine_span_streams_match_full_scan(self):
        """Span-chunked refinement (carry threaded across calls, padded
        tail span, n_valid freeze) == the whole-video scan."""
        from deflicker_tpu.filter.engine import refine_sequence, refine_span
        from deflicker_tpu.models.refine import transformnet_init

        lvars = transformnet_init(jax.random.key(0))
        T, S = 7, 3
        preds = np.random.default_rng(4).uniform(
            0, 1, (T, 32, 32, 3)).astype(np.float32)
        want = np.asarray(refine_sequence(lvars, jnp.asarray(preds)))

        p0 = jnp.asarray(preds[0])
        carry = (p0, p0)
        got = [preds[:1]]
        body = preds[1:]
        for s0 in range(0, body.shape[0], S):
            chunk = body[s0:s0 + S]
            nb = chunk.shape[0]
            if nb != S:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], S - nb, axis=0)])
            carry, out = refine_span(lvars, carry, jnp.asarray(chunk),
                                     jnp.int32(nb))
            got.append(np.asarray(out)[:nb])
        np.testing.assert_allclose(np.concatenate(got), want, atol=1e-5)

    def test_streaming_run_matches_small_span(self, tmp_path):
        """engine.run with a tiny span (forcing several reader/compute/
        writer handoffs and a padded tail) == one-span run, artifacts
        complete and identical."""
        import cv2

        from deflicker_tpu.filter.engine import load_filter_engine

        rng = np.random.default_rng(5)
        cdir, sdir = tmp_path / "vid", tmp_path / "style"
        cdir.mkdir(), sdir.mkdir()
        T = 7
        for t in range(T):
            cv2.imwrite(str(cdir / f"{t:05d}.png"),
                        rng.uniform(0, 255, (40, 52, 3)).astype(np.uint8))
            cv2.imwrite(str(sdir / f"{t:05d}.png"),
                        rng.uniform(0, 255, (40, 52, 3)).astype(np.uint8))

        big = load_filter_engine(None, None)        # span 32 >= T: one span
        small = load_filter_engine(None, None)
        small.span = 3                              # 3 spans, padded tail
        r_big = big.run(cdir, sdir, tmp_path / "one", fps=10)
        r_small = small.run(cdir, sdir, tmp_path / "many", fps=10)
        np.testing.assert_allclose(r_small, r_big, atol=1e-5)
        for root in ("one", "many"):
            files = sorted((tmp_path / root / "final" / "output").glob("*.png"))
            assert len(files) == T
        for t in range(T):
            a = cv2.imread(str(tmp_path / "one" / "final" / "output"
                               / f"{t:05d}.png"))
            b = cv2.imread(str(tmp_path / "many" / "final" / "output"
                               / f"{t:05d}.png"))
            np.testing.assert_array_equal(a, b)

    def test_refine_span_multi_matches_full_scan(self):
        """Span-chunked multi-video refinement (per-video n_valid freeze,
        padded tails) == the whole-video lockstep scan, for videos of
        DIFFERENT lengths (4 and 7 frames, span 3)."""
        from deflicker_tpu.filter.engine import (refine_sequence,
                                                 refine_span_multi)
        from deflicker_tpu.models.refine import transformnet_init

        lvars = transformnet_init(jax.random.key(0))
        rng = np.random.default_rng(6)
        Ts, S = [4, 7], 3
        T_max = max(Ts)
        # each video idles on its last frame once ended (run_multi's loader)
        vids = [rng.uniform(0, 1, (T, 32, 32, 3)).astype(np.float32)
                for T in Ts]
        preds_v = np.stack([
            np.concatenate([v, np.repeat(v[-1:], T_max - v.shape[0], 0)])
            for v in vids])

        p0 = jnp.asarray(preds_v[:, 0])
        carry = (p0, p0)
        got = [preds_v[:, :1]]
        body = preds_v[:, 1:]
        for s0 in range(0, body.shape[1], S):
            chunk = body[:, s0:s0 + S]
            nb = chunk.shape[1]
            if nb != S:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[:, -1:], S - nb, axis=1)],
                    axis=1)
            nv = np.clip(np.asarray(Ts) - (s0 + 1), 0, S).astype(np.int32)
            carry, out = refine_span_multi(lvars, carry,
                                           jnp.asarray(chunk),
                                           jnp.asarray(nv))
            got.append(np.asarray(out)[:, :nb])
        got = np.concatenate(got, axis=1)
        for v, T in enumerate(Ts):
            want = np.asarray(refine_sequence(lvars, jnp.asarray(vids[v])))
            np.testing.assert_allclose(got[v, :T], want, atol=1e-5)

    def test_run_multi_matches_run(self, tmp_path):
        """FilterEngine.run_multi over 2 videos of different length ==
        engine.run on each, artifacts included."""
        import cv2

        from deflicker_tpu.filter.engine import load_filter_engine

        rng = np.random.default_rng(2)
        jobs = []
        for name, T in (("vid_a", 3), ("vid_b", 4)):
            cdir, sdir = tmp_path / name, tmp_path / (name + "_style")
            cdir.mkdir(), sdir.mkdir()
            for t in range(T):
                cv2.imwrite(str(cdir / f"{t:05d}.png"),
                            rng.uniform(0, 255, (40, 52, 3)).astype(np.uint8))
                cv2.imwrite(str(sdir / f"{t:05d}.png"),
                            rng.uniform(0, 255, (40, 52, 3)).astype(np.uint8))
            jobs.append((cdir, sdir, tmp_path / "multi" / name))

        engine = load_filter_engine(None, None)
        outs = engine.run_multi(jobs, fps=10)
        # small span: several reader/compute/writer handoffs, one video
        # ending exactly at a span boundary (T=3, span 3)
        streamy = load_filter_engine(None, None)
        streamy.span = 3
        jobs_s = [(c, s, tmp_path / "multi_s" / c.name) for c, s, _ in jobs]
        outs_s = streamy.run_multi(jobs_s, fps=10)
        assert [o.shape[0] for o in outs] == [3, 4]
        for idx, ((cdir, sdir, rdir), T) in enumerate(zip(jobs, (3, 4))):
            single = engine.run(cdir, sdir, tmp_path / "single" / cdir.name,
                                fps=10)
            np.testing.assert_allclose(outs[idx], single, atol=1e-5)
            np.testing.assert_allclose(outs_s[idx], single, atol=1e-5)
            assert len(sorted((rdir / "final" / "output").glob("*.png"))) == T
            assert len(sorted((tmp_path / "multi_s" / cdir.name / "final"
                               / "output").glob("*.png"))) == T
            assert (rdir / "final" / "output.mp4").exists()
