"""Self-closing parity tests against the reference's REAL pretrained weights.

The reference's shipped behavior is its pretrained weights
(`/root/reference/test.py:5-6`, `src/neural_filter_and_refinement.py:46-66`,
`src/preprocess_optical_flow.py:17`), but the `.pth` blobs are STRIPPED from
this environment — converter correctness is proven with random weights
(test_raft.py / test_stage2.py) and quality claims ride self-trained
replacements.  These tests close the remaining gap BY THEMSELVES the day the
blobs appear at either canonical location:

    /root/reference/pretrained_weights/<name>.pth   (the reference's layout)
    <repo>/pretrained_weights/<name>.pth            (this framework's layout)

While absent they skip with a clear reason.  When present they assert
  (a) converter key coverage on the real state dicts (every torch key lands
      in the flax tree and the trees are shape-identical to init),
  (b) one forward parity vs the reference's own torch modules loaded with
      the real weights,
  (c) a 3-frame end-to-end pipeline smoke through the converted weights.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

WEIGHT_DIRS = (
    Path(REF) / "pretrained_weights",
    Path(__file__).resolve().parents[1] / "pretrained_weights",
)


def find_weight(name: str):
    for d in WEIGHT_DIRS:
        p = d / name
        if p.exists():
            return p
    return None


def needs(*names):
    missing = [n for n in names if find_weight(n) is None]
    return pytest.mark.skipif(
        bool(missing),
        reason=(f"reference pretrained weights not in this environment: "
                f"{missing} (drop the .pth files into "
                f"{WEIGHT_DIRS[0]} or {WEIGHT_DIRS[1]} to activate "
                f"real-weight parity)"))


def _load_sd(name):
    torch = pytest.importorskip("torch")
    sd = torch.load(str(find_weight(name)), map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return torch, sd


def _tree_paths_and_shapes(tree):
    return {jax.tree_util.keystr(p): np.shape(v)
            for p, v in jax.tree_util.tree_leaves_with_path(tree)}


@needs("raft-things.pth")
class TestRealRAFT:
    def test_convert_covers_real_state_dict(self):
        from deflicker_tpu.flow.convert import convert_raft_state_dict
        from deflicker_tpu.models.raft import raft_init

        _, sd = _load_sd("raft-things.pth")
        converted = convert_raft_state_dict(sd)
        expected = raft_init(jax.random.key(0), image_hw=(32, 32))
        assert (_tree_paths_and_shapes(converted)
                == _tree_paths_and_shapes(expected))

    def test_flow_matches_reference(self):
        from argparse import Namespace

        from src.models.stage_1.core.raft import RAFT

        from deflicker_tpu.flow.convert import convert_raft_state_dict
        from deflicker_tpu.models.raft import raft_flow

        torch, sd = _load_sd("raft-things.pth")
        model = RAFT(Namespace(small=False, mixed_precision=False))
        model.load_state_dict(
            {k[len("module."):] if k.startswith("module.") else k: v
             for k, v in sd.items()})
        model.eval()

        rng = np.random.default_rng(0)
        im1 = rng.uniform(0, 255, (1, 128, 160, 3)).astype(np.float32)
        im2 = np.clip(im1 + rng.normal(0, 8, im1.shape), 0,
                      255).astype(np.float32)
        with torch.no_grad():
            low_t, up_t = model(
                torch.from_numpy(im1.transpose(0, 3, 1, 2)),
                torch.from_numpy(im2.transpose(0, 3, 1, 2)),
                iters=8, test_mode=True)
        variables = convert_raft_state_dict(sd)
        low_j, up_j = raft_flow(variables, jnp.asarray(im1),
                                jnp.asarray(im2), iters=8,
                                dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(up_j),
                                   up_t.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-3, atol=5e-3)


@needs("neural_filter.pth")
class TestRealUNet:
    def test_convert_and_forward(self):
        from src.models.network_filter import UNet as TorchUNet

        from deflicker_tpu.filter.convert import convert_conv_state_dict
        from deflicker_tpu.models.unet import UNet
        from deflicker_tpu.models.unet import unet_init

        torch, sd = _load_sd("neural_filter.pth")
        converted = convert_conv_state_dict(sd)
        expected = unet_init(jax.random.key(0))
        assert (_tree_paths_and_shapes(converted)
                == _tree_paths_and_shapes(expected))

        tnet = TorchUNet(in_channels=6, out_channels=3, init_features=32)
        tnet.load_state_dict(sd)
        tnet.eval()
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (1, 64, 96, 6)).astype(np.float32)
        with torch.no_grad():
            yt = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        yj = UNet(6, 3, 32).apply(converted, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(yj),
                                   yt.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


@needs("local_refinement_net.pth")
class TestRealTransformNet:
    def test_convert_and_forward(self):
        from argparse import Namespace

        from src.models.network_local import TransformNet as TorchTN

        from deflicker_tpu.filter.convert import convert_conv_state_dict
        from deflicker_tpu.models.refine import (TransformNet,
                                                 transformnet_init)

        torch, sd = _load_sd("local_refinement_net.pth")
        converted = convert_conv_state_dict(sd)
        expected = transformnet_init(jax.random.key(0))
        assert (_tree_paths_and_shapes(converted)
                == _tree_paths_and_shapes(expected))

        tnet = TorchTN(Namespace(nf=32, norm="IN", model="TransformNet",
                                 blocks=5), nc_in=12, nc_out=3)
        tnet.load_state_dict(sd)
        tnet.eval()
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (1, 64, 96, 12)).astype(np.float32)
        with torch.no_grad():
            yt, _ = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)), None)
        yj = TransformNet(nf=32, blocks=5, nc_out=3).apply(converted,
                                                           jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(yj),
                                   yt.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


@needs("raft-things.pth", "neural_filter.pth", "local_refinement_net.pth")
def test_pipeline_smoke_with_real_weights(tmp_path):
    """3-frame end-to-end run with RAFT flow + pretrained stage 2 — the
    reference's shipped configuration, at toy fit settings."""
    import dataclasses

    import cv2

    from deflicker_tpu.cli.pipeline import run_pipeline
    from deflicker_tpu.config import AtlasConfig, PipelineConfig

    frames = tmp_path / "data" / "test" / "vid"
    frames.mkdir(parents=True)
    rng = np.random.default_rng(0)
    base = rng.uniform(40, 215, (48, 64, 3)).astype(np.uint8)
    for t in range(3):
        frame = np.clip(np.roll(base, t, axis=1).astype(np.float32)
                        * (1.0 + 0.1 * ((-1) ** t)), 0, 255)
        cv2.imwrite(str(frames / f"{t:05d}.png"), frame.astype(np.uint8))

    cfg = PipelineConfig(
        video_frame_folder=str(frames),
        root=str(frames.parent),
        results_root=str(tmp_path / "results"),
        down=2,
        ckpt_raft=str(find_weight("raft-things.pth")),
        ckpt_filter=str(find_weight("neural_filter.pth")),
        ckpt_local=str(find_weight("local_refinement_net.pth")))
    atlas_cfg = dataclasses.replace(
        AtlasConfig(), iters_num=30, samples_batch=128, steps_per_call=10,
        evaluate_every=29, pretrain_iter_number=2,
        number_of_channels_atlas=32, number_of_layers_atlas=4,
        number_of_channels_mapping1=32, number_of_layers_mapping1=3,
        stop_global_rigidity=15)
    out = run_pipeline(cfg, atlas_cfg)
    assert out["psnr"] > 0
    results = tmp_path / "results" / "vid"
    assert len(sorted((results / "final" / "output").glob("*.png"))) == 3
