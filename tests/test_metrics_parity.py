"""E_warp parity vs the reference's OWN torch implementation.

Every quality number in BASELINE.md leans on `metrics/ewarp.py`; until
round 5 it was only self-tested (batched vs its own numpy oracle).  These
tests import the reference's occlusion/warp machinery
(`/root/reference/src/models/utils.py:504-572` `flow_warping` /
`detect_occlusion` — the paper's E_warp recipe, dead code in the
reference pipeline) and certify ours against it:

  * threshold math (mask1/mask2 constants, fw/bw sense, OR-combine,
    polarity) — EXACT parity, isolated from the warp sampler by feeding
    both sides the same warped flow;
  * our bilinear sampler vs torch `grid_sample(align_corners=True)` —
    float-tolerance parity (the convention the rest of the codebase uses
    for RAFT/IMLP parity);
  * end-to-end occlusion masks and masked warp errors, synthetic smooth
    flow AND real Farneback flow on the bundled test video — close
    agreement, with the one KNOWN deviation quantified below.

Known deviation (bounded, documented): the reference's `flow_warping`
builds its grid with align_corners=True scaling (`2x/(W-1)-1`,
utils.py:522-523) but calls `grid_sample` with torch's MODERN default
align_corners=False (utils.py:528) — torch >= 1.3 changed the default
under this code, which descends from fast_blind_video_consistency
(torch < 1.0, where grid_sample WAS align_corners=True; torch itself
warns "specify align_corners=True if the old behavior is desired" on
this very call).  The mismatch is a radial skew, zero at the image
center and 0.5 px at the borders.  Our `flow_warp` samples at exactly
p + flow(p) == the historical align_corners=True semantics the formula
was written for.  So the parity claim certified here is:

  * vs the reference machinery under its ORIGINAL (align_corners=True)
    semantics: tight agreement (the real certification);
  * vs the reference as it would run today under torch 1.12: the
    half-pixel border skew moves E_warp by up to ~25% at 90x160
    (measured below and bounded) — a property of the reference's
    silent default change, not of our implementation.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from deflicker_tpu.metrics.ewarp import occlusion_mask, warp_error
from deflicker_tpu.ops.sampling import flow_warp

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

VIDEO = "/root/reference/data/test/Winter_Scenes_in_Holland.mp4"


@pytest.fixture(autouse=True)
def _cpu_cuda(monkeypatch):
    """The reference's detect_occlusion hard-codes .cuda()
    (src/models/utils.py:541-542); run it on CPU unchanged."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)


@pytest.fixture
def _historical_grid_sample(monkeypatch):
    """Restore the align_corners=True default the reference's formula was
    written for (module docstring) — torch's own warning on
    utils.py:528 names this as 'the old behavior'."""
    orig = torch.nn.functional.grid_sample

    def patched(x, grid, **kw):
        kw.setdefault("align_corners", True)
        return orig(x, grid, **kw)

    monkeypatch.setattr(torch.nn.functional, "grid_sample", patched)


def _smooth_flow(rng, H, W, mag=2.0):
    """Gentle low-frequency flow (fb-consistency residual stays under the
    0.5 px mask1 threshold) + one sharp moving-edge band so the motion
    -boundary mask (mask2) genuinely fires somewhere."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    u = mag * np.sin(np.pi * ys / H + rng.uniform(0, 6)) \
        * np.cos(np.pi * xs / W + rng.uniform(0, 6))
    v = mag * np.cos(np.pi * (ys + xs) / (H + W) + rng.uniform(0, 6))
    edge = (xs > W * rng.uniform(0.4, 0.6)).astype(np.float32)
    u = u + 4.0 * edge                       # discontinuity -> occlusion
    return np.stack([u, v], -1).astype(np.float32)


def _smooth_frame(rng, H, W):
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    f = sum(np.sin(2 * np.pi * (a * ys / H + b * xs / W) + rng.uniform(0, 6))
            for a, b in [(1, 2), (3, 1), (2, 5)])
    f = (f - f.min()) / (f.max() - f.min())
    return np.stack([f, np.roll(f, 3, 0), np.roll(f, 5, 1)],
                    -1).astype(np.float32)


def _synthetic_case(seed=0, H=72, W=104):
    rng = np.random.default_rng(seed)
    fw = _smooth_flow(rng, H, W)
    bw = -fw + rng.normal(0, 0.1, fw.shape).astype(np.float32)
    f1 = _smooth_frame(rng, H, W)
    f2 = _smooth_frame(np.random.default_rng(seed + 1), H, W)
    return f1, f2, fw, bw


def _real_case(H=90, W=160):
    cv2 = pytest.importorskip("cv2")
    import os

    if not os.path.exists(VIDEO):
        pytest.skip("bundled test video missing")
    cap = cv2.VideoCapture(VIDEO)
    ok1, a = cap.read()
    ok2, b = cap.read()
    cap.release()
    if not (ok1 and ok2):
        pytest.skip("could not decode test video")
    a = cv2.resize(a, (W, H), interpolation=cv2.INTER_AREA)
    b = cv2.resize(b, (W, H), interpolation=cv2.INTER_AREA)
    g1 = cv2.cvtColor(a, cv2.COLOR_BGR2GRAY)
    g2 = cv2.cvtColor(b, cv2.COLOR_BGR2GRAY)
    fw = cv2.calcOpticalFlowFarneback(g1, g2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    bw = cv2.calcOpticalFlowFarneback(g2, g1, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    f1 = a[..., ::-1].astype(np.float32) / 255.0
    f2 = b[..., ::-1].astype(np.float32) / 255.0
    return f1, f2, fw.astype(np.float32), bw.astype(np.float32)


def _ref_ewarp(f1, f2, fw, bw):
    """E_warp composed from the reference's OWN pieces: flow_warping +
    detect_occlusion (src/models/utils.py:504-572), masked per-pixel
    channel-summed squared error averaged over non-occluded pixels —
    the identical reduction warp_error uses."""
    from src.models.utils import detect_occlusion, flow_warping, img2tensor

    occ = detect_occlusion(fw, bw)                   # 1 = occluded
    warped = flow_warping(img2tensor(f2), img2tensor(fw))
    warped = warped[0].permute(1, 2, 0).numpy()
    noc = 1.0 - occ
    diff = ((f1 - warped) ** 2).sum(-1)
    return float((diff * noc).sum() / noc.sum()), occ, warped


def test_threshold_math_exact_parity():
    """mask1/mask2 constants, fw/bw sense, OR-combine and polarity match
    the reference EXACTLY when both sides see the same warped flow —
    uses the reference's own compute_flow_magnitude/compute_flow_gradients
    on the warp our occlusion_mask computes internally."""
    from src.models.utils import (compute_flow_gradients,
                                  compute_flow_magnitude)

    f1, f2, fw, bw = _synthetic_case()
    fw_w = np.asarray(flow_warp(jnp.asarray(fw), jnp.asarray(bw)))

    fb_mag = compute_flow_magnitude(fw_w + bw)
    mask1 = fb_mag > 0.01 * (compute_flow_magnitude(fw_w)
                             + compute_flow_magnitude(bw)) + 0.5
    fx_du, fx_dv, fy_du, fy_dv = compute_flow_gradients(bw)
    mask2 = ((fx_du ** 2 + fx_dv ** 2 + fy_du ** 2 + fy_dv ** 2)
             > 0.01 * compute_flow_magnitude(bw) + 0.002)
    ref_mask = np.logical_or(mask1, mask2).astype(np.float32)

    np.testing.assert_array_equal(occlusion_mask(fw, bw), ref_mask)


def test_flow_warp_matches_torch_grid_sample_align_true():
    """Our sampler == torch grid_sample(align_corners=True) at float
    tolerance (interior AND border; zeros padding both sides)."""
    f1, f2, fw, bw = _synthetic_case(seed=3)
    H, W = f2.shape[:2]
    ours = np.asarray(flow_warp(jnp.asarray(f2), jnp.asarray(fw)))

    x = torch.from_numpy(f2.transpose(2, 0, 1))[None]
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    gx = 2.0 * (xs + fw[..., 0]) / max(W - 1, 1) - 1.0
    gy = 2.0 * (ys + fw[..., 1]) / max(H - 1, 1) - 1.0
    grid = torch.from_numpy(np.stack([gx, gy], -1))[None]
    t = torch.nn.functional.grid_sample(x, grid, align_corners=True,
                                        padding_mode="zeros")
    t = t[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, t, atol=2e-5)


@pytest.mark.parametrize("case", ["synthetic", "real"])
def test_occlusion_and_ewarp_parity(case, _historical_grid_sample):
    """End-to-end vs the reference's own implementation under the
    historical (align_corners=True) grid_sample semantics its formula was
    written for — the real certification of every recorded E_warp."""
    f1, f2, fw, bw = (_synthetic_case() if case == "synthetic"
                      else _real_case())
    ref_e, ref_occ, _ = _ref_ewarp(f1, f2, fw, bw)
    ours_occ = occlusion_mask(fw, bw)
    ours_e = warp_error(f1, f2, fw, bw)

    # masks must be non-trivial for the comparison to mean anything
    frac_occ = ref_occ.mean()
    assert 0.005 < frac_occ < 0.9, frac_occ
    disagree = float(np.mean(ours_occ != ref_occ))
    assert disagree < 0.005, (disagree, case)

    assert ref_e > 1e-6, ref_e
    rel = abs(ours_e - ref_e) / ref_e
    assert rel < 0.005, (ours_e, ref_e, rel, case)


@pytest.mark.parametrize("case", ["synthetic", "real"])
def test_modern_torch_default_deviation_bounded(case):
    """The SAME comparison under torch 1.12's align_corners=False default
    (how the reference's dead code would actually run today): the
    half-pixel border skew moves the metric, but boundedly — recorded so
    the deviation is a measured property, not a surprise."""
    f1, f2, fw, bw = (_synthetic_case() if case == "synthetic"
                      else _real_case())
    ref_e, ref_occ, _ = _ref_ewarp(f1, f2, fw, bw)
    ours_e = warp_error(f1, f2, fw, bw)
    disagree = float(np.mean(occlusion_mask(fw, bw) != ref_occ))
    assert disagree < 0.05, (disagree, case)
    rel = abs(ours_e - ref_e) / ref_e
    assert rel < 0.35, (ours_e, ref_e, rel, case)
