"""Op tests: bilinear sampling parity with torch grid_sample, flow warp vs
cv2.remap, consistency masks, padding, convex upsampling parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from deflicker_tpu.ops import (
    bilinear_sample, flow_warp, compute_consistency, consistency_masks,
    Padder, convex_upsample_flow, upflow8, coords_grid, normalize_xyt)


def test_bilinear_sample_matches_torch_grid_sample(rng):
    import torch
    import torch.nn.functional as F

    H, W, C = 13, 17, 4
    img = rng.standard_normal((H, W, C)).astype(np.float32)
    coords = np.stack([
        rng.uniform(-2, W + 1, 50), rng.uniform(-2, H + 1, 50)], -1).astype(np.float32)

    got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
    xg = 2 * coords[:, 0] / (W - 1) - 1
    yg = 2 * coords[:, 1] / (H - 1) - 1
    grid = torch.from_numpy(np.stack([xg, yg], -1))[None, :, None, :]
    want = F.grid_sample(t_img, grid, align_corners=True)[0, :, :, 0].T.numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flow_warp_matches_map_coordinates(rng):
    """Exact float bilinear oracle via scipy; cv2.remap agrees only to its
    5-bit fixed-point interpolation (~0.03), checked separately."""
    from scipy import ndimage
    import cv2

    H, W = 20, 24
    img = rng.standard_normal((H, W, 2)).astype(np.float32)
    flow = (2.0 * rng.standard_normal((H, W, 2))).astype(np.float32)

    got = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))

    xs = flow[:, :, 0] + np.arange(W)
    ys = flow[:, :, 1] + np.arange(H)[:, None]
    want = np.stack([
        ndimage.map_coordinates(img[:, :, c], [ys, xs], order=1,
                                mode="grid-constant", cval=0.0)
        for c in range(2)], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # and cv2.remap (the reference's op) agrees to fixed-point tolerance
    fl = flow.copy()
    fl[:, :, 0] += np.arange(W)
    fl[:, :, 1] += np.arange(H)[:, None]
    cv2_want = cv2.remap(img, fl, None, cv2.INTER_LINEAR)
    inside = (xs > 0) & (xs < W - 1) & (ys > 0) & (ys < H - 1)
    np.testing.assert_allclose(got[inside], cv2_want[inside], atol=0.12)


def test_consistency_masks_perfect_flow():
    H, W = 16, 16
    flow12 = np.full((H, W, 2), 1.5, np.float32)
    flow21 = np.full((H, W, 2), -1.5, np.float32)
    m12, m21 = consistency_masks(jnp.asarray(flow12), jnp.asarray(flow21))
    # interior must be consistent (borders can read zeros)
    assert np.asarray(m12)[2:-2, 2:-2].all()
    assert np.asarray(m21)[2:-2, 2:-2].all()
    bad = consistency_masks(jnp.asarray(flow12), jnp.asarray(flow21 * -3))[0]
    assert not np.asarray(bad)[2:-2, 2:-2].any()


def test_padder_divisibility_and_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 360, 640, 3)).astype(np.float32))
    p8 = Padder(360, 640, 8, "sintel")
    y = p8.pad(x)
    assert y.shape[1] % 8 == 0 and y.shape[2] % 8 == 0
    np.testing.assert_array_equal(np.asarray(p8.unpad(y)), np.asarray(x))

    p32 = Padder(360, 640, 32, "other")
    y32 = p32.pad(x)
    assert y32.shape[1] % 32 == 0 and y32.shape[2] % 32 == 0
    assert p32.top == 0  # 'other' mode: all height padding at the bottom
    np.testing.assert_array_equal(np.asarray(p32.unpad(y32)), np.asarray(x))


def test_convex_upsample_matches_torch_oracle(rng):
    import torch
    import torch.nn.functional as F

    N, H, W = 1, 4, 5
    flow = rng.standard_normal((N, H, W, 2)).astype(np.float32)
    mask = rng.standard_normal((N, H, W, 9 * 64)).astype(np.float32)

    got = np.asarray(convex_upsample_flow(jnp.asarray(flow), jnp.asarray(mask), 8))

    # torch oracle, following RAFT's published upsample recipe
    tf = torch.from_numpy(flow).permute(0, 3, 1, 2)
    # our mask layout (N,H,W,9*8*8) -> reference layout (N, 9*64, H, W)
    tm = torch.from_numpy(mask).permute(0, 3, 1, 2)
    tm = tm.view(N, 1, 9, 8, 8, H, W)
    tm = torch.softmax(tm, dim=2)
    up = F.unfold(8 * tf, [3, 3], padding=1)
    up = up.view(N, 2, 9, 1, 1, H, W)
    up = torch.sum(tm * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3)
    want = up.reshape(N, 2, 8 * H, 8 * W).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upflow8_matches_torch_interpolate(rng):
    import torch
    import torch.nn.functional as F

    flow = rng.standard_normal((1, 6, 7, 2)).astype(np.float32)
    got = np.asarray(upflow8(jnp.asarray(flow)))
    tf = torch.from_numpy(flow).permute(0, 3, 1, 2)
    want = (8 * F.interpolate(tf, size=(48, 56), mode="bilinear",
                              align_corners=True)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_normalize_xyt():
    out = np.asarray(normalize_xyt(np.array([0, 50]), np.array([0, 50]),
                                   np.array([0, 40]), 100, 80))
    np.testing.assert_allclose(out[0], [-1, -1, -1])
    np.testing.assert_allclose(out[1], [0, 0, 0])


def test_coords_grid():
    g = np.asarray(coords_grid(3, 4))
    assert g.shape == (3, 4, 2)
    assert g[1, 2, 0] == 2 and g[1, 2, 1] == 1
