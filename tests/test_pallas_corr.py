"""Pallas correlation-window-lookup kernel vs the XLA reference paths
(interpret mode on CPU; the same kernel compiles with Mosaic on TPU).

Oracle chain: materialized volume lookup (`corr_lookup`) == online XLA
(`corr_lookup_online`, equivalence already covered in test_raft.py) ==
the patch-DMA Pallas kernel (this file)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflicker_tpu.models.raft import (build_corr_pyramid, build_fmap_pyramid,
                                       corr_lookup, corr_lookup_online)
from deflicker_tpu.ops.pallas.corr_kernel import (corr_lookup_pallas,
                                                  pad_fmap_pyramid)


@pytest.fixture(params=["resident", "band"], autouse=True)
def corr_variant(request, monkeypatch):
    """Every test runs under BOTH classic kernel bodies: the VMEM-resident
    small-level path (opt-in; all test levels fit under
    RESIDENT_MAX_BYTES) and the per-pixel band-DMA path (forced via
    DEFLICKER_CORR_RESIDENT=0).  The quad-phase DEFAULT layout is pinned
    off here so both classic bodies stay covered; the quad test passes
    quad=True explicitly."""
    monkeypatch.setenv("DEFLICKER_CORR_QUAD", "0")
    monkeypatch.setenv("DEFLICKER_CORR_RESIDENT",
                       "1" if request.param == "resident" else "0")
    return request.param


def _setup(B=2, H=12, W=20, D=64, seed=0):
    rng = np.random.default_rng(seed)
    fmap1 = jnp.asarray(rng.normal(size=(B, H, W, D)).astype(np.float32))
    fmap2 = jnp.asarray(rng.normal(size=(B, H, W, D)).astype(np.float32))
    return fmap1, fmap2


def _coords(B, H, W, spread, seed=1):
    """Base grid + random flow; `spread` pushes coords out of bounds."""
    rng = np.random.default_rng(seed)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    base = np.stack([xs, ys], axis=-1)[None].repeat(B, axis=0)
    return jnp.asarray(base + rng.uniform(-spread, spread,
                                          (B, H, W, 2)).astype(np.float32))


@pytest.mark.parametrize("spread", [3.0, 40.0])
def test_matches_materialized(spread):
    """spread=40 drives many windows fully/partially out of bounds on a
    12x20 level — exercises the clamp + zero-pad path."""
    fmap1, fmap2 = _setup()
    B, H, W, _ = fmap1.shape
    coords = _coords(B, H, W, spread)

    ref = corr_lookup(build_corr_pyramid(fmap1, fmap2), coords)
    padded = pad_fmap_pyramid(build_fmap_pyramid(fmap2))
    got = corr_lookup_pallas(fmap1, padded, coords, interpret=True)

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_matches_online_bf16_storage():
    """bf16 patch storage (half the DMA traffic) stays within bf16 tolerance
    of the f32 online path."""
    fmap1, fmap2 = _setup(seed=2)
    B, H, W, _ = fmap1.shape
    coords = _coords(B, H, W, 5.0, seed=3)

    ref = corr_lookup_online(fmap1, build_fmap_pyramid(fmap2), coords)
    padded = pad_fmap_pyramid(build_fmap_pyramid(fmap2), dtype=jnp.bfloat16)
    got = corr_lookup_pallas(fmap1, padded, coords,
                             compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("spread", [3.0, 40.0])
def test_quad_layout_matches(spread, corr_variant):
    """The quad-phase layout (4 x-shifted copies stacked along rows,
    PATCH_W 16) must be BIT-IDENTICAL to the wide-band layout — same
    window contents, same weights, only the DMA footprint changes — and
    match the materialized oracle including out-of-bounds windows."""
    if corr_variant == "resident":
        pytest.skip("quad layout always takes the band path")
    fmap1, fmap2 = _setup(seed=6)
    B, H, W, _ = fmap1.shape
    coords = _coords(B, H, W, spread, seed=7)

    pyr = build_fmap_pyramid(fmap2)
    band = corr_lookup_pallas(fmap1, pad_fmap_pyramid(pyr), coords,
                              interpret=True)
    quad = corr_lookup_pallas(fmap1, pad_fmap_pyramid(pyr, quad=True),
                              coords, interpret=True)
    np.testing.assert_array_equal(np.asarray(quad), np.asarray(band))

    ref = corr_lookup(build_corr_pyramid(fmap1, fmap2), coords)
    np.testing.assert_allclose(np.asarray(quad), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("spread", [0.5, 3.0, 40.0])
def test_shared_layout_matches(spread, corr_variant):
    """The group-shared-band variant (one DMA per 8-pixel group when the
    windows cluster, per-pixel quad fallback otherwise) fetches the SAME
    window bytes, so it matches the wide-band layout to f32
    reduction-order noise (the shared body reduces per-pixel (K, RW, D)
    where the band body reduces batched (G, K, PW, D)): spread=0.5 makes
    every group take the shared descriptor, 3.0 mixes, 40.0 forces
    fallback + out-of-bounds clamping."""
    if corr_variant == "resident":
        pytest.skip("shared layout always takes the band kernels")
    fmap1, fmap2 = _setup(seed=8)
    B, H, W, _ = fmap1.shape
    coords = _coords(B, H, W, spread, seed=9)

    pyr = build_fmap_pyramid(fmap2)
    band = corr_lookup_pallas(fmap1, pad_fmap_pyramid(pyr), coords,
                              interpret=True)
    sh = corr_lookup_pallas(fmap1, pad_fmap_pyramid(pyr, shared=True),
                            coords, interpret=True)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(band),
                               rtol=1e-5, atol=2e-6)

    ref = corr_lookup(build_corr_pyramid(fmap1, fmap2), coords)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("spread", [3.0, 40.0])
def test_reduce_first_matches(spread, corr_variant, monkeypatch):
    """DEFLICKER_CORR_RF=1 contracts features before the y-bilinear in
    `_level_kernel` (linear ops commute): must match the interp-first
    order to f32 reduction noise and the materialized oracle."""
    if corr_variant == "resident":
        pytest.skip("RF applies to the band body only")
    fmap1, fmap2 = _setup(seed=10)
    B, H, W, _ = fmap1.shape
    coords = _coords(B, H, W, spread, seed=11)

    pyr = build_fmap_pyramid(fmap2)
    padded = pad_fmap_pyramid(pyr, quad=True)
    monkeypatch.setenv("DEFLICKER_CORR_RF", "0")
    base = corr_lookup_pallas(fmap1, padded, coords, interpret=True)
    monkeypatch.setenv("DEFLICKER_CORR_RF", "1")
    rf = corr_lookup_pallas(fmap1, padded, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(base),
                               rtol=1e-5, atol=2e-6)

    ref = corr_lookup(build_corr_pyramid(fmap1, fmap2), coords)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_shared_group_stats_cover_windows():
    """Host-side shared-band envelope invariants: for every group the
    kernel marks shared, each pixel's (K+1)x(K+1) window must sit inside
    the (R_SH, RW_SH) band fetched at (gy0, bsh) from copy cg."""
    from deflicker_tpu.ops.pallas.corr_kernel import (ALIGN, GROUP, R_SH,
                                                      RW_SH, SHIFT)

    radius, K = 4, 9
    P = 2 * radius + 3
    PL = P + 3 * SHIFT
    rng = np.random.default_rng(10)
    # adversarial spans around the envelope boundary
    x0 = (rng.integers(0, 40, (4096,)) + PL).astype(np.int64)
    y0 = (rng.integers(0, 14, (4096,)) + P).astype(np.int64)
    xg = x0.reshape(-1, GROUP)
    yg = y0.reshape(-1, GROUP)
    minx, miny = xg.min(-1), yg.min(-1)
    ok = ((xg.max(-1) - minx) <= (RW_SH - K - 1 - (SHIFT - 1))) \
        & ((yg.max(-1) - miny) <= (R_SH - K - 1))
    rmin = minx % ALIGN
    cg = rmin // SHIFT
    bsh = minx - rmin
    base_col = bsh + SHIFT * cg        # original padded column of band[0]
    for g in np.nonzero(ok)[0]:
        for j in range(GROUP):
            dx = xg[g, j] - base_col[g]
            dy = yg[g, j] - miny[g]
            assert 0 <= dx and dx + K + 1 <= RW_SH, (g, j, dx)
            assert 0 <= dy and dy + K + 1 <= R_SH, (g, j, dy)


def test_nonaligned_pixel_count():
    """H*W far from a CHUNK multiple: padding pixels must not corrupt
    real outputs."""
    fmap1, fmap2 = _setup(B=1, H=7, W=9, D=32, seed=4)
    coords = _coords(1, 7, 9, 2.0, seed=5)
    ref = corr_lookup(build_corr_pyramid(fmap1, fmap2), coords)
    padded = pad_fmap_pyramid(build_fmap_pyramid(fmap2))
    got = corr_lookup_pallas(fmap1, padded, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
