"""Pallas TPU kernel: RAFT correlation-window lookup (online mode).

The RAFT GRU loop samples a (2r+1)^2 window of the all-pairs correlation
volume around per-pixel float coords, every iteration (reference hot spot:
src/models/stage_1/core/corr.py:33-64; the optional `alt_cuda_corr` CUDA
extension at corr.py:67-95 is the memory-light variant this kernel plays
the role of).  On TPU the XLA formulations are both gather-bound:

  * materialized volume + lookup = per-pixel bilinear gathers from an
    (H*W, H, W) volume — O((HW)^2) HBM for long-edge-2000 inputs, and the
    gather serializes;
  * online XLA (`models.raft.corr_lookup_online`) avoids the volume but
    gathers 4*(2r+1)^2 feature ROWS per pixel per level through
    `jnp.take`-style indexing — hundreds of thousands of tiny serialized
    row loads.

Key structural observation: all (2r+1)^2 window points share ONE fractional
offset (the window offsets are integers), so the window's 4-corner bilinear
lookup collapses to a single CONTIGUOUS (K+1, K+1, D) feature patch around
`floor(coords) - r`, combined with 4 shared corner weights.  A contiguous
patch is one strided DMA — the access pattern TPUs are built for — instead
of 4*(K+1)^2 scattered row gathers.

TPU alignment: DMA slice offsets/extents on the second-minor dim must be
sublane-tile-aligned (8 for f32, 16 for packed bf16), but `floor(coords)`
is arbitrary.  So the kernel fetches a 16-ALIGNED, PATCH_W-wide band
around the window and folds the residual x-shift INTO the math: the
x-selection + x-bilinear interpolation together are one (PATCH_W, K)
one-hot-pair matrix per pixel, applied as a tiny MXU matmul after the
feature contraction.  No dynamic in-kernel slicing anywhere:

    band[slot] <- DMA (K+1, PATCH_W, D) aligned band      [double-buffered]
    Y  = (1-wy)*band[:K] + wy*band[1:]                    (K, PATCH_W, D)
    Z  = Y . f1_pixel / sqrt(D)                           (K, PATCH_W)
    out= Z . X(dx, wx)            -> transpose -> (K*K,)  (K, K)

Zero-padding each level by P = 2r+3 and clamping coords into
[-(r+2), W-1+r+2] reproduces grid_sample zeros-padding semantics exactly:
any window point outside the true level reads fabricated zeros.

Channel order matches the reference quirk (corr.py:42-47, see
models/raft.py module docstring): channel p*(2r+1)+q samples
(x + off[p], y + off[q]) — X offset on the outer axis.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:                                    # pragma: no cover
    _PALLAS_OK = False

CHUNK = 512          # pixels per grid step
GROUP = 8            # pixels per DMA/compute round
ALIGN = 16           # x-offset alignment of the fetched band (bf16 sublane)
PATCH_W = 32         # band width: ALIGN-1 max shift + (K+1) window + slack

# Quad-phase layout (the DEFAULT; DEFLICKER_CORR_QUAD=0 reverts): the
# band overfetch above is 3.2x the true (K+1)^2 window (bench_roofline
# sol names it the RAFT bottleneck — corr DMA is 57.8 of the 60.2
# ms/field floor).  Storing FOUR x-shifted copies of each padded level
# stacked along the row axis (copy c starts SHIFT*c columns later) lets
# the host pick the copy whose residual shift is x0 mod SHIFT <= 3, so a
# 16-aligned fetch of just PATCH_W_QUAD=16 columns (the bf16 sublane-tile
# minimum) always covers the K+1=10-column window: per-pixel band bytes
# HALVE and the x-selection one-hot shrinks 2x, at the cost of 4x level
# storage in HBM (a few MB) and zero kernel-math changes — outputs are
# bit-identical to the wide band (BENCH_E2E corr_ab quad_ok, diff 0.0).
# Pixels never straddle copies because the row offset c*Hq is a
# whole-level jump.  Measured: 90.7 vs 100.7 ms per 20-lookup level-0
# sequence (+10%, not the 2x the byte cut suggests — the lookup is
# partly bound by DMA ISSUE RATE: 4 descriptors per pixel regardless of
# band width).
SHIFT = 4            # phase granularity of the shifted copies
N_PHASES = ALIGN // SHIFT
PATCH_W_QUAD = 16    # SHIFT-1 max shift + (K+1) window, at the tile floor

# Small pyramid levels can skip the per-pixel band DMA entirely: the whole
# padded level rides into VMEM once per grid cell (Pallas block revisiting
# caches it across chunk steps) and the x-selection one-hot spans the full
# level width.  The DMA-arithmetic case looked strong (the (K+1) x PATCH_W
# band overfetches the true window 3.2x, and per-pixel band bytes are
# level-size-INDEPENDENT, so tiny levels pay the same DMA as level 0) but
# the chip DISAGREES: at the production 45x80/D=256 grid the resident body
# is 63% SLOWER end-to-end (BENCH_E2E corr_ab: 165.5 ms vs 101.5 ms per
# 20-lookup sequence, numerics identical) — the full-width one-hot
# x-selection matmul costs more VPU/MXU time than the band DMA it saves;
# the band fetches were already overlapped behind compute.  Measured
# negative => OPT-IN only: DEFLICKER_CORR_RESIDENT=1 enables (classic
# layout only — also set DEFLICKER_CORR_QUAD=0, the quad default
# bypasses the resident path), and DEFLICKER_CORR_RESIDENT_MAX_MB tunes
# the per-level byte gate (default 5 MB) e.g. =1 to keep level 0 on the
# band path while levels 1-3 ride resident (also measured slower:
# 108.2 vs 100.7 ms).
RESIDENT_MAX_BYTES = 5 * 1024 * 1024


def _resident_enabled() -> bool:
    import os

    return os.environ.get("DEFLICKER_CORR_RESIDENT", "0") == "1"


def _resident_max_bytes() -> int:
    import os

    mb = os.environ.get("DEFLICKER_CORR_RESIDENT_MAX_MB")
    return int(float(mb) * 1024 * 1024) if mb else RESIDENT_MAX_BYTES


def corr_pallas_available() -> bool:
    return _PALLAS_OK and jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _level_kernel(radius: int, true_d: int, compute_dtype, patch_w,
                  x0a_ref, y0_ref, dx_ref, wx_ref, wy_ref, f1_ref, f2_ref,
                  out_ref, slab, sems, x0a_s, y0_s, idx_sems):
    """One correlation-pyramid level for one (batch, chunk) grid cell.

    x0a:   (1, CHUNK, 1) int32 VMEM — ALIGN-aligned left edge of the band
           in the PADDED level.  Staged into SMEM scratch at cell start
           (XLA's 1D SMEM tilings vary with array size, so int vectors
           arrive via VMEM and hop to SMEM for scalar DMA indexing).
    y0:    (1, CHUNK, 1) int32 VMEM — top edge of the (K+1)-row patch.
    dx:    (1, CHUNK, 1) f32 VMEM — integer x-shift of the true window
           inside the band (x0 - x0a).
    wx/wy: (1, CHUNK, 1) f32 VMEM — shared bilinear fractions.
    f1:    (1, CHUNK, D) VMEM — query features.
    f2:    full (B, Hp, Wp, D) padded level in HBM.
    out:   (1, CHUNK, K*K) f32 VMEM.
    slab:  (2, GROUP, K+1, PATCH_W, D) VMEM scratch (double buffer).
    sems:  (2, GROUP) DMA semaphores.
    x0a_s/y0_s: (1, CHUNK, 1) int32 SMEM scratch; idx_sems: (2,) DMA sems.
    """
    K = 2 * radius + 1
    P1 = K + 1
    b = pl.program_id(0)
    inv_sqrt_d = 1.0 / (true_d ** 0.5)
    n_groups = CHUNK // GROUP

    cp_x = pltpu.make_async_copy(x0a_ref, x0a_s, idx_sems.at[0])
    cp_y = pltpu.make_async_copy(y0_ref, y0_s, idx_sems.at[1])
    cp_x.start()
    cp_y.start()
    cp_x.wait()
    cp_y.wait()

    def dma(slot, g, j):
        i = g * GROUP + j
        # the host aligns x0a to ALIGN; Mosaic needs the proof hint
        x0a = pl.multiple_of(x0a_s[0, i, 0], ALIGN)
        return pltpu.make_async_copy(
            f2_ref.at[b, pl.ds(y0_s[0, i, 0], P1),
                      pl.ds(x0a, patch_w), :],
            slab.at[slot, j],
            sems.at[slot, j],
        )

    def start_group(slot, g):
        for j in range(GROUP):
            dma(slot, g, j).start()

    def wait_group(slot, g):
        for j in range(GROUP):
            dma(slot, g, j).wait()

    start_group(0, 0)

    def body(g, _):
        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < n_groups)
        def _():
            start_group(1 - slot, g + 1)

        wait_group(slot, g)

        i0 = g * GROUP
        band = slab[slot].astype(compute_dtype)    # (G, K+1, PATCH_W, D)
        wy = wy_ref[0, pl.ds(i0, GROUP), :]        # (G, 1)
        wy = wy[:, :, None, None].astype(compute_dtype)
        # y-bilinear with the shared fraction
        y = (1.0 - wy) * band[:, :K] + wy * band[:, 1:]  # (G, K, PATCH_W, D)

        # feature contraction: Z[g, q, k] = sum_d Y[g, q, k, d] * f1[g, d]
        # (VPU multiply + lane reduction — Mosaic rejects the 4D batched
        # dot_general form)
        f1g = f1_ref[0, pl.ds(i0, GROUP), :].astype(compute_dtype)  # (G, D)
        z = jnp.sum(y * f1g[:, None, None, :],
                    axis=-1).astype(jnp.float32)   # (G, K, PATCH_W)

        # x-selection + x-bilinear as one matrix:
        # X[g, k, p] = (1-wx)*[k == dx+p] + wx*[k == dx+p+1]
        dx = dx_ref[0, pl.ds(i0, GROUP), :][:, :, None]   # (G, 1, 1) f32
        dxi = dx.astype(jnp.int32)
        wx = wx_ref[0, pl.ds(i0, GROUP), :][:, :, None].astype(jnp.float32)
        # int32 2D iotas broadcast against (G, 1, 1) — Mosaic supports
        # neither f32 nor 3D iota on this target
        k_i = jax.lax.broadcasted_iota(jnp.int32, (patch_w, K), 0)[None]
        p_i = jax.lax.broadcasted_iota(jnp.int32, (patch_w, K), 1)[None]
        m0 = (k_i == dxi + p_i).astype(jnp.float32)
        m1 = (k_i == dxi + p_i + 1).astype(jnp.float32)
        xm = (1.0 - wx) * m0 + wx * m1             # (G, PATCH_W, K)
        # contract xm first: output comes out (G, K[x], K[y]) — the
        # reference's x-outer channel order — with no in-kernel transpose
        # both operands are always f32 here; HIGHEST precision keeps the
        # selection matmul exact (this JAX build defaults to bf16 passes)
        corr = jax.lax.dot_general(
            xm, z, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)   # (G, K[x], K[y])
        # out stays 4D: Mosaic can't shape-cast (G, K, K) -> (G, K*K) on
        # non-constant values; the flatten happens outside in XLA
        out_ref[0, pl.ds(i0, GROUP), :, :] = corr * inv_sqrt_d
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)


def _resident_kernel(radius: int, true_d: int, compute_dtype,
                     x0_ref, y0_ref, wx_ref, wy_ref, f1_ref, f2_ref,
                     out_ref, z_buf, y0_s, idx_sems):
    """VMEM-resident variant of `_level_kernel` for small pyramid levels.

    The whole padded level sits in VMEM (f2_ref block), so there is no
    per-pixel band DMA and no x alignment constraint: each pixel slices
    its (K+1)-row strip at a dynamic MAJOR-dim offset (always legal),
    y-interpolates, contracts against its query feature, and the
    x-selection one-hot spans the full padded width Wp instead of a
    PATCH_W band (dx is simply x0, the window's left edge in padded level
    coords).  Extra VPU work vs the band path is Wp/PATCH_W per pixel —
    cheap next to the DMA it deletes (bench_roofline corr_ab)."""
    K = 2 * radius + 1
    inv_sqrt_d = 1.0 / (true_d ** 0.5)
    n_groups = CHUNK // GROUP
    Wp = f2_ref.shape[2]

    cp_y = pltpu.make_async_copy(y0_ref, y0_s, idx_sems.at[0])
    cp_y.start()
    cp_y.wait()

    def body(g, _):
        i0 = g * GROUP
        f1g = f1_ref[0, pl.ds(i0, GROUP), :].astype(compute_dtype)  # (G, D)
        wyg = wy_ref[0, pl.ds(i0, GROUP), :].astype(compute_dtype)  # (G, 1)
        # per-pixel strips: dynamic offsets on the MAJOR (row) dim only
        for j in range(GROUP):
            strip = f2_ref[0, pl.ds(y0_s[0, i0 + j, 0], K + 1), :, :]
            strip = strip.astype(compute_dtype)          # (K+1, Wp, D)
            wy = wyg[j, 0]
            y = (1.0 - wy) * strip[:K] + wy * strip[1:]  # (K, Wp, D)
            z_buf[j] = jnp.sum(y * f1g[j][None, None, :],
                               axis=-1).astype(jnp.float32)   # (K, Wp)

        z = z_buf[...]                                   # (G, K, Wp)
        dxi = x0_ref[0, pl.ds(i0, GROUP), :][:, :, None].astype(jnp.int32)
        wx = wx_ref[0, pl.ds(i0, GROUP), :][:, :, None].astype(jnp.float32)
        k_i = jax.lax.broadcasted_iota(jnp.int32, (Wp, K), 0)[None]
        p_i = jax.lax.broadcasted_iota(jnp.int32, (Wp, K), 1)[None]
        m0 = (k_i == dxi + p_i).astype(jnp.float32)
        m1 = (k_i == dxi + p_i + 1).astype(jnp.float32)
        xm = (1.0 - wx) * m0 + wx * m1                   # (G, Wp, K)
        corr = jax.lax.dot_general(
            xm, z, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # (G, K[x], K[y])
        out_ref[0, pl.ds(i0, GROUP), :, :] = corr * inv_sqrt_d
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)


def _lookup_level_resident(fmap1_flat: jax.Array, f2_padded: jax.Array,
                           x0: jax.Array, y0: jax.Array, wx: jax.Array,
                           wy: jax.Array, radius: int, true_d: int,
                           compute_dtype, interpret: bool) -> jax.Array:
    """Resident-level dispatch: same contract as `_lookup_level` but takes
    the UNALIGNED window edge x0 directly (no band, no dx)."""
    B, Np, D = fmap1_flat.shape
    K = 2 * radius + 1
    n_chunks = Np // CHUNK
    _, Hp, Wp, Dp = f2_padded.shape

    kern = functools.partial(_resident_kernel, radius, true_d, compute_dtype)
    return pl.pallas_call(
        kern,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, CHUNK, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # x0
            pl.BlockSpec((1, CHUNK, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # y0
            pl.BlockSpec((1, CHUNK, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # wx
            pl.BlockSpec((1, CHUNK, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # wy
            pl.BlockSpec((1, CHUNK, D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # fmap1
            # the WHOLE padded level as one VMEM block; every chunk step
            # maps to the same block index, so Pallas re-fetches it only
            # when b changes (block revisiting)
            pl.BlockSpec((1, Hp, Wp, Dp), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CHUNK, K, K), lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, K, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((GROUP, K, Wp), jnp.float32),
            pltpu.SMEM((1, CHUNK, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(x0[..., None].astype(jnp.float32), y0[..., None], wx, wy, fmap1_flat,
      f2_padded)


def _lookup_level(fmap1_flat: jax.Array, f2_padded: jax.Array,
                  x0a: jax.Array, y0: jax.Array, dx: jax.Array,
                  wx: jax.Array, wy: jax.Array, radius: int, true_d: int,
                  compute_dtype, interpret: bool,
                  patch_w: int = PATCH_W) -> jax.Array:
    """fmap1_flat (B, Np, D); f2_padded (B, Hp, Wp, D); x0a/y0 (B, Np) int32;
    dx/wx/wy (B, Np, 1) f32.  Np divisible by CHUNK, D lane-padded to 128.
    Returns (B, Np, K, K) f32 (x-offset outer)."""
    B, Np, D = fmap1_flat.shape
    K = 2 * radius + 1
    n_chunks = Np // CHUNK
    grid = (B, n_chunks)

    kern = functools.partial(_level_kernel, radius, true_d, compute_dtype,
                             patch_w)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, CHUNK, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # x0a
            pl.BlockSpec((1, CHUNK, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # y0
            pl.BlockSpec((1, CHUNK, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # dx
            pl.BlockSpec((1, CHUNK, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # wx
            pl.BlockSpec((1, CHUNK, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # wy
            pl.BlockSpec((1, CHUNK, D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # fmap1
            # the level must stay in HBM: VMEM-resident memrefs get sublane
            # tiling that rejects unaligned dynamic slices; HBM DMA allows
            # arbitrary strides (x offsets are ALIGN-aligned regardless)
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, CHUNK, K, K), lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, K, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, K + 1, patch_w, D), f2_padded.dtype),
            pltpu.SemaphoreType.DMA((2, GROUP)),
            pltpu.SMEM((1, CHUNK, 1), jnp.int32),
            pltpu.SMEM((1, CHUNK, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x0a[..., None], y0[..., None], dx, wx, wy, fmap1_flat, f2_padded)


def _quad_enabled() -> bool:
    import os

    return os.environ.get("DEFLICKER_CORR_QUAD", "1") != "0"


def pad_fmap_pyramid(fmap2_pyramid: Sequence[jax.Array], radius: int = 4,
                     dtype=None, quad: "bool | None" = None
                     ) -> Sequence[jax.Array]:
    """Zero-pad every level for the kernel (done once per flow solve,
    outside the GRU scan): P = 2r+3 on top/bottom/left; the right edge gets
    extra slack so an ALIGN-aligned PATCH_W-wide band never reads past the
    buffer; the lane dim is 128-aligned (Mosaic memref requirement — zero
    feature channels contribute nothing to the correlation dot).

    quad=True (default: DEFLICKER_CORR_QUAD env) emits the quad-phase
    layout instead: N_PHASES x-shifted copies of the padded level stacked
    along rows — copy c holds base columns [SHIFT*c, SHIFT*c + Wc).
    `corr_lookup_pallas` detects the layout from the row count."""
    if quad is None:
        quad = _quad_enabled()
    P = 2 * radius + 3
    out = []
    for lvl in fmap2_pyramid:
        B, H, W, D = lvl.shape
        dpad = _round_up(D, 128) - D
        if quad:
            # left pad grows by the maximum copy shift so x0 - SHIFT*c
            # never goes negative; copy width fits the rightmost aligned
            # PATCH_W_QUAD fetch (x0 <= W + 1 + PL)
            PL = P + (N_PHASES - 1) * SHIFT
            Wc = _round_up(W + 1 + PL + PATCH_W_QUAD, ALIGN)
            base = jnp.pad(lvl, ((0, 0), (P, P),
                                 (PL, Wc + (N_PHASES - 1) * SHIFT - PL - W),
                                 (0, dpad)))
            p = jnp.concatenate(
                [base[:, :, SHIFT * c:SHIFT * c + Wc] for c in
                 range(N_PHASES)], axis=1)
        else:
            # rightmost band start = align_down(W-1+r+2-r+P) <= W + P + 2
            wp = _round_up(W + P + 2 + PATCH_W, ALIGN)
            right = wp - (W + P)
            p = jnp.pad(lvl, ((0, 0), (P, P), (P, right), (0, dpad)))
        out.append(p.astype(dtype) if dtype is not None else p)
    return out


def corr_lookup_pallas(fmap1: jax.Array,
                       fmap2_pyramid_padded: Sequence[jax.Array],
                       coords: jax.Array, radius: int = 4,
                       compute_dtype=jnp.float32,
                       interpret: bool = False) -> jax.Array:
    """Drop-in equivalent of `models.raft.corr_lookup_online` (same channel
    order, same zeros-padding semantics) backed by the patch-DMA kernel.

    fmap1: (B, H, W, D) float32 query features (level-0 resolution).
    fmap2_pyramid_padded: output of `pad_fmap_pyramid` — any float dtype
        (bf16 halves DMA traffic).
    coords: (B, H, W, 2) float32 (x, y) at level-0 scale.
    Returns (B, H, W, L*(2r+1)^2) float32.
    """
    B, H, W, D = fmap1.shape
    P = 2 * radius + 3
    N = H * W
    Np = _round_up(N, CHUNK)
    Dp = _round_up(D, 128)

    f1 = fmap1.reshape(B, N, D)
    cx = coords[..., 0].reshape(B, N)
    cy = coords[..., 1].reshape(B, N)
    if Np != N or Dp != D:
        f1 = jnp.pad(f1, ((0, 0), (0, Np - N), (0, Dp - D)))
        cx = jnp.pad(cx, ((0, 0), (0, Np - N)))
        cy = jnp.pad(cy, ((0, 0), (0, Np - N)))
    if f1.dtype != jnp.float32:
        f1 = f1.astype(jnp.float32)

    outs = []
    Hl, Wl = H, W              # build_fmap_pyramid floor-halves each level
    for lvl, f2p in enumerate(fmap2_pyramid_padded):
        if lvl > 0:
            Hl, Wl = Hl // 2, Wl // 2
        Hq = Hl + 2 * P
        quad = f2p.shape[1] == N_PHASES * Hq
        assert quad or f2p.shape[1] == Hq, (f2p.shape, Hl)
        lx = cx / (2.0 ** lvl)
        ly = cy / (2.0 ** lvl)
        lx = jnp.clip(lx, -(radius + 2.0), Wl - 1.0 + radius + 2.0)
        ly = jnp.clip(ly, -(radius + 2.0), Hl - 1.0 + radius + 2.0)
        fx = jnp.floor(lx)
        fy = jnp.floor(ly)
        wx = (lx - fx)[..., None]
        wy = (ly - fy)[..., None]
        if quad:
            # quad-phase: pick the x-shifted copy whose residual shift is
            # x0 mod SHIFT, so an ALIGN-aligned PATCH_W_QUAD fetch covers
            # the window; the copy index becomes a whole-level row jump
            PL = P + (N_PHASES - 1) * SHIFT
            x0 = (fx - radius).astype(jnp.int32) + PL
            y0 = (fy - radius).astype(jnp.int32) + P
            r = x0 % ALIGN
            c = r // SHIFT
            x0a = x0 - r                     # ALIGN-aligned in every copy
            dx = (r % SHIFT).astype(jnp.float32)[..., None]
            lvl_out = _lookup_level(f1, f2p, x0a, y0 + c * Hq, dx, wx, wy,
                                    radius, D, compute_dtype, interpret,
                                    patch_w=PATCH_W_QUAD)
        else:
            # top-left corner of the (K+1, K+1) window in PADDED coords
            x0 = (fx - radius).astype(jnp.int32) + P
            y0 = (fy - radius).astype(jnp.int32) + P
            if _resident_enabled() and f2p.size * f2p.dtype.itemsize \
                    <= _resident_max_bytes():
                lvl_out = _lookup_level_resident(
                    f1, f2p, x0.astype(jnp.float32), y0, wx, wy, radius, D,
                    compute_dtype, interpret)
            else:
                x0a = (x0 // ALIGN) * ALIGN
                dx = (x0 - x0a).astype(jnp.float32)[..., None]
                lvl_out = _lookup_level(f1, f2p, x0a, y0, dx, wx, wy,
                                        radius, D, compute_dtype, interpret)
        K = 2 * radius + 1
        outs.append(lvl_out.reshape(B, Np, K * K))
    out = jnp.concatenate(outs, axis=-1)
    return out[:, :N].reshape(B, H, W, -1)
