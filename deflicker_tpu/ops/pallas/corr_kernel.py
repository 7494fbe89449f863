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

# Group-shared band (DEFLICKER_CORR_SHARED=1) — MEASURED NEGATIVE, kept
# opt-in: quad halving the bytes bought only +10%, which round 5 first
# read as DMA ISSUE RATE (one descriptor per pixel per level, ~14.4k
# scalar-core issues per lookup).  This variant tested that hypothesis:
# the GROUP=8 pixels of a DMA round are raster-consecutive, so their
# windows cluster whenever the flow is locally smooth (ever tighter at
# higher pyramid levels where coords shrink by 2^l; 100% of groups on the
# real benchmark flow at EVERY level).  When a group's window spread fits
# a fixed envelope (x span <= RW - (K+1) - (SHIFT-1), y span <= R_SH -
# (K+1)), ONE (R_SH, RW) band from the quad copy of the group minimum
# covers all 8 windows: 8 descriptors collapse to 1 and per-pixel band
# bytes drop 2.5x vs quad.  Groups that don't fit (motion boundaries)
# fall back to the per-pixel quad fetch — host picks per group, the
# kernel branches with pl.when; window contents and bilinear weights are
# unchanged either way (outputs match to f32 reduction-order noise).
# The chip REFUTED the hypothesis: at 100% hit rate, 1/8th the
# descriptors and 0.4x the bytes measure 94.7 ms vs quad's 87.7 on the
# 20-lookup level-0 sequence — three body variants tried (interp-first
# per-pixel 101.7, contract-first per-pixel 94.7, fully-batched 122.5).
# Descriptor count is NOT the binding term; see DEFLICKER_CORR_RF /
# DEFLICKER_CORR_NBUF for where the remaining time actually lives.
# Layout: quad plus extra right slack for the wider band and R_SH+1-P
# extra bottom rows so a shared fetch at the max clamped y0 stays inside
# its copy.
R_SH = 16            # shared band rows: (K+1) window + y-span slack
RW_SH = 32           # shared band width: window + x-span + phase residual

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


def _shared_enabled() -> bool:
    import os

    return os.environ.get("DEFLICKER_CORR_SHARED", "0") == "1"


def _nbuf() -> int:
    """DEFLICKER_CORR_NBUF: DMA prefetch depth of `_level_kernel` (default
    2 = classic double buffering).  The corr_ab ladder (2x bytes -> +12%,
    2.2x less VPU -> +2.8%, 1/8 descriptors -> -8%) points at DMA LATENCY
    as the binding term — deeper prefetch (4) hides more of the
    round-trip at the cost of NBUF x ~655 KB VMEM slab."""
    import os

    return int(os.environ.get("DEFLICKER_CORR_NBUF", "2"))


def _reduce_first_enabled() -> bool:
    """Reduce-first body of `_level_kernel` (the DEFAULT;
    DEFLICKER_CORR_RF=0 reverts): run the feature contraction BEFORE the
    y-bilinear (they commute — both linear in the band), cutting the
    body's VPU work ~2.2x ((K+1)*PW*D contraction vs K*PW*D*3 interp +
    K*PW*D reduce).  Results match interp-first to f32 reduction order,
    not bitwise.  Measured +2.8% on the level-0 sequence (87.7 -> 85.3
    ms, bench_roofline corr_ab quad_rf_ms) — small because the lookup's
    remaining time is fixed per-invocation overhead, not VPU (NBUF=4
    prefetch depth measured a no-op, 85.6)."""
    import os

    return os.environ.get("DEFLICKER_CORR_RF", "1") != "0"


def _resident_max_bytes() -> int:
    import os

    mb = os.environ.get("DEFLICKER_CORR_RESIDENT_MAX_MB")
    return int(float(mb) * 1024 * 1024) if mb else RESIDENT_MAX_BYTES


def corr_pallas_available() -> bool:
    return _PALLAS_OK and jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _level_kernel(radius: int, true_d: int, compute_dtype, patch_w,
                  reduce_first, nbuf,
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

    # prefetch depth nbuf: groups [0, nbuf-1) in flight before the loop;
    # body g tops the pipeline up with group g + nbuf - 1
    for s in range(nbuf - 1):
        if s < n_groups:
            start_group(s, s)

    def body(g, _):
        slot = jax.lax.rem(g, nbuf)

        @pl.when(g + nbuf - 1 < n_groups)
        def _():
            start_group(jax.lax.rem(g + nbuf - 1, nbuf), g + nbuf - 1)

        wait_group(slot, g)

        i0 = g * GROUP
        band = slab[slot].astype(compute_dtype)    # (G, K+1, PATCH_W, D)
        wy = wy_ref[0, pl.ds(i0, GROUP), :]        # (G, 1)
        f1g = f1_ref[0, pl.ds(i0, GROUP), :].astype(compute_dtype)  # (G, D)
        if reduce_first:
            # feature contraction BEFORE the y-bilinear (they commute —
            # both linear in the band): ~2.2x less VPU work; matches the
            # interp-first order to f32 rounding
            z1 = jnp.sum(band * f1g[:, None, None, :],
                         axis=-1).astype(jnp.float32)  # (G, K+1, PATCH_W)
            wyv = wy[:, :, None].astype(jnp.float32)
            z = (1.0 - wyv) * z1[:, :K] + wyv * z1[:, 1:]
        else:
            wyv = wy[:, :, None, None].astype(compute_dtype)
            # y-bilinear with the shared fraction
            y = (1.0 - wyv) * band[:, :K] + wyv * band[:, 1:]

            # feature contraction: Z[g,q,k] = sum_d Y[g,q,k,d] * f1[g,d]
            # (VPU multiply + lane reduction — Mosaic rejects the 4D
            # batched dot_general form)
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


def _shared_kernel(radius: int, true_d: int, compute_dtype,
                   x0a_ref, y0f_ref, dxf_ref, dxp_ref, wx_ref, wy_ref,
                   dyp_ref, okg_ref, bsh_ref, gy0_ref, f1_ref, f2_ref,
                   out_ref, slab_fb, sems_fb, slab_sh, sems_sh, z_buf,
                   x0a_s, y0f_s, dyp_s, okg_s, bsh_s, gy0_s, idx_sems):
    """Group-shared-band variant of `_level_kernel` (quad+shared layout).

    Per GROUP of 8 raster-consecutive pixels the host decided (okg) whether
    one (R_SH, RW_SH) band from the quad copy of the group-min x0 covers
    all 8 windows.  okg groups ride ONE descriptor into slab_sh and each
    pixel slices its (K+1)-row strip at dyp (dynamic major-dim slice),
    contracting against its query feature BEFORE the y-bilinear (linear
    ops commute; ~2.2x less VPU work than interp-first).  !okg groups
    take the per-pixel quad fetch (x0a/y0f/dxf), identical to
    `_level_kernel`.  Window contents and bilinear weights are the same
    bytes either way — outputs match the quad path to f32
    reduction-order noise.

    Extra refs vs `_level_kernel`: dxp (1,CHUNK,1) f32 / dyp (1,CHUNK,1)
    int32 — per-pixel window offsets inside the shared band; okg/bsh/gy0
    (1,CHUNK//GROUP,1) int32 — per-group flag, aligned band column, band
    row (copy offset folded in).  Int vectors hop VMEM->SMEM for scalar
    DMA indexing as in `_level_kernel`."""
    K = 2 * radius + 1
    P1 = K + 1
    b = pl.program_id(0)
    inv_sqrt_d = 1.0 / (true_d ** 0.5)
    n_groups = CHUNK // GROUP

    stages = [(x0a_ref, x0a_s), (y0f_ref, y0f_s), (dyp_ref, dyp_s),
              (okg_ref, okg_s), (bsh_ref, bsh_s), (gy0_ref, gy0_s)]
    cps = [pltpu.make_async_copy(src, dst, idx_sems.at[i])
           for i, (src, dst) in enumerate(stages)]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    def dma_fb(slot, g, j):
        i = g * GROUP + j
        x0a = pl.multiple_of(x0a_s[0, i, 0], ALIGN)
        return pltpu.make_async_copy(
            f2_ref.at[b, pl.ds(y0f_s[0, i, 0], P1),
                      pl.ds(x0a, PATCH_W_QUAD), :],
            slab_fb.at[slot, j],
            sems_fb.at[slot, j],
        )

    def dma_sh(slot, g):
        bsh = pl.multiple_of(bsh_s[0, g, 0], ALIGN)
        return pltpu.make_async_copy(
            f2_ref.at[b, pl.ds(gy0_s[0, g, 0], R_SH),
                      pl.ds(bsh, RW_SH), :],
            slab_sh.at[slot],
            sems_sh.at[slot],
        )

    def start_group(slot, g):
        ok = okg_s[0, g, 0] == 1

        @pl.when(ok)
        def _():
            dma_sh(slot, g).start()

        @pl.when(jnp.logical_not(ok))
        def _():
            for j in range(GROUP):
                dma_fb(slot, g, j).start()

    def wait_group(slot, g):
        ok = okg_s[0, g, 0] == 1

        @pl.when(ok)
        def _():
            dma_sh(slot, g).wait()

        @pl.when(jnp.logical_not(ok))
        def _():
            for j in range(GROUP):
                dma_fb(slot, g, j).wait()

    def xsel_contract(z, dx_v, wx_v, patch_w):
        """x-selection + x-bilinear one-hot matmul (same math as
        `_level_kernel`): z (G, K, patch_w) f32 -> (G, K[x], K[y])."""
        dxi = dx_v[:, :, None].astype(jnp.int32)
        wx = wx_v[:, :, None].astype(jnp.float32)
        k_i = jax.lax.broadcasted_iota(jnp.int32, (patch_w, K), 0)[None]
        p_i = jax.lax.broadcasted_iota(jnp.int32, (patch_w, K), 1)[None]
        m0 = (k_i == dxi + p_i).astype(jnp.float32)
        m1 = (k_i == dxi + p_i + 1).astype(jnp.float32)
        xm = (1.0 - wx) * m0 + wx * m1
        return jax.lax.dot_general(
            xm, z, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    start_group(0, 0)

    def body(g, _):
        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < n_groups)
        def _():
            start_group(1 - slot, g + 1)

        wait_group(slot, g)

        i0 = g * GROUP
        ok = okg_s[0, g, 0] == 1
        f1g = f1_ref[0, pl.ds(i0, GROUP), :].astype(compute_dtype)  # (G, D)
        wxg = wx_ref[0, pl.ds(i0, GROUP), :]                        # (G, 1)
        wyg = wy_ref[0, pl.ds(i0, GROUP), :]

        @pl.when(ok)
        def _():
            # Per-pixel (K+1)-row strip out of the shared band at the
            # SMEM-staged dyp (dynamic major-dim slice), feature
            # contraction BEFORE the y-bilinear (they commute — both
            # linear in the band; ~2.2x less VPU work than interp-first).
            # Three shared bodies were measured on chip: interp-first
            # per-pixel 101.7 ms, THIS one 95.7 ms, fully-batched 16-row
            # contraction 122.5 ms (vs quad 87.7) — the contraction
            # volume, not the descriptor count, is what the lookup pays
            # for at these shapes.
            for j in range(GROUP):
                strip = slab_sh[slot, pl.ds(dyp_s[0, i0 + j, 0], P1)]
                strip = strip.astype(compute_dtype)      # (K+1, RW_SH, D)
                z_buf[j] = jnp.sum(strip * f1g[j][None, None, :],
                                   axis=-1).astype(jnp.float32)
            wyv = wyg[:, :, None].astype(jnp.float32)    # (G, 1, 1)
            z10 = z_buf[...]                             # (G, K+1, RW_SH)
            zy = (1.0 - wyv) * z10[:, :K] + wyv * z10[:, 1:]   # (G, K, RW)
            dxp = dxp_ref[0, pl.ds(i0, GROUP), :]
            corr = xsel_contract(zy, dxp, wxg, RW_SH)
            out_ref[0, pl.ds(i0, GROUP), :, :] = corr * inv_sqrt_d

        @pl.when(jnp.logical_not(ok))
        def _():
            # per-pixel quad bands: the `_level_kernel` batched body
            band = slab_fb[slot].astype(compute_dtype)
            wy = wyg[:, :, None, None].astype(compute_dtype)
            y = (1.0 - wy) * band[:, :K] + wy * band[:, 1:]
            z = jnp.sum(y * f1g[:, None, None, :],
                        axis=-1).astype(jnp.float32)  # (G, K, PATCH_W_QUAD)
            dxf = dxf_ref[0, pl.ds(i0, GROUP), :]
            corr = xsel_contract(z, dxf, wxg, PATCH_W_QUAD)
            out_ref[0, pl.ds(i0, GROUP), :, :] = corr * inv_sqrt_d

        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)


def _lookup_level_shared(fmap1_flat: jax.Array, f2_padded: jax.Array,
                         x0a: jax.Array, y0f: jax.Array, dxf: jax.Array,
                         dxp: jax.Array, wx: jax.Array, wy: jax.Array,
                         dyp: jax.Array, okg: jax.Array, bsh: jax.Array,
                         gy0: jax.Array, radius: int, true_d: int,
                         compute_dtype, interpret: bool) -> jax.Array:
    """Shared-band dispatch.  Per-pixel refs as `_lookup_level` plus the
    shared-band offsets (dxp f32, dyp int32) and per-group arrays
    (okg/bsh/gy0 int32, CHUNK//GROUP entries per chunk)."""
    B, Np, D = fmap1_flat.shape
    K = 2 * radius + 1
    n_chunks = Np // CHUNK
    ng = CHUNK // GROUP

    kern = functools.partial(_shared_kernel, radius, true_d, compute_dtype)
    pix = pl.BlockSpec((1, CHUNK, 1), lambda b, c: (b, c, 0),
                       memory_space=pltpu.VMEM)
    grp = pl.BlockSpec((1, ng, 1), lambda b, c: (b, c, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, n_chunks),
        in_specs=[
            pix,                                         # x0a
            pix,                                         # y0f
            pix,                                         # dxf
            pix,                                         # dxp
            pix,                                         # wx
            pix,                                         # wy
            pix,                                         # dyp
            grp,                                         # okg
            grp,                                         # bsh
            grp,                                         # gy0
            pl.BlockSpec((1, CHUNK, D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),       # fmap1
            pl.BlockSpec(memory_space=pltpu.HBM),        # padded level
        ],
        out_specs=pl.BlockSpec((1, CHUNK, K, K), lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, K, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, K + 1, PATCH_W_QUAD, D), f2_padded.dtype),
            pltpu.SemaphoreType.DMA((2, GROUP)),
            pltpu.VMEM((2, R_SH, RW_SH, D), f2_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((GROUP, K + 1, RW_SH), jnp.float32),
            pltpu.SMEM((1, CHUNK, 1), jnp.int32),
            pltpu.SMEM((1, CHUNK, 1), jnp.int32),
            pltpu.SMEM((1, CHUNK, 1), jnp.int32),
            pltpu.SMEM((1, ng, 1), jnp.int32),
            pltpu.SMEM((1, ng, 1), jnp.int32),
            pltpu.SMEM((1, ng, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(x0a[..., None], y0f[..., None], dxf, dxp, wx, wy, dyp[..., None],
      okg[..., None], bsh[..., None], gy0[..., None], fmap1_flat, f2_padded)


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

    nbuf = _nbuf()
    kern = functools.partial(_level_kernel, radius, true_d, compute_dtype,
                             patch_w, _reduce_first_enabled(), nbuf)
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
            pltpu.VMEM((nbuf, GROUP, K + 1, patch_w, D), f2_padded.dtype),
            pltpu.SemaphoreType.DMA((nbuf, GROUP)),
            pltpu.SMEM((1, CHUNK, 1), jnp.int32),
            pltpu.SMEM((1, CHUNK, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x0a[..., None], y0[..., None], dx, wx, wy, fmap1_flat, f2_padded)


def _quad_enabled() -> bool:
    import os

    return os.environ.get("DEFLICKER_CORR_QUAD", "1") != "0"


def _shared_extra_rows(radius: int) -> int:
    """Extra bottom rows the shared layout needs: a shared fetch reads
    R_SH rows from gy0 <= H + P + 1 (the max clamped window top), so the
    copy height must cover H + P + 1 + R_SH <= H + 2P + EXTRA."""
    P = 2 * radius + 3
    return max(0, R_SH + 1 - P)


def pad_fmap_pyramid(fmap2_pyramid: Sequence[jax.Array], radius: int = 4,
                     dtype=None, quad: "bool | None" = None,
                     shared: "bool | None" = None) -> Sequence[jax.Array]:
    """Zero-pad every level for the kernel (done once per flow solve,
    outside the GRU scan): P = 2r+3 on top/bottom/left; the right edge gets
    extra slack so an ALIGN-aligned PATCH_W-wide band never reads past the
    buffer; the lane dim is 128-aligned (Mosaic memref requirement — zero
    feature channels contribute nothing to the correlation dot).

    quad=True (default: DEFLICKER_CORR_QUAD env) emits the quad-phase
    layout instead: N_PHASES x-shifted copies of the padded level stacked
    along rows — copy c holds base columns [SHIFT*c, SHIFT*c + Wc).
    `corr_lookup_pallas` detects the layout from the row count.

    shared=True (DEFLICKER_CORR_SHARED env) emits the quad layout widened
    for the group-shared band: RW_SH right slack instead of PATCH_W_QUAD
    and `_shared_extra_rows` extra bottom rows per copy, so one (R_SH,
    RW_SH) group fetch at any legal window stays inside its copy."""
    if quad is None:
        quad = _quad_enabled()
    if shared is None:
        shared = _shared_enabled()
    P = 2 * radius + 3
    out = []
    for lvl in fmap2_pyramid:
        B, H, W, D = lvl.shape
        dpad = _round_up(D, 128) - D
        if quad or shared:
            # left pad grows by the maximum copy shift so x0 - SHIFT*c
            # never goes negative; copy width fits the rightmost aligned
            # PATCH_W_QUAD fetch (x0 <= W + 1 + PL)
            PL = P + (N_PHASES - 1) * SHIFT
            pw = RW_SH if shared else PATCH_W_QUAD
            eb = _shared_extra_rows(radius) if shared else 0
            Wc = _round_up(W + 1 + PL + pw, ALIGN)
            base = jnp.pad(lvl, ((0, 0), (P, P + eb),
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
    eb = _shared_extra_rows(radius)
    for lvl, f2p in enumerate(fmap2_pyramid_padded):
        if lvl > 0:
            Hl, Wl = Hl // 2, Wl // 2
        Hq = Hl + 2 * P
        shared = eb > 0 and f2p.shape[1] == N_PHASES * (Hq + eb)
        quad = f2p.shape[1] == N_PHASES * Hq
        assert shared or quad or f2p.shape[1] == Hq, (f2p.shape, Hl)
        lx = cx / (2.0 ** lvl)
        ly = cy / (2.0 ** lvl)
        lx = jnp.clip(lx, -(radius + 2.0), Wl - 1.0 + radius + 2.0)
        ly = jnp.clip(ly, -(radius + 2.0), Hl - 1.0 + radius + 2.0)
        fx = jnp.floor(lx)
        fy = jnp.floor(ly)
        wx = (lx - fx)[..., None]
        wy = (ly - fy)[..., None]
        if shared:
            # group-shared band over the widened quad layout: per-pixel
            # quad indices (the fallback) plus per-group shared-band
            # stats; the kernel branches per group on okg
            Hqs = Hq + eb
            PL = P + (N_PHASES - 1) * SHIFT
            K = 2 * radius + 1
            x0 = (fx - radius).astype(jnp.int32) + PL      # (B, Np)
            y0 = (fy - radius).astype(jnp.int32) + P
            # per-pixel quad fallback indices (as the quad branch)
            r = x0 % ALIGN
            c = r // SHIFT
            x0a = x0 - r
            dxf = (r % SHIFT).astype(jnp.float32)[..., None]
            y0f = y0 + c * Hqs
            # per-group shared band: copy + aligned column of the group
            # min; fits iff the x/y spans stay inside the envelope
            xg = x0.reshape(B, -1, GROUP)
            yg = y0.reshape(B, -1, GROUP)
            minx = xg.min(axis=-1)
            miny = yg.min(axis=-1)
            ok_x = (xg.max(axis=-1) - minx) <= (RW_SH - K - 1 - (SHIFT - 1))
            ok_y = (yg.max(axis=-1) - miny) <= (R_SH - K - 1)
            okg = (ok_x & ok_y).astype(jnp.int32)          # (B, NG)
            rmin = minx % ALIGN
            cg = rmin // SHIFT
            bsh = minx - rmin
            gy0 = miny + cg * Hqs
            rep = jnp.repeat(bsh + SHIFT * cg, GROUP, axis=1)
            dxp = jnp.clip(x0 - rep, 0, RW_SH - K - 1)
            dxp = dxp.astype(jnp.float32)[..., None]
            dyp = jnp.clip(y0 - jnp.repeat(miny, GROUP, axis=1),
                           0, R_SH - K - 1)
            lvl_out = _lookup_level_shared(
                f1, f2p, x0a, y0f, dxf, dxp, wx, wy, dyp, okg, bsh, gy0,
                radius, D, compute_dtype, interpret)
        elif quad:
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
