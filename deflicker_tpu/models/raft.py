"""RAFT optical flow, TPU-native (flax + XLA + lax.scan).

Re-design of the reference RAFT stack
(src/models/stage_1/core/{raft,extractor,update,corr}.py) for TPU:

  * NHWC layout throughout (TPU conv layout), params convertible 1:1 from a
    torch `raft-things.pth` checkpoint (see deflicker_tpu.flow.convert);
  * the 20-iteration GRU refinement is a `lax.scan` (one compile, no Python
    loop) — reference: raft.py:126-143;
  * the all-pairs correlation volume is one big MXU matmul + mean-pool
    pyramid (corr.py:56-64, :28-31); the (2r+1)^2 window lookup is a batched
    bilinear gather (corr.py:33-54) with a Pallas kernel slot (ops/pallas);
  * the convex-upsampling mask head runs once, on the final GRU state — the
    reference computes it every iteration and discards all but the last in
    test mode (raft.py:137-146), numerically identical;
  * mixed precision: convs/GRU accept a compute dtype (bfloat16 mirrors the
    reference's autocast regions, raft.py:103,114,131); the correlation
    volume and flow arithmetic stay float32 like the reference
    (raft.py:106-107).

Quirk replicated for checkpoint parity (corr.py:42-47): the reference builds
the lookup-window offset grid with `meshgrid(dy, dx)` but adds the first
component to x and the second to y; i.e. the 81 window channels enumerate the
X offset on the OUTER axis.  Channel k = p*(2r+1)+q samples
(x + off[p], y + off[q]).

Deliberate scope notes: the reference's RAFT-"small" variant
(extractor.py:195-267, update.py:16-31) and the `forward_interpolate`
warm-start (core/utils/utils.py:26-54) are dead in its pipeline
(raft_wrapper.py pins args.small=False and test mode never warm-starts),
so this framework implements only the large/test-mode path it actually runs.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.convex_upsample import convex_upsample_flow

CORR_LEVELS = 4
CORR_RADIUS = 4
HIDDEN_DIM = 128
CONTEXT_DIM = 128


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch nn.InstanceNorm2d default: per-(sample, channel) stats over H, W,
    no affine params (extractor.py norm_fn='instance' branches)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _conv(features: int, kernel: Tuple[int, int], stride: int = 1,
          padding: Tuple[int, int] = (0, 0), dtype=jnp.float32,
          name: str | None = None) -> nn.Conv:
    """Conv with explicit symmetric padding (torch Conv2d semantics — flax
    'SAME' disagrees with torch when stride > 1)."""
    return nn.Conv(features, kernel, strides=(stride, stride),
                   padding=(padding, padding) if isinstance(padding, int)
                   else (tuple(padding[:2]) if isinstance(padding[0], int)
                         else padding),
                   dtype=dtype, precision=jax.lax.Precision.HIGHEST,
                   name=name)


class Norm(nn.Module):
    """Dispatch over the reference's norm_fn choices ('instance' | 'batch' |
    'none'); batch norm always runs in eval mode with checkpoint running
    stats (inference-only framework)."""

    kind: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kind == "instance":
            return instance_norm(x)
        if self.kind == "batch":
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                dtype=self.dtype, name="bn")(x)
        if self.kind == "none":
            return x
        raise ValueError(f"unsupported norm kind: {self.kind}")


class ResidualBlock(nn.Module):
    """extractor.py:6-57 (3x3-3x3 residual block, optional strided 1x1
    downsample path)."""

    planes: int
    norm_fn: str
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = _conv(self.planes, (3, 3), self.stride, (1, 1), self.dtype,
                  name="conv1")(x)
        y = nn.relu(Norm(self.norm_fn, self.dtype, name="norm1")(y))
        y = _conv(self.planes, (3, 3), 1, (1, 1), self.dtype, name="conv2")(y)
        y = nn.relu(Norm(self.norm_fn, self.dtype, name="norm2")(y))
        if self.stride != 1:
            x = _conv(self.planes, (1, 1), self.stride, (0, 0), self.dtype,
                      name="downsample_conv")(x)
            x = Norm(self.norm_fn, self.dtype, name="norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """extractor.py:118-192: 7x7/2 stem + 6 residual blocks + 1x1 head,
    1/8 resolution output."""

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _conv(64, (7, 7), 2, (3, 3), self.dtype, name="conv1")(x)
        x = nn.relu(Norm(self.norm_fn, self.dtype, name="norm1")(x))
        for li, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)], 1):
            x = ResidualBlock(dim, self.norm_fn, stride, self.dtype,
                              name=f"layer{li}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, self.dtype,
                              name=f"layer{li}_1")(x)
        return _conv(self.output_dim, (1, 1), 1, (0, 0), self.dtype,
                     name="conv2")(x)


class BasicMotionEncoder(nn.Module):
    """update.py:79-97."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        d = self.dtype
        cor = nn.relu(_conv(256, (1, 1), 1, (0, 0), d, name="convc1")(corr))
        cor = nn.relu(_conv(192, (3, 3), 1, (1, 1), d, name="convc2")(cor))
        flo = nn.relu(_conv(128, (7, 7), 1, (3, 3), d, name="convf1")(flow))
        flo = nn.relu(_conv(64, (3, 3), 1, (1, 1), d, name="convf2")(flo))
        out = nn.relu(_conv(126, (3, 3), 1, (1, 1), d, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class SepConvGRU(nn.Module):
    """update.py:33-60: separable (1,5)+(5,1) gated GRU."""

    hidden_dim: int = HIDDEN_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        d = self.dtype
        for suffix, kern, pad in (("1", (1, 5), ((0, 0), (2, 2))),
                                  ("2", (5, 1), ((2, 2), (0, 0)))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(_conv(self.hidden_dim, kern, 1, pad, d,
                                 name=f"convz{suffix}")(hx))
            r = nn.sigmoid(_conv(self.hidden_dim, kern, 1, pad, d,
                                 name=f"convr{suffix}")(hx))
            q = jnp.tanh(_conv(self.hidden_dim, kern, 1, pad, d,
                               name=f"convq{suffix}")(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1.0 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    """update.py:6-14."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_conv(256, (3, 3), 1, (1, 1), self.dtype, name="conv1")(x))
        return _conv(2, (3, 3), 1, (1, 1), self.dtype, name="conv2")(x)


class BasicUpdateBlock(nn.Module):
    """update.py:114-139, with the mask head exposed separately so the
    driver can run it once on the final GRU state."""

    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = BasicMotionEncoder(self.dtype)
        self.gru = SepConvGRU(HIDDEN_DIM, self.dtype)
        self.flow_head = FlowHead(self.dtype)
        # torch names these mask.0 / mask.2 (Sequential indices, update.py:119-122)
        self.mask_0 = _conv(256, (3, 3), 1, (1, 1), self.dtype)
        self.mask_2 = _conv(64 * 9, (1, 1), 1, (0, 0), self.dtype)

    def __call__(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        net = self.gru(net, jnp.concatenate([inp, motion], axis=-1))
        delta_flow = self.flow_head(net)
        return net, delta_flow

    def mask_head(self, net):
        # ".25 * mask to balance gradients" (update.py:136-137)
        return 0.25 * self.mask_2(nn.relu(self.mask_0(net)))


class RAFTModules(nn.Module):
    """The three learned components; mirrors raft.py:58-60 (full-size config:
    fnet instance-norm, cnet batch-norm, hdim = cdim = 128)."""

    dtype: Any = jnp.float32

    def setup(self):
        self.fnet = BasicEncoder(256, "instance", self.dtype)
        self.cnet = BasicEncoder(HIDDEN_DIM + CONTEXT_DIM, "batch", self.dtype)
        self.update_block = BasicUpdateBlock(self.dtype)

    def __call__(self, image1, image2):  # only used for init
        f1 = self.fnet(image1)
        c = self.cnet(image1)
        net = jnp.tanh(c[..., :HIDDEN_DIM])
        inp = nn.relu(c[..., HIDDEN_DIM:])
        B, H, W, _ = f1.shape
        corr = jnp.zeros((B, H, W, CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2),
                         self.dtype)
        flow = jnp.zeros((B, H, W, 2), jnp.float32)
        net, delta = self.update_block(net, inp, corr, flow)
        return self.update_block.mask_head(net), delta


# ---------------------------------------------------------------------------
# correlation pyramid (functional)
# ---------------------------------------------------------------------------

def build_corr_pyramid(fmap1: jax.Array, fmap2: jax.Array,
                       num_levels: int = CORR_LEVELS) -> Sequence[jax.Array]:
    """All-pairs correlation + mean-pool pyramid (corr.py:16-31,56-64).

    fmap1/fmap2: (B, H, W, D) float32.  Returns [(B*H*W, H_l, W_l)] levels.
    """
    B, H, W, D = fmap1.shape
    f1 = fmap1.reshape(B, H * W, D)
    f2 = fmap2.reshape(B, H * W, D)
    corr = jnp.einsum("bnd,bmd->bnm", f1, f2,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    corr = corr / jnp.sqrt(jnp.float32(D))
    corr = corr.reshape(B * H * W, H, W)

    pyramid = [corr]
    for _ in range(num_levels - 1):
        c = pyramid[-1]
        # avg_pool2d(2, stride 2): floor semantics — drop odd trailing row/col
        h2, w2 = (c.shape[1] // 2) * 2, (c.shape[2] // 2) * 2
        c = c[:, :h2, :w2]
        c = c.reshape(c.shape[0], h2 // 2, 2, w2 // 2, 2).mean(axis=(2, 4))
        pyramid.append(c)
    return pyramid


def _bilinear_gather(vol: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """vol: (N, H, W); xs/ys: (N, K) pixel coords.  Zero padding outside.
    Batched form of ops.sampling.bilinear_sample."""
    N, H, W = vol.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = vol.reshape(N, H * W)

    def g(iy, ix):
        valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        return jnp.where(valid, jnp.take_along_axis(flat, idx, axis=1), 0.0)

    v00 = g(y0i, x0i)
    v01 = g(y0i, x0i + 1)
    v10 = g(y0i + 1, x0i)
    v11 = g(y0i + 1, x0i + 1)
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def corr_lookup(pyramid: Sequence[jax.Array], coords: jax.Array,
                radius: int = CORR_RADIUS) -> jax.Array:
    """Sample the (2r+1)^2 window around per-pixel coords at every level
    (corr.py:33-54).  coords: (B, H, W, 2) (x, y).  Returns
    (B, H, W, levels*(2r+1)^2) float32 with the reference's channel order
    (x-offset outer — see module docstring)."""
    B, H, W, _ = coords.shape
    N = B * H * W
    K = 2 * radius + 1
    off = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    off_x = jnp.repeat(off, K)   # outer axis: x offset  (channel p*(2r+1)+q)
    off_y = jnp.tile(off, K)     # inner axis: y offset

    cx = coords[..., 0].reshape(N, 1)
    cy = coords[..., 1].reshape(N, 1)
    out = []
    for i, vol in enumerate(pyramid):
        xs = cx / (2.0 ** i) + off_x[None, :]
        ys = cy / (2.0 ** i) + off_y[None, :]
        out.append(_bilinear_gather(vol, xs, ys))
    return jnp.concatenate(out, axis=-1).reshape(B, H, W, len(pyramid) * K * K)


def build_fmap_pyramid(fmap2: jax.Array,
                       num_levels: int = CORR_LEVELS) -> Sequence[jax.Array]:
    """Mean-pool pyramid of fmap2 for the ONLINE corr path (B, H_l, W_l, D).

    mean-pooling features then dotting == pooling the correlation volume
    (linearity), so this reproduces `build_corr_pyramid` + lookup without
    ever materializing the (H*W)^2 volume — the reference's
    AlternateCorrBlock role (corr.py:67-95, the optional alt_cuda_corr CUDA
    extension), re-expressed for XLA.
    """
    pyr = [fmap2]
    for _ in range(num_levels - 1):
        f = pyr[-1]
        h2, w2 = (f.shape[1] // 2) * 2, (f.shape[2] // 2) * 2
        f = f[:, :h2, :w2]
        f = f.reshape(f.shape[0], h2 // 2, 2, w2 // 2, 2,
                      f.shape[-1]).mean(axis=(2, 4))
        pyr.append(f)
    return pyr


def _bilinear_feature_gather(vol: jax.Array, xs: jax.Array,
                             ys: jax.Array) -> jax.Array:
    """vol (H, W, D); xs/ys (C, K) -> (C, K, D), zeros outside."""
    H, W, D = vol.shape
    flat = vol.reshape(H * W, D)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def g(iy, ix):
        valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        return jnp.where(valid[..., None], flat[idx.reshape(-1)].reshape(
            idx.shape + (D,)), 0.0)

    v00 = g(y0i, x0i)
    v01 = g(y0i, x0i + 1)
    v10 = g(y0i + 1, x0i)
    v11 = g(y0i + 1, x0i + 1)
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def corr_lookup_online(fmap1: jax.Array, fmap2_pyramid: Sequence[jax.Array],
                       coords: jax.Array, radius: int = CORR_RADIUS,
                       chunk: int = 2048) -> jax.Array:
    """Window correlation computed on the fly (no materialized volume).

    Numerically equivalent to `build_corr_pyramid` + `corr_lookup` (same
    channel order); O(H*W * 81 * D) work per level but only
    O(chunk * 81 * D) live memory — pixel chunks stream through `lax.map`.
    Use when (H*W/64)^2 won't fit HBM (long-edge ~2000px inputs).
    """
    B, H, W, D = fmap1.shape
    K = 2 * radius + 1
    off = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    off_x = jnp.repeat(off, K)
    off_y = jnp.tile(off, K)
    inv_sqrt_d = 1.0 / jnp.sqrt(jnp.float32(D))

    N = H * W
    pad = (-N) % chunk
    n_chunks = (N + pad) // chunk

    def per_pair(f1, cx, cy, *pyr_b):
        """One batch element: (N, D) features + (N,) coords + per-level
        volumes.  vmapped over B below — one chunk graph total, where a
        Python loop over B would unroll B copies of it."""
        if pad:
            f1 = jnp.pad(f1, ((0, pad), (0, 0)))
            cx = jnp.pad(cx, (0, pad))
            cy = jnp.pad(cy, (0, pad))
        f1c = f1.reshape(n_chunks, chunk, D)
        cxc = cx.reshape(n_chunks, chunk)
        cyc = cy.reshape(n_chunks, chunk)

        def one_chunk(args):
            f1_, cx_, cy_ = args
            lvls = []
            for l, vol in enumerate(pyr_b):
                xs = cx_[:, None] / (2.0 ** l) + off_x[None, :]
                ys = cy_[:, None] / (2.0 ** l) + off_y[None, :]
                feats = _bilinear_feature_gather(vol, xs, ys)  # (C, K2, D)
                lvls.append(jnp.einsum("ckd,cd->ck", feats, f1_,
                                       preferred_element_type=jnp.float32)
                            * inv_sqrt_d)
            return jnp.concatenate(lvls, axis=-1)

        corr = jax.lax.map(one_chunk, (f1c, cxc, cyc))
        return corr.reshape(n_chunks * chunk, -1)[:N].reshape(H, W, -1)

    return jax.vmap(per_pair)(fmap1.reshape(B, N, D),
                              coords[..., 0].reshape(B, N),
                              coords[..., 1].reshape(B, N),
                              *fmap2_pyramid)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("iters", "dtype", "corr_mode", "mesh"))
def raft_flow(variables: Dict, image1: jax.Array, image2: jax.Array,
              iters: int = 20, dtype=jnp.float32, corr_mode: str = "auto",
              mesh=None) -> Tuple[jax.Array, jax.Array]:
    """Estimate flow image1 -> image2 (raft.py:93-146, test_mode semantics).

    image1/image2: (B, H, W, 3) in [0, 255], H and W divisible by 8.
    Returns (flow_low (B, H/8, W/8, 2), flow_up (B, H, W, 2)).

    corr_mode: 'materialized' = all-pairs volume + pyramid (one big MXU
    matmul, HBM-heavy); 'online' = window correlation on the fly via XLA
    gathers (AlternateCorrBlock role — O(HW*81*D) compute, tiny memory);
    'pallas' = the patch-DMA Pallas kernel (ops/pallas/corr_kernel.py),
    same memory profile as online with contiguous DMA instead of row
    gathers; 'auto' picks materialized while the pyramid fits (~2 GB),
    else pallas on TPU / online elsewhere.

    With a mesh, the pair batch B shards over the data axis via
    `shard_map` — frame pairs are independent, so each device runs the
    whole single-device computation (INCLUDING the Pallas corr kernel,
    which plain SPMD could not partition) on its local B/n_devices pairs,
    with params replicated and zero collectives.
    """
    if mesh is not None and mesh.size > 1:
        try:
            from jax import shard_map
        except ImportError:                       # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel import DATA_AXIS

        assert image1.shape[0] % mesh.size == 0, (
            f"pair batch {image1.shape[0]} not divisible by mesh size "
            f"{mesh.size} (flow engine pads the batch)")
        fn = functools.partial(_raft_flow_local, iters=iters, dtype=dtype,
                               corr_mode=corr_mode)
        import inspect

        relax = ("check_vma" if "check_vma"
                 in inspect.signature(shard_map).parameters else "check_rep")
        return shard_map(fn, mesh=mesh,
                         in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                         out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                         **{relax: False})(variables, image1, image2)
    return _raft_flow_local(variables, image1, image2, iters=iters,
                            dtype=dtype, corr_mode=corr_mode)


def _raft_flow_local(variables: Dict, image1: jax.Array, image2: jax.Array,
                     *, iters: int, dtype, corr_mode: str
                     ) -> Tuple[jax.Array, jax.Array]:
    """Single-device RAFT forward (the shard_map body; see raft_flow)."""
    model = RAFTModules(dtype=dtype)
    im1 = (2.0 * (image1 / 255.0) - 1.0).astype(dtype)
    im2 = (2.0 * (image2 / 255.0) - 1.0).astype(dtype)

    apply = functools.partial(model.apply, variables)
    # batch the two images through fnet like the reference's list path
    # (extractor.py:170-191)
    fmaps = apply(jnp.concatenate([im1, im2], axis=0),
                  method=lambda m, x: m.fnet(x)).astype(jnp.float32)
    B = im1.shape[0]
    fmap1, fmap2 = fmaps[:B], fmaps[B:]

    n_pix = (image1.shape[1] // 8) * (image1.shape[2] // 8)
    if corr_mode == "auto":
        from ..ops.pallas.corr_kernel import corr_pallas_available

        if corr_pallas_available():
            # measured on v5e (BENCH_E2E.json 'corr'): the patch-DMA kernel
            # beats the materialized volume ~10x at 45x80 and ~15x at
            # 90x160, and is the only mode that scales to long-edge-2000
            # inputs — unconditional default on TPU (this body is always
            # per-device: raft_flow shard_maps it under a mesh)
            corr_mode = "pallas"
        else:
            volume_bytes = B * n_pix * n_pix * 4 * 1.34   # pyr ~ 4/3 lvl 0
            corr_mode = "online" if volume_bytes > 2e9 else "materialized"
    if corr_mode == "materialized":
        pyramid = build_corr_pyramid(fmap1, fmap2)
        lookup = lambda coords: corr_lookup(pyramid, coords)
    elif corr_mode == "pallas":
        from ..ops.pallas.corr_kernel import (corr_lookup_pallas,
                                              pad_fmap_pyramid)

        # bf16 patch storage: halves the per-pixel DMA, within bf16
        # tolerance of the f32 gather path (tests/test_pallas_corr.py)
        padded = pad_fmap_pyramid(build_fmap_pyramid(fmap2),
                                  dtype=jnp.bfloat16)
        lookup = lambda coords: corr_lookup_pallas(fmap1, padded, coords)
    else:
        fpyr = build_fmap_pyramid(fmap2)
        lookup = lambda coords: corr_lookup_online(fmap1, fpyr, coords)

    cnet = apply(im1, method=lambda m, x: m.cnet(x))
    net = jnp.tanh(cnet[..., :HIDDEN_DIM])
    inp = nn.relu(cnet[..., HIDDEN_DIM:])

    _, H8, W8, _ = fmap1.shape
    ys, xs = jnp.meshgrid(jnp.arange(H8, dtype=jnp.float32),
                          jnp.arange(W8, dtype=jnp.float32), indexing="ij")
    coords0 = jnp.broadcast_to(jnp.stack([xs, ys], axis=-1)[None],
                               (B, H8, W8, 2))

    def step(carry, _):
        net, coords1 = carry
        corr = lookup(jax.lax.stop_gradient(coords1))
        flow = coords1 - coords0
        net, delta = apply(net, inp, corr.astype(dtype), flow.astype(dtype),
                           method=lambda m, *a: m.update_block(*a))
        coords1 = coords1 + delta.astype(jnp.float32)
        return (net, coords1), None

    (net, coords1), _ = jax.lax.scan(step, (net, coords0), None, length=iters)

    flow_low = coords1 - coords0
    up_mask = apply(net, method=lambda m, x: m.update_block.mask_head(x))
    flow_up = convex_upsample_flow(flow_low, up_mask.astype(jnp.float32),
                                   factor=8)
    return flow_low, flow_up


def raft_init(key: jax.Array, dtype=jnp.float32,
              image_hw: Tuple[int, int] = (64, 64)) -> Dict:
    """Random-init RAFT variables ({'params', 'batch_stats'})."""
    H, W = image_hw
    model = RAFTModules(dtype=dtype)
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    return model.init(key, dummy, dummy)
