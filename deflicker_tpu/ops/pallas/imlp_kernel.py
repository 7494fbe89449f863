"""Pallas TPU kernel: fused IMLP linear-relu chain (forward + custom VJP).

The stage-1 fit step is the pipeline's dominant hot loop (SURVEY.md §3.1
HOT LOOP 4): ~9 batched coordinate variants × a 6-8 layer 256-wide MLP,
forward and backward, every iteration.  Under plain XLA each layer boundary
round-trips the (B, 256) activation through HBM — at B≈90k that's ~90 MB
per boundary, making the step HBM-bandwidth-bound (the matmul FLOPs would
take ~¼ of the time the HBM traffic does).

This kernel runs the ENTIRE linear-relu chain over a batch tile while all
layer weights stay resident in VMEM (≤ ~2.5 MB for the largest IMLP):
activations never leave VMEM between layers, so HBM traffic collapses to
one read of the input and one write of the output per tile.  The backward
kernel re-materializes the forward per tile (classic remat: recompute is
MXU-cheap, storage is what hurts) and accumulates dW/db across the
sequential TPU grid in VMEM scratch.

Semantics match `models.imlp.imlp_apply` for the chain part:
  * layer i>0 applies relu BEFORE its matmul;
  * skip layers concatenate the stop-gradient'ed encoded input
    (the reference's `input = x.detach().clone()` quirk,
    implicit_neural_networks.py:69-75) — the backward kernel therefore
    DROPS the gradient flowing into the skip branch;
  * output is PRE-tanh: the caller applies tanh/softmax (XLA fuses those
    into the surrounding loss graph).

Positional encoding also stays outside: it is a handful of VPU
transcendentals XLA fuses into the gather that produces the coordinates.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:                                    # pragma: no cover
    _PALLAS_OK = False

from ...models.imlp import IMLPSpec

_PREC = jax.lax.Precision.HIGHEST


def _prec_for(cdt):
    """Mosaic rejects an fp32 contract-precision attribute on bf16 operands
    ('Bad lhs type'); bf16 inputs with f32 preferred_element_type already
    accumulate in f32, so default precision is exact there."""
    return _PREC if cdt == jnp.float32 else jax.lax.Precision.DEFAULT


def _dot_tl(a, b, cdt):
    """aᵀ @ b WITHOUT an explicit transpose: dot_general contracting dim 0
    of both operands feeds the MXU transposed directly (the jnp.dot(a.T, b)
    spelling materializes a (N, tile) transpose first — a real VPU pass per
    layer per tile in the backward)."""
    return jax.lax.dot_general(a.astype(cdt), b.astype(cdt),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_prec_for(cdt))


def _dot_tr(a, b, cdt):
    """a @ bᵀ without an explicit transpose (contract dim 1 with dim 1)."""
    return jax.lax.dot_general(a.astype(cdt), b.astype(cdt),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_prec_for(cdt))


def fused_imlp_available() -> bool:
    return _PALLAS_OK and jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _layer_fwd(spec, i, h, x, W, b, cdt, v2):
    """One layer's matmul(+bias), with the skip-input concat either
    materialized (v1) or algebraically split into two matmuls (v2:
    dot([h, x], W) == dot(h, W[:d]) + dot(x, W[d:]) — no (tile, d+E)
    concat buffer; float-equal up to one extra partial-sum rounding)."""
    if i in spec.skip_layers:
        if v2:
            d_h = h.shape[1]
            return (jnp.dot(h.astype(cdt), W[:d_h].astype(cdt),
                            preferred_element_type=jnp.float32,
                            precision=_prec_for(cdt))
                    + jnp.dot(x.astype(cdt), W[d_h:].astype(cdt),
                              preferred_element_type=jnp.float32,
                              precision=_prec_for(cdt)) + b)
        h = jnp.concatenate([h, x], axis=-1)
    return jnp.dot(h.astype(cdt), W.astype(cdt),
                   preferred_element_type=jnp.float32,
                   precision=_prec_for(cdt)) + b


def _fwd_kernel(spec: IMLPSpec, n_layers: int, cdt, v2, *refs):
    """refs = [x_ref, W0, b0, W1, b1, ..., out_ref].  cdt = multiply dtype
    (f32 -> full precision; bf16 -> 4x MXU rate, f32 accumulation)."""
    x_ref = refs[0]
    out_ref = refs[1 + 2 * n_layers]
    x = x_ref[...]
    h = x
    for i in range(n_layers):
        W = refs[1 + 2 * i][...]
        b = refs[2 + 2 * i][...]
        if i > 0:
            h = jnp.maximum(h, 0.0)
        h = _layer_fwd(spec, i, h, x, W, b, cdt, v2)
    out_ref[...] = h


def _bwd_kernel(spec: IMLPSpec, n_layers: int, cdt, v2, *refs):
    """refs = [x_ref, W0, b0, ..., g_ref]  +  outputs [dx_ref, dW0, db0, ...].

    Recomputes the forward for the tile, then reverse-accumulates.  dW/db
    accumulate DIRECTLY in the output blocks (constant index map -> the
    block stays VMEM-resident across the sequential TPU grid; a separate
    scratch copy would double that footprint).  The stash holds each
    layer's post-relu PRE-concat activation — layer 0's input is `x`
    itself and skip concats are rebuilt from the resident `x`, so neither
    is stored twice.  These three cuts (~2.5-3 MB on the 8-layer MLPs)
    are what let the dual-atlas fit run batch tile 1536 inside the 16 MB
    VMEM budget (round-2 capped it at 1024).
    """
    n_in = 2 + 2 * n_layers                 # x, (W, b)*, g
    x_ref = refs[0]
    g_ref = refs[n_in - 1]
    outs = refs[n_in:n_in + 1 + 2 * n_layers]

    x = x_ref[...]
    xc = x.astype(cdt)
    # forward, stashing post-relu/pre-concat activations in the compute
    # dtype (feeds bf16 dW matmuls + sign-exact relu masks only)
    h = x
    stash = [None] * n_layers               # layer 0 reuses x
    for i in range(n_layers):
        W = refs[1 + 2 * i][...]
        b = refs[2 + 2 * i][...]
        if i > 0:
            h = jnp.maximum(h, 0.0)
            stash[i] = h.astype(cdt)
        h = _layer_fwd(spec, i, h, x, W, b, cdt, v2)

    outs[0][...] = _reverse_pass(spec, n_layers, cdt, v2, refs[1:], outs,
                                 xc, stash, g_ref[...])


def _reverse_pass(spec: IMLPSpec, n_layers: int, cdt, v2, w_refs, outs,
                  xc, stash, g):
    """Shared reverse accumulation: given post-relu/pre-concat activations
    `stash` (stash[0] unused — layer 0 reads `xc`), walk the chain backward
    and accumulate dW/db into the output blocks.

    v2 replaces every transposed operand with a native-contraction
    dot_general (_dot_tl/_dot_tr — no materialized transposes) and splits
    the skip layers' dW into two matmuls, which also lets the dropped skip
    branch's input gradient never be computed at all (the v1 path computes
    the full (tile, d+E) gradient and slices it away)."""
    is_first = pl.program_id(0) == 0
    dx = None
    for i in reversed(range(n_layers)):
        W = w_refs[2 * i][...]
        db = jnp.sum(g, axis=0, keepdims=True)
        if v2:
            if i == 0:
                a_h = xc
            elif i in spec.skip_layers:
                a_h = stash[i]
                d_h = a_h.shape[1]
                # dot([a_h, x]ᵀ, g) == [dot(a_hᵀ, g); dot(xᵀ, g)] exactly
                # (independent output rows — no partial-sum split)
                dW = jnp.concatenate([_dot_tl(a_h, g, cdt),
                                      _dot_tl(xc, g, cdt)], axis=0)
            else:
                a_h = stash[i]
            if i not in spec.skip_layers:
                dW = _dot_tl(a_h, g, cdt)
            # stop_gradient skip semantics: backprop only through W's
            # kept-branch rows — the dropped branch's gradient is never
            # computed (v1 computes it and slices it away)
            Wk = W[:a_h.shape[1]] if i in spec.skip_layers else W
            g = _dot_tr(g, Wk, cdt)
        else:
            if i == 0:
                a_in = xc
            elif i in spec.skip_layers:
                a_in = jnp.concatenate([stash[i], xc], axis=-1)
            else:
                a_in = stash[i]
            dW = jnp.dot(a_in.T.astype(cdt), g.astype(cdt),
                         preferred_element_type=jnp.float32,
                         precision=_prec_for(cdt))
            g = jnp.dot(g.astype(cdt), W.T.astype(cdt),
                        preferred_element_type=jnp.float32,
                        precision=_prec_for(cdt))
            if i in spec.skip_layers:
                # drop the skip branch's gradient (stop_gradient semantics)
                g = g[:, :stash[i].shape[1]]
        if i > 0:
            # relu mask wrt the PRE-relu activation: the stash is
            # post-relu, so mask = stash > 0 (f32 compare — Mosaic lacks
            # bf16 cmpf on this target; sign is cast-exact)
            g = g * (stash[i].astype(jnp.float32) > 0.0)
        else:
            dx = g

        aW, ab = outs[1 + 2 * i], outs[2 + 2 * i]

        @pl.when(is_first)
        def _():
            aW[...] = dW
            ab[...] = db

        @pl.when(jnp.logical_not(is_first))
        def _():
            aW[...] += dW
            ab[...] += db

    return dx


def _fwd_kernel_pipe(spec: IMLPSpec, n_layers: int, cdt, v2, *refs):
    """Software-pipelined forward (the production default;
    DEFLICKER_IMLP_PIPE=0 reverts): the batch tile is split into two half-tiles
    whose layer chains are INTERLEAVED in program order — half B's VPU
    work (relu) sits between half A's matmul and half B's matmul, giving
    Mosaic's scheduler two independent dependency chains so one half's
    VPU ops can overlap the other half's MXU issue.  Numerics: identical
    chain per half; tile padding guarantees an even split."""
    x_ref = refs[0]
    out_ref = refs[1 + 2 * n_layers]
    x = x_ref[...]
    half = x.shape[0] // 2
    xa, xb = x[:half], x[half:]
    ha, hb = xa, xb
    for i in range(n_layers):
        W = refs[1 + 2 * i][...]
        b = refs[2 + 2 * i][...]
        if i > 0:
            ha = jnp.maximum(ha, 0.0)
        za = _layer_fwd(spec, i, ha, xa, W, b, cdt, v2)
        if i > 0:
            hb = jnp.maximum(hb, 0.0)
        zb = _layer_fwd(spec, i, hb, xb, W, b, cdt, v2)
        ha, hb = za, zb
    out_ref[:half, :] = ha
    out_ref[half:, :] = hb


def _bwd_kernel_pipe(spec: IMLPSpec, n_layers: int, cdt, v2, *refs):
    """Pipelined remat backward: recompute + reverse both walk the two
    half-tiles interleaved.  dW/db for a layer are the SUM of the two
    halves' half-sized contractions (two extra f32 adds per layer vs the
    full-tile body; float-equal up to partial-sum regrouping)."""
    n_in = 2 + 2 * n_layers
    x_ref = refs[0]
    g_ref = refs[n_in - 1]
    outs = refs[n_in:n_in + 1 + 2 * n_layers]

    x = x_ref[...]
    half = x.shape[0] // 2
    xa, xb = x[:half], x[half:]
    xca, xcb = xa.astype(cdt), xb.astype(cdt)
    ha, hb = xa, xb
    stash_a = [None] * n_layers
    stash_b = [None] * n_layers
    for i in range(n_layers):
        W = refs[1 + 2 * i][...]
        b = refs[2 + 2 * i][...]
        if i > 0:
            ha = jnp.maximum(ha, 0.0)
            stash_a[i] = ha.astype(cdt)
        za = _layer_fwd(spec, i, ha, xa, W, b, cdt, v2)
        if i > 0:
            hb = jnp.maximum(hb, 0.0)
            stash_b[i] = hb.astype(cdt)
        zb = _layer_fwd(spec, i, hb, xb, W, b, cdt, v2)
        ha, hb = za, zb

    g = g_ref[...]
    ga, gb = g[:half], g[half:]
    is_first = pl.program_id(0) == 0
    for i in reversed(range(n_layers)):
        W = refs[1 + 2 * i][...]
        db = jnp.sum(ga, axis=0, keepdims=True) \
            + jnp.sum(gb, axis=0, keepdims=True)
        a_ha = xca if i == 0 else stash_a[i]
        a_hb = xcb if i == 0 else stash_b[i]
        if i in spec.skip_layers:
            dW = jnp.concatenate(
                [_dot_tl(a_ha, ga, cdt) + _dot_tl(a_hb, gb, cdt),
                 _dot_tl(xca, ga, cdt) + _dot_tl(xcb, gb, cdt)], axis=0)
            Wk = W[:a_ha.shape[1]]
        else:
            dW = _dot_tl(a_ha, ga, cdt) + _dot_tl(a_hb, gb, cdt)
            Wk = W
        ga = _dot_tr(ga, Wk, cdt)
        gb = _dot_tr(gb, Wk, cdt)
        if i > 0:
            ga = ga * (stash_a[i].astype(jnp.float32) > 0.0)
            gb = gb * (stash_b[i].astype(jnp.float32) > 0.0)

        aW, ab = outs[1 + 2 * i], outs[2 + 2 * i]

        @pl.when(is_first)
        def _():
            aW[...] = dW
            ab[...] = db

        @pl.when(jnp.logical_not(is_first))
        def _():
            aW[...] += dW
            ab[...] += db

    outs[0][:half, :] = ga
    outs[0][half:, :] = gb


def _fwd_kernel_stash(spec: IMLPSpec, n_layers: int, cdt, v2, *refs):
    """Forward that additionally WRITES the backward's activation stash to
    HBM: refs = [x, (W, b)*n, out, s1..s_{n-1}].  The chain itself is
    numerically identical to `_fwd_kernel` (f32 accumulators carry layer
    to layer); the stash holds the same cdt cast the remat backward makes,
    so stash-mode gradients match remat-mode gradients exactly."""
    x_ref = refs[0]
    out_ref = refs[1 + 2 * n_layers]
    stash_refs = refs[2 + 2 * n_layers:]
    x = x_ref[...]
    h = x
    for i in range(n_layers):
        W = refs[1 + 2 * i][...]
        b = refs[2 + 2 * i][...]
        if i > 0:
            h = jnp.maximum(h, 0.0)
            stash_refs[i - 1][...] = h.astype(cdt)
        h = _layer_fwd(spec, i, h, x, W, b, cdt, v2)
    out_ref[...] = h


def _bwd_kernel_stash(spec: IMLPSpec, n_layers: int, cdt, v2, *refs):
    """Backward that READS the forward's stashed activations instead of
    recomputing the chain (trades ~n_layers tile-matmuls of recompute for
    streaming the stash back through VMEM): refs = [x, (W, b)*n, g,
    s1..s_{n-1}] + outputs [dx, (dW, db)*n]."""
    n_in = 2 + 2 * n_layers + (n_layers - 1)
    x_ref = refs[0]
    g_ref = refs[1 + 2 * n_layers]
    stash_refs = refs[2 + 2 * n_layers:n_in]
    outs = refs[n_in:n_in + 1 + 2 * n_layers]

    xc = x_ref[...].astype(cdt)
    stash = [None] + [r[...] for r in stash_refs]
    outs[0][...] = _reverse_pass(spec, n_layers, cdt, v2, refs[1:], outs,
                                 xc, stash, g_ref[...])


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _pack(params) -> Sequence[jax.Array]:
    flat = []
    for layer in params:
        flat.append(layer["w"])
        flat.append(layer["b"].reshape(1, -1))
    return flat


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _chain(packed: Tuple[jax.Array, ...], xe: jax.Array, spec: IMLPSpec,
           tile: int, interpret: bool, compute_dtype=jnp.float32,
           v2: bool = False, pipe: bool = False) -> jax.Array:
    return _chain_fwd(packed, xe, spec, tile, interpret, compute_dtype,
                      v2, pipe)[0]


def _cast_weights(packed, cdt):
    """Ship W matrices to the kernel in the compute dtype (half the VMEM
    and HBM traffic for weights under bf16); biases stay f32 — they add
    into the f32 accumulator and would lose real precision in bf16."""
    if cdt == jnp.float32:
        return packed
    return tuple(p.astype(cdt) if k % 2 == 0 else p
                 for k, p in enumerate(packed))


def _weight_specs(packed_k, n_layers):
    """Whole-array VMEM-resident blocks for the (W, b) pairs."""
    specs = []
    for k in range(n_layers):
        W, b = packed_k[2 * k], packed_k[2 * k + 1]
        specs.append(pl.BlockSpec(W.shape, lambda t: (0, 0),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec(b.shape, lambda t: (0, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _stash_dims(packed) -> Sequence[int]:
    """Width of the post-relu/pre-concat activation entering layer i
    (i = 1..n-1) = the output width of layer i-1."""
    return [packed[2 * (i - 1)].shape[1]
            for i in range(1, len(packed) // 2)]


def _call_fwd(packed, xe, spec, tile, interpret, compute_dtype=jnp.float32,
              v2=False, pipe=False):
    n_layers = len(packed) // 2
    B, E = xe.shape
    O = packed[-2].shape[1]
    grid = (B // tile,)
    packed = _cast_weights(packed, compute_dtype)
    in_specs = [pl.BlockSpec((tile, E), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += _weight_specs(packed, n_layers)
    out_spec = pl.BlockSpec((tile, O), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    body = _fwd_kernel_pipe if pipe else _fwd_kernel
    kern = functools.partial(body, spec, n_layers, compute_dtype, v2)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, O), jnp.float32),
        interpret=interpret,
    )(xe, *packed)


def _chain_fwd(packed, xe, spec, tile, interpret, compute_dtype=jnp.float32,
               v2=False, pipe=False):
    y = _call_fwd(packed, xe, spec, tile, interpret, compute_dtype, v2,
                  pipe)
    return y, (packed, xe)


def _grad_out_specs(packed, n_layers, tile, B, E):
    """Output shapes/specs for [dx, (dW, db)*n] — dW/db use a constant
    index map so the accumulator block stays VMEM-resident across the
    sequential grid."""
    out_shapes = [jax.ShapeDtypeStruct((B, E), jnp.float32)]
    out_specs = [pl.BlockSpec((tile, E), lambda t: (t, 0),
                              memory_space=pltpu.VMEM)]
    for k in range(n_layers):
        W, b = packed[2 * k], packed[2 * k + 1]
        out_shapes.append(jax.ShapeDtypeStruct(W.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(W.shape, lambda t: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(b.shape, lambda t: (0, 0),
                                      memory_space=pltpu.VMEM))
    return out_shapes, out_specs


def _chain_bwd(spec, tile, interpret, compute_dtype, v2, pipe, res, g):
    packed, xe = res
    n_layers = len(packed) // 2
    B, E = xe.shape
    O = packed[-2].shape[1]
    grid = (B // tile,)
    packed_k = _cast_weights(packed, compute_dtype)

    in_specs = [pl.BlockSpec((tile, E), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += _weight_specs(packed_k, n_layers)
    in_specs.append(pl.BlockSpec((tile, O), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM))

    out_shapes, out_specs = _grad_out_specs(packed, n_layers, tile, B, E)

    body = _bwd_kernel_pipe if pipe else _bwd_kernel
    kern = functools.partial(body, spec, n_layers, compute_dtype, v2)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xe, *packed_k, g)
    dx = outs[0]
    dpacked = tuple(outs[1:])
    return dpacked, dx


_chain.defvjp(_chain_fwd, _chain_bwd)


# --- stash mode: forward writes the activation stash, backward reads it ---

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _chain_stash(packed: Tuple[jax.Array, ...], xe: jax.Array,
                 spec: IMLPSpec, tile: int, interpret: bool,
                 compute_dtype=jnp.float32, v2: bool = False) -> jax.Array:
    return _chain_stash_fwd(packed, xe, spec, tile, interpret,
                            compute_dtype, v2)[0]


def _chain_stash_fwd(packed, xe, spec, tile, interpret,
                     compute_dtype=jnp.float32, v2=False):
    n_layers = len(packed) // 2
    B, E = xe.shape
    O = packed[-2].shape[1]
    grid = (B // tile,)
    packed_k = _cast_weights(packed, compute_dtype)

    in_specs = [pl.BlockSpec((tile, E), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += _weight_specs(packed_k, n_layers)

    out_shapes = [jax.ShapeDtypeStruct((B, O), jnp.float32)]
    out_specs = [pl.BlockSpec((tile, O), lambda t: (t, 0),
                              memory_space=pltpu.VMEM)]
    for d in _stash_dims(packed):
        out_shapes.append(jax.ShapeDtypeStruct((B, d), compute_dtype))
        out_specs.append(pl.BlockSpec((tile, d), lambda t: (t, 0),
                                      memory_space=pltpu.VMEM))

    kern = functools.partial(_fwd_kernel_stash, spec, n_layers,
                             compute_dtype, v2)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xe, *packed_k)
    return outs[0], (packed, xe, tuple(outs[1:]))


def _chain_stash_bwd(spec, tile, interpret, compute_dtype, v2, res, g):
    packed, xe, stash = res
    n_layers = len(packed) // 2
    B, E = xe.shape
    O = packed[-2].shape[1]
    grid = (B // tile,)
    packed_k = _cast_weights(packed, compute_dtype)

    in_specs = [pl.BlockSpec((tile, E), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += _weight_specs(packed_k, n_layers)
    in_specs.append(pl.BlockSpec((tile, O), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM))
    for d in _stash_dims(packed):
        in_specs.append(pl.BlockSpec((tile, d), lambda t: (t, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes, out_specs = _grad_out_specs(packed, n_layers, tile, B, E)

    kern = functools.partial(_bwd_kernel_stash, spec, n_layers,
                             compute_dtype, v2)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xe, *packed_k, g, *stash)
    dx = outs[0]
    dpacked = tuple(outs[1:])
    return dpacked, dx


_chain_stash.defvjp(_chain_stash_fwd, _chain_stash_bwd)


def fused_imlp_linear_chain(params, xe: jax.Array, spec: IMLPSpec,
                            tile: int = 512, interpret: bool = False,
                            compute_dtype=jnp.float32,
                            stash_bwd: bool = False,
                            v2: bool = False,
                            pipe: bool = False) -> jax.Array:
    """Fused linear-relu(-skip) chain on PRE-ENCODED input xe (B, E).

    Returns the pre-tanh output (B, output_dim).  Pads the batch to a tile
    multiple internally.  Differentiable via the custom-VJP backward kernel.

    stash_bwd=False (default): the backward kernel REMATERIALIZES the
    forward per tile (zero extra HBM traffic, ~n_layers extra tile-matmuls
    per tile).  stash_bwd=True: the forward kernel writes the per-layer
    activation stash to HBM and the backward streams it back instead of
    recomputing — gradients are bit-identical (the stash holds the same
    cdt cast the remat makes).  Measured on v5e (bench_fitstep.py
    stash_ab): the stash blocks' double-buffered VMEM forces tile <= 768
    on the 8-layer atlas MLP (1536 needs 25.67 MB of the 16 MB scoped
    budget), where it loses to remat at 1536 (314.8 vs 318.6 it/s) —
    remat is the right default on this hardware.

    pipe=True (the production DEFAULT via engine.select_imlp_apply;
    DEFLICKER_IMLP_PIPE=0 reverts; exclusive with stash_bwd): the
    software-pipelined half-tile bodies — two interleaved dependency
    chains per tile so Mosaic can overlap one half's VPU work with the
    other half's MXU matmuls.  Measured +2.7-3.4% at every capped tile
    (single 1792, dual 1536, vmapped multifit 1536/1280); tile ceilings
    are unchanged (the halves don't change weight residency).  The pipe
    backward always uses the v2 reverse ops.
    """
    B = xe.shape[0]
    Bp = _round_up(max(B, tile), tile)
    if Bp != B:
        xe = jnp.pad(xe, ((0, Bp - B), (0, 0)))
    if stash_bwd:
        y = _chain_stash(tuple(_pack(params)), xe, spec, tile, interpret,
                         compute_dtype, v2)
    else:
        y = _chain(tuple(_pack(params)), xe, spec, tile, interpret,
                   compute_dtype, v2, pipe)
    return y[:B]
