"""Implicit coordinate MLP (IMLP) — the stage-1 workhorse.

Functionally equivalent to the reference's `IMLP`
(src/models/stage_1/implicit_neural_networks.py:15-81) but written as a pure
function over a params pytree so it jits/vmaps/shards cleanly and can be
fused into a single large matmul chain per training step (MXU-friendly).

Replicated semantics (these affect convergence/behavior):
  * positional encoding is sin/cos of 2^j * pi * x with the exact
    interleaving of `positionalEncoding_vec` (frequency-major:
    [sin(f0 x0..xD), cos(f0 x0..xD), sin(f1 x0..xD), ...]),
  * skip layers concatenate the *encoded input with gradients stopped*
    (`input = x.detach().clone()` in the reference) — for the atlas MLP this
    blocks gradient flow to the mapping network through the skip branches,
  * ReLU before each non-first layer, skip-concat before the layer matmul,
  * tanh on the output.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class IMLPSpec:
    input_dim: int
    output_dim: int
    hidden_dim: int = 256
    use_positional: bool = True
    positional_dim: int = 10
    skip_layers: Tuple[int, ...] = (4, 6)
    num_layers: int = 8          # includes the output layer
    use_tanh: bool = True
    apply_softmax: bool = False

    @property
    def encoding_dim(self) -> int:
        if self.use_positional:
            return 2 * self.input_dim * self.positional_dim
        return self.input_dim

    def layer_dims(self) -> Sequence[Tuple[int, int]]:
        dims = []
        for i in range(self.num_layers):
            if i == 0:
                fan_in = self.encoding_dim
            elif i in self.skip_layers:
                fan_in = self.hidden_dim + self.encoding_dim
            else:
                fan_in = self.hidden_dim
            fan_out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            dims.append((fan_in, fan_out))
        return dims


def positional_encoding(x: jax.Array, positional_dim: int) -> jax.Array:
    """x: (..., D) -> (..., 2*D*positional_dim); frequencies 2^j * pi."""
    freqs = (2.0 ** jnp.arange(positional_dim)) * jnp.pi   # (F,)
    proj = x[..., None] * freqs                             # (..., D, F)
    sin = jnp.sin(proj)
    cos = jnp.cos(proj)
    enc = jnp.concatenate([sin, cos], axis=-2)              # (..., 2D, F)
    # frequency-major flatten: (..., F, 2D) -> (..., F*2D)
    enc = jnp.swapaxes(enc, -1, -2)
    return enc.reshape(*x.shape[:-1], -1)


def imlp_init(key: jax.Array, spec: IMLPSpec, dtype=jnp.float32):
    """Initialize params: list of (W (in,out), b (out,)) pairs.

    Uses torch nn.Linear's default init (both W and b uniform in
    +-1/sqrt(fan_in)) so fits start from a statistically identical point.
    """
    params = []
    for fan_in, fan_out in spec.layer_dims():
        key, kw, kb = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(fan_in)
        W = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
        b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
        params.append({"w": W, "b": b})
    return params


def imlp_apply_fused(params, x: jax.Array, spec: IMLPSpec,
                     tile: int = 512, interpret: bool = False,
                     compute_dtype=jnp.float32,
                     stash_bwd: bool = False, v2: bool = False,
                     pipe: bool = False) -> jax.Array:
    """IMLP forward via the Pallas fused linear-chain kernel
    (ops/pallas/imlp_kernel): positional encoding + stop-gradient skip
    handling here, the whole matmul chain in one VMEM-resident kernel.
    compute_dtype=float32 matches `imlp_apply` at HIGHEST precision;
    bfloat16 matches the engine's fit_precision='default' numerics.
    """
    from ..ops.pallas import fused_imlp_linear_chain

    if spec.use_positional:
        x = positional_encoding(x, spec.positional_dim)
    h = fused_imlp_linear_chain(params, x, spec, tile=tile,
                                interpret=interpret,
                                compute_dtype=compute_dtype,
                                stash_bwd=stash_bwd, v2=v2, pipe=pipe)
    if spec.use_tanh:
        h = jnp.tanh(h)
    if spec.apply_softmax:
        h = jax.nn.softmax(h, axis=-1)
    return h


def imlp_apply(params, x: jax.Array, spec: IMLPSpec,
               precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Apply the IMLP to coordinates x (..., input_dim).

    `precision` defaults to HIGHEST: the atlas fit reconstructs fine color
    detail and the MXU's default bf16-multiply passes visibly degrade it;
    the 256-wide MLPs are far from MXU-bound so full-precision multiplies
    are nearly free here.
    """
    if spec.use_positional:
        x = positional_encoding(x, spec.positional_dim)
    skip_input = jax.lax.stop_gradient(x)
    h = x
    for i, layer in enumerate(params):
        if i > 0:
            h = jax.nn.relu(h)
        if i in spec.skip_layers:
            h = jnp.concatenate([h, skip_input.astype(h.dtype)], axis=-1)
        h = jnp.dot(h, layer["w"], precision=precision) + layer["b"]
    if spec.use_tanh:
        h = jnp.tanh(h)
    if spec.apply_softmax:
        h = jax.nn.softmax(h, axis=-1)
    return h
