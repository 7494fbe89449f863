"""Stage-2 local refinement: TransformNet + ConvLSTM (flax, NHWC).

Re-design of the reference's refinement net (src/models/network_local.py),
from fast_blind_video_consistency (Lai et al., ECCV'18).  Pipeline config:
nf=32, 5 residual blocks, nc_in=12, nc_out=3
(src/neural_filter_and_refinement.py:58-66).

Replicated quirks that affect pretrained-weight behavior:
  * `if self.norm in ["BN" or "IN"]` evaluates as `in ["BN"]`
    (network_local.py:136,169), so with the pipeline's norm="IN" the
    InstanceNorm layers are NEVER applied — we simply build no norm layers
    (their running-stat keys in the checkpoint are dead weight);
  * the ConvLSTM is called with prev_state=None for every frame
    (neural_filter_and_refinement.py:106): state never carries across
    frames, so prev_hidden = prev_cell = 0 and the LSTM reduces to
    hidden = σ(o) · tanh(σ(i) · tanh(g)) of the gates conv on
    cat(input, zeros) — replicated exactly, including the zeros concat
    (the Gates conv weights expect the hidden channels);
  * reflection padding on every ConvLayer, LeakyReLU(0.2), tanh output.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def _reflect_pad(x: jax.Array, p: int) -> jax.Array:
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ConvLayer(nn.Module):
    """network_local.py:118-139 (reflection pad + conv; norm never applied
    under the pipeline's 'IN' config — see module docstring)."""

    features: int
    kernel_size: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _reflect_pad(x, self.kernel_size // 2)
        return nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                       strides=(self.stride, self.stride), padding="VALID",
                       dtype=self.dtype, precision=_PREC, name="conv2d")(x)


class UpsampleConvLayer(nn.Module):
    """network_local.py:142-166: nearest x2 upsample + reflection-pad conv."""

    features: int
    kernel_size: int
    upsample: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.upsample and self.upsample > 1:
            x = jnp.repeat(jnp.repeat(x, self.upsample, axis=1),
                           self.upsample, axis=2)
        x = _reflect_pad(x, self.kernel_size // 2)
        return nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                       padding="VALID", dtype=self.dtype, precision=_PREC,
                       name="conv2d")(x)


class ResidualBlock(nn.Module):
    """network_local.py:169-190 (leaky-relu 3x3-3x3 residual)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.leaky_relu(ConvLayer(self.channels, 3, 1, self.dtype,
                                    name="conv1")(x), 0.2)
        y = ConvLayer(self.channels, 3, 1, self.dtype, name="conv2")(y)
        return x + y


class ConvLSTM(nn.Module):
    """network_local.py:7-53, specialized to the pipeline's prev_state=None
    call pattern (zero initial hidden/cell every frame)."""

    hidden_size: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, H, W, _ = x.shape
        zeros_hidden = jnp.zeros((N, H, W, self.hidden_size), x.dtype)
        stacked = jnp.concatenate([x, zeros_hidden], axis=-1)
        p = self.kernel_size // 2
        gates = nn.Conv(4 * self.hidden_size,
                        (self.kernel_size, self.kernel_size),
                        padding=((p, p), (p, p)), dtype=self.dtype, precision=_PREC,
                        name="Gates")(stacked)
        i, r, o, g = jnp.split(gates, 4, axis=-1)
        cell = nn.sigmoid(i) * jnp.tanh(g)       # prev_cell = 0
        hidden = nn.sigmoid(o) * jnp.tanh(cell)
        return hidden


class TransformNet(nn.Module):
    """network_local.py:56-114.  Input (N, H, W, 12) = cat(P_t, O_{t-1},
    P_t, P_{t-1}); output tanh residual (N, H, W, 3)."""

    nf: int = 32
    blocks: int = 5
    nc_out: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        xa, xb = x[..., :6], x[..., 6:]

        e1a = lrelu(ConvLayer(self.nf, 7, 1, d, name="conv1a")(xa))
        e1b = lrelu(ConvLayer(self.nf, 7, 1, d, name="conv1b")(xb))
        e2a = lrelu(ConvLayer(self.nf * 2, 3, 2, d, name="conv2a")(e1a))
        e2b = lrelu(ConvLayer(self.nf * 2, 3, 2, d, name="conv2b")(e1b))
        e3 = lrelu(ConvLayer(self.nf * 4, 3, 2, d, name="conv3")(
            jnp.concatenate([e2a, e2b], axis=-1)))

        rb = e3
        for b in range(self.blocks):
            rb = ResidualBlock(self.nf * 4, d, name=f"ResBlocks_{b}")(rb)

        hidden = ConvLSTM(self.nf * 4, 3, d, name="convlstm")(rb)

        d2 = lrelu(UpsampleConvLayer(self.nf * 2, 3, 2, d, name="deconv1")(hidden))
        d1 = lrelu(UpsampleConvLayer(self.nf, 3, 2, d, name="deconv2")(
            jnp.concatenate([d2, e2a], axis=-1)))
        y = ConvLayer(self.nc_out, 7, 1, d, name="deconv3")(
            jnp.concatenate([d1, e1a], axis=-1))
        return jnp.tanh(y)


def transformnet_init(key: jax.Array, nf: int = 32, blocks: int = 5,
                      nc_in: int = 12, nc_out: int = 3, dtype=jnp.float32,
                      hw=(64, 64)):
    model = TransformNet(nf, blocks, nc_out, dtype)
    return model.init(key, jnp.zeros((1, hw[0], hw[1], nc_in)))
