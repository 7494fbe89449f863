"""Stage-2 neural filter: the 4-level U-Net (flax, NHWC).

Re-design of the reference UNet (src/models/network_filter.py:8-110):
double-3x3-conv blocks WITHOUT norm layers (the reference comments them out,
network_filter.py:91,103) and without bias on block convs; 2x2 max-pool
downs; bilinear-align-corners-upsample + 3x3 conv ups; 1x1 output conv.
Pipeline instantiation: in=6 (content ⊕ atlas frame), out=3, features=32
(src/neural_filter_and_refinement.py:46).

Module names mirror the torch state-dict keys so conversion is mechanical
(filter/convert).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.convex_upsample import resize_bilinear_align_corners

_PREC = jax.lax.Precision.HIGHEST


class _Block(nn.Module):
    features: int
    prefix: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, precision=_PREC,
                    name=f"{self.prefix}conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, precision=_PREC,
                    name=f"{self.prefix}conv2")(x)
        return nn.relu(x)


def _pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class UNet(nn.Module):
    in_channels: int = 6
    out_channels: int = 3
    features: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.features
        d = self.dtype
        enc1 = _Block(f, "enc1", d, name="encoder1")(x)
        enc2 = _Block(f * 2, "enc2", d, name="encoder2")(_pool(enc1))
        enc3 = _Block(f * 4, "enc3", d, name="encoder3")(_pool(enc2))
        enc4 = _Block(f * 8, "enc4", d, name="encoder4")(_pool(enc3))
        bott = _Block(f * 16, "bottleneck", d, name="bottleneck")(_pool(enc4))

        def up(z, feats, name):
            N, H, W, _ = z.shape
            z = resize_bilinear_align_corners(z, 2 * H, 2 * W)
            # torch Sequential index 1 = the conv (network_filter.py:25-28)
            return nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                           precision=_PREC, name=f"{name}_1")(z.astype(d))

        dec4 = _Block(f * 8, "dec4", d, name="decoder4")(
            jnp.concatenate([up(bott, f * 8, "upconv4"), enc4], axis=-1))
        dec3 = _Block(f * 4, "dec3", d, name="decoder3")(
            jnp.concatenate([up(dec4, f * 4, "upconv3"), enc3], axis=-1))
        dec2 = _Block(f * 2, "dec2", d, name="decoder2")(
            jnp.concatenate([up(dec3, f * 2, "upconv2"), enc2], axis=-1))
        dec1 = _Block(f, "dec1", d, name="decoder1")(
            jnp.concatenate([up(dec2, f, "upconv1"), enc1], axis=-1))
        return nn.Conv(self.out_channels, (1, 1), dtype=d, precision=_PREC, name="conv")(dec1)


def unet_init(key: jax.Array, in_channels: int = 6, out_channels: int = 3,
              features: int = 32, dtype=jnp.float32, hw=(64, 64)):
    model = UNet(in_channels, out_channels, features, dtype)
    return model.init(key, jnp.zeros((1, hw[0], hw[1], in_channels)))
