"""waifu2x CUNet / UpCUNet — cascaded U-Nets (NHWC flax).

Behavioral parity target: reference waifu2x/models/cunet.py:10-228
(UNetConv valid 3x3 pairs with SE, UNet1/UNet2 with negative-pad skips,
cascaded z1+z2 with deep-supervision aux output, offsets 28/36, tile % 4).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model
from ...modules.conv import leaky_relu
from ...modules.pad import crop2d


class SEBlock(nn.Module):
    """reference nunif/modules/attention.py:29-44 (reduction=8, bias)."""
    channels: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        z = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        z = z.astype(x.dtype)
        z = nn.Conv(self.channels // self.reduction, (1, 1), padding="VALID",
                    dtype=x.dtype, name="conv1")(z)
        z = nn.relu(z)
        z = nn.Conv(self.channels, (1, 1), padding="VALID",
                    dtype=x.dtype, name="conv2")(z)
        return x * nn.sigmoid(z)


class UNetConv(nn.Module):
    mid_channels: int
    out_channels: int
    se: bool

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.mid_channels, (3, 3), padding="VALID",
                    dtype=x.dtype, name="conv_0")(x)
        x = leaky_relu(x, 0.1)
        x = nn.Conv(self.out_channels, (3, 3), padding="VALID",
                    dtype=x.dtype, name="conv_2")(x)
        x = leaky_relu(x, 0.1)
        if self.se:
            x = SEBlock(self.out_channels, name="seblock")(x)
        return x


class UNet1(nn.Module):
    out_channels: int
    deconv: bool

    @nn.compact
    def __call__(self, x):
        x1 = UNetConv(32, 64, se=False, name="conv1")(x)
        x2 = nn.Conv(64, (2, 2), strides=(2, 2), padding="VALID",
                     dtype=x.dtype, name="conv1_down")(x1)
        x2 = leaky_relu(x2, 0.1)
        x2 = UNetConv(128, 64, se=True, name="conv2")(x2)
        x2 = nn.ConvTranspose(64, (2, 2), strides=(2, 2), padding="VALID",
                              transpose_kernel=True, dtype=x.dtype,
                              name="conv2_up")(x2)
        x2 = leaky_relu(x2, 0.1)
        x1 = crop2d(x1, (4, 4, 4, 4))
        x3 = nn.Conv(64, (3, 3), padding="VALID", dtype=x.dtype,
                     name="conv3")(x1 + x2)
        x3 = leaky_relu(x3, 0.1)
        if self.deconv:
            # torch ConvTranspose2d(64, out, 4, stride=2, padding=3): the
            # `padding` of a transposed conv CROPS the full output by p per
            # side — flax has no such argument, so VALID + crop
            z = nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                                 padding="VALID", transpose_kernel=True,
                                 dtype=x.dtype, name="conv_bottom")(x3)
            z = crop2d(z, (3, 3, 3, 3))
        else:
            z = nn.Conv(self.out_channels, (3, 3), padding="VALID",
                        dtype=x.dtype, name="conv_bottom")(x3)
        return z


class UNet2(nn.Module):
    out_channels: int
    deconv: bool

    @nn.compact
    def __call__(self, x):
        x1 = UNetConv(32, 64, se=False, name="conv1")(x)
        x2 = nn.Conv(64, (2, 2), strides=(2, 2), padding="VALID",
                     dtype=x.dtype, name="conv1_down")(x1)
        x2 = leaky_relu(x2, 0.1)
        x2 = UNetConv(64, 128, se=True, name="conv2")(x2)

        x3 = nn.Conv(128, (2, 2), strides=(2, 2), padding="VALID",
                     dtype=x.dtype, name="conv2_down")(x2)
        x3 = leaky_relu(x3, 0.1)
        x3 = UNetConv(256, 128, se=True, name="conv3")(x3)
        x3 = nn.ConvTranspose(128, (2, 2), strides=(2, 2), padding="VALID",
                              transpose_kernel=True, dtype=x.dtype,
                              name="conv3_up")(x3)
        x3 = leaky_relu(x3, 0.1)

        x2 = crop2d(x2, (4, 4, 4, 4))
        x4 = UNetConv(64, 64, se=True, name="conv4")(x2 + x3)
        x4 = nn.ConvTranspose(64, (2, 2), strides=(2, 2), padding="VALID",
                              transpose_kernel=True, dtype=x.dtype,
                              name="conv4_up")(x4)
        x4 = leaky_relu(x4, 0.1)

        x1 = crop2d(x1, (16, 16, 16, 16))
        x5 = nn.Conv(64, (3, 3), padding="VALID", dtype=x.dtype,
                     name="conv5")(x1 + x4)
        x5 = leaky_relu(x5, 0.1)
        if self.deconv:
            z = nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                                 padding="VALID", transpose_kernel=True,
                                 dtype=x.dtype, name="conv_bottom")(x5)
            z = crop2d(z, (3, 3, 3, 3))
        else:
            z = nn.Conv(self.out_channels, (3, 3), padding="VALID",
                        dtype=x.dtype, name="conv_bottom")(x5)
        return z


@register_model
class CUNet(I2IBaseModel):
    model_name = "waifu2x.cunet"
    i2i_scale = 1
    i2i_offset = 28
    i2i_blend_size = 4
    i2i_default_tile_size = 256
    i2i_tile_constraints = ((4, 0),)
    in_channels: int = 3
    out_channels: int = 3
    no_clip: bool = True

    def _cascade(self, x, train):
        deconv1 = self.i2i_scale == 2
        z1 = UNet1(self.out_channels, deconv=deconv1, name="unet1")(x)
        if not self.no_clip:
            z1 = jnp.clip(z1, 0.0, 1.0)
        z2 = UNet2(self.out_channels, deconv=False, name="unet2")(z1)
        z1c = crop2d(z1, (20, 20, 20, 20))
        z = z1c + z2
        if train:
            return z, z1c
        return jnp.clip(z, 0.0, 1.0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return self._cascade(x, train)


@register_model
class UpCUNet(CUNet):
    model_name = "waifu2x.upcunet"
    i2i_scale = 2
    i2i_offset = 36
