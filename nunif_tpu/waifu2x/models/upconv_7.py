"""waifu2x upconv_7 / vgg_7 — the original waifu2x CNNs, TPU-native NHWC.

Behavioral parity target: reference waifu2x/models/upconv_7.py:7 (scale=2,
offset=14) and waifu2x/models/vgg_7.py:7 (scale=1, offset=7).  All convs are
VALID (no padding) so the tile shrinks by the offset — tiling compensates.
"""
import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model
from ...modules.conv import ConvTranspose2dTorch, leaky_relu


@register_model
class UpConv7(I2IBaseModel):
    model_name = "waifu2x.upconv_7"
    in_channels: int = 3
    out_channels: int = 3

    i2i_scale = 2
    i2i_offset = 14
    i2i_blend_size = 0
    i2i_default_tile_size = 256
    i2i_default_batch_size = 16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        widths = (16, 32, 64, 128, 128, 256)
        for w in widths:
            x = nn.Conv(w, (3, 3), padding="VALID", dtype=x.dtype)(x)
            x = leaky_relu(x, 0.1)
        x = ConvTranspose2dTorch(self.out_channels, 4, stride=2, padding=3)(x)
        if train:
            return x
        return jnp.clip(x, 0.0, 1.0)


@register_model
class VGG7(I2IBaseModel):
    model_name = "waifu2x.vgg_7"
    in_channels: int = 3
    out_channels: int = 3

    i2i_scale = 1
    i2i_offset = 7
    i2i_blend_size = 0
    i2i_default_tile_size = 256
    i2i_default_batch_size = 16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        widths = (32, 32, 64, 64, 128, 128)
        for w in widths:
            x = nn.Conv(w, (3, 3), padding="VALID", dtype=x.dtype)(x)
            x = leaky_relu(x, 0.1)
        x = nn.Conv(self.out_channels, (3, 3), padding="VALID", dtype=x.dtype)(x)
        if train:
            return x
        return jnp.clip(x, 0.0, 1.0)
