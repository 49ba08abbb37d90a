"""waifu2x.wgmlp_4x — window-gMLP SR net (NHWC flax).

Behavioral parity target: reference waifu2x/models/wgmlp.py:15-470 —
IR stem with dilated Overscan context, patch conv, WGMLP U-net
(windowed gMLP token mixing + GLU conv MLPs, residual PatchDown/Up),
ICNR ToImage + nearest-init SourceResidual.  Shares PatchDown/PatchUp/
ToImage/SourceResidual with swin_unet_v2 (identical reference modules).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model
from ...modules.attention import WindowGMLP2d
from ...modules.conv import leaky_relu
from ...modules.norm import LayerNormNoBias
from ...modules.pad import replication_pad2d, crop2d
from .swin_unet_v2 import (
    GLUConvMLP, MLP, PatchDown, PatchUp, ToImage, SourceResidual,
)


class WGMLPBlock(nn.Module):
    """reference wgmlp.py:75-102 (GMLP has its own internal residual)."""
    in_channels: int
    window_size: int = 8
    mlp_ratio: float = 2
    conv_mlp: bool = True
    shift: bool = False

    @nn.compact
    def __call__(self, x):
        norm1 = LayerNormNoBias(name="norm1")
        norm2 = LayerNormNoBias(name="norm2")
        x = WindowGMLP2d(self.in_channels, self.window_size, mlp_ratio=1,
                         shift=self.shift, name="gmlp")(x, norm1, norm2)
        if self.conv_mlp:
            x = x + GLUConvMLP(self.in_channels, mlp_ratio=self.mlp_ratio,
                               name="conv_mlp")(x)
        else:
            x = x + MLP(self.in_channels, mlp_ratio=self.mlp_ratio,
                        name="conv_mlp")(x)
        return x


class WGMLPBlocks(nn.Module):
    in_channels: int
    mlp_ratio: float = 2
    num_layers: int = 2
    conv_mlp: object = True
    shift: object = None

    @nn.compact
    def __call__(self, x):
        n = self.num_layers
        conv_mlp = self.conv_mlp if isinstance(self.conv_mlp, (list, tuple)) \
            else [self.conv_mlp] * n
        shift = self.shift
        if shift is None:
            shift = tuple(reversed([i % 2 == 1 for i in range(n)]))
        for i in range(n):
            x = WGMLPBlock(self.in_channels, 8, mlp_ratio=self.mlp_ratio,
                           conv_mlp=conv_mlp[i], shift=shift[i],
                           name=f"blocks_{i}")(x)
        return x


class Overscan(nn.Module):
    """Dilated context stack (reference wgmlp.py:126-154)."""
    channels: int

    @nn.compact
    def __call__(self, x):
        C = self.channels
        pad = 1 + 2 + 3 + 1
        x = replication_pad2d(x, (pad,) * 4)
        x1 = nn.Conv(C, (3, 3), padding="VALID", dtype=x.dtype,
                     name="conv1")(x)
        x1 = leaky_relu(x1, 0.2)
        x2 = nn.Conv(C // 2, (3, 3), kernel_dilation=(2, 2), padding="VALID",
                     dtype=x.dtype, name="conv2")(x1)
        x2 = leaky_relu(x2, 0.2)
        x3 = nn.Conv(C // 2, (3, 3), kernel_dilation=(3, 3), padding="VALID",
                     dtype=x.dtype, name="conv3")(x2)
        x3 = leaky_relu(x3, 0.2)
        x1 = crop2d(x1, (2 + 3,) * 4)
        x2 = crop2d(x2, (3,) * 4)
        x4 = jnp.concatenate([x1, x2, x3], axis=-1)
        h = nn.Conv(C, (3, 3), padding="VALID", dtype=x.dtype,
                    name="fuse_0")(x4)
        h = leaky_relu(h, 0.2)
        return nn.Conv(C, (1, 1), padding="VALID", dtype=x.dtype,
                       name="fuse_2")(h)


class IR(nn.Module):
    """reference wgmlp.py:156-174."""
    out_channels: int = 16

    @nn.compact
    def __call__(self, x):
        h = replication_pad2d(x, (1,) * 4)
        h = nn.Conv(self.out_channels, (3, 3), padding="VALID", dtype=x.dtype,
                    name="patch")(h)
        h = leaky_relu(h, 0.2)
        ov = Overscan(self.out_channels, name="overscan")(h)
        h = jnp.concatenate([h, ov], axis=-1)
        h = replication_pad2d(h, (1,) * 4)
        return nn.Conv(self.out_channels, (3, 3), padding="VALID",
                       dtype=x.dtype, name="fusion")(h)


class WGMLPBase(nn.Module):
    """reference wgmlp.py:195-354."""
    out_channels: int = 3
    base_dim: int = 128
    lv1_mlp_ratio: float = 2
    lv2_mlp_ratio: float = 2
    first_layers: int = 2
    last_layers: int = 3
    scale_factor: int = 4

    @nn.compact
    def __call__(self, x):
        C = self.base_dim
        C2 = C * 2
        src = x
        x = IR(16, name="ir")(x)
        x = nn.Conv(C, (3, 3), padding="VALID", dtype=x.dtype,
                    name="patch")(x)
        x = crop2d(x, (7,) * 4)
        x = leaky_relu(x, 0.2)
        x1 = WGMLPBlocks(C, mlp_ratio=self.lv1_mlp_ratio,
                         num_layers=self.first_layers,
                         shift=tuple(reversed([i % 2 == 1 for i in
                                               range(self.first_layers)])),
                         name="wgmlp1")(x)
        x = PatchDown(C2, residual=True, name="down1")(x1)
        x = WGMLPBlocks(C2, mlp_ratio=self.lv2_mlp_ratio, num_layers=4,
                        shift=tuple(reversed([i % 2 == 1 for i in range(4)])),
                        name="wgmlp2")(x)
        x = PatchUp(C, residual=True, name="up1")(x)
        x = x + x1
        x = WGMLPBlocks(C, mlp_ratio=self.lv1_mlp_ratio,
                        num_layers=self.last_layers,
                        conv_mlp=[True] * (self.last_layers - 1) + [False],
                        # reference wgmlp.py:326 uses get_shift_config's
                        # last=False default here
                        shift=tuple(reversed([i % 2 == 1 for i in
                                              range(self.last_layers)])),
                        name="wgmlp3")(x)
        x = ToImage(self.out_channels, self.scale_factor,
                    name="to_residual_image")(x)
        return SourceResidual(self.out_channels, self.scale_factor,
                              name="to_image")(x, src)


@register_model
class WGMLP4x(I2IBaseModel):
    model_name = "waifu2x.wgmlp_4x"
    in_channels: int = 3
    out_channels: int = 3
    base_dim: int = 128
    lv1_mlp_ratio: float = 2
    lv2_mlp_ratio: float = 2

    i2i_scale = 4
    i2i_offset = 36
    i2i_blend_size = 16

    def is_valid_tile_size(self, size):
        return size > 16 and (size - 16) % 12 == 0 and (size - 16) % 16 == 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        z = WGMLPBase(out_channels=self.out_channels, base_dim=self.base_dim,
                      lv1_mlp_ratio=self.lv1_mlp_ratio,
                      lv2_mlp_ratio=self.lv2_mlp_ratio,
                      scale_factor=4, name="unet")(x)
        if train:
            return z
        return jnp.clip(z, 0.0, 1.0)
