"""waifu2x swin_unet_v2 (winc_unet) family — NHWC flax.

Behavioral parity target: reference waifu2x/models/swin_unet_v2.py:14-528
(GLUConvMLP, WACBlock = WindowMHA + relative WindowScoreBias + pre-norm,
IR dual-path stem, residual PatchDown/PatchUp in Deep-Compression-
Autoencoder style, ToImage pixel-shuffle head, SourceResidual nearest-
neighbor-initialized source skip, 1x/1xs/2x/4x/downscaled variants).

TPU-first: NHWC throughout, window attention via the shared WindowMHA2d
(zero-padded shift, learned MLP score bias), pixel (un)shuffles are
reshape/transposes XLA folds away.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model, register_model_factory, register_model_alias
from ...modules.attention import WindowMHA2d, WindowScoreBias
from ...modules.conv import leaky_relu
from ...modules.norm import LayerNormNoBias
from ...modules.pad import replication_pad2d, crop2d
from ...modules.permute import pixel_shuffle, pixel_unshuffle
from ...modules.resize import resize


class MLP(nn.Module):
    """1x1 conv MLP (reference swin_unet_v2.py:51-66)."""
    out_channels: int
    mlp_ratio: float = 2

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_channels * self.mlp_ratio)
        x = nn.Conv(mid, (1, 1), padding="VALID", dtype=x.dtype, name="w1")(x)
        x = leaky_relu(x, 0.1)
        return nn.Conv(self.out_channels, (1, 1), padding="VALID",
                       dtype=x.dtype, name="w2")(x)


class GLUConvMLP(nn.Module):
    """reference swin_unet_v2.py:14-35."""
    out_channels: int
    kernel_size: int = 3
    mlp_ratio: float = 2

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_channels * self.mlp_ratio)
        x = nn.Conv(mid, (1, 1), padding="VALID", dtype=x.dtype, name="w1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)  # GLU
        p = (self.kernel_size - 1) // 2
        x = replication_pad2d(x, (p, p, p, p))
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    padding="VALID", dtype=x.dtype, name="w2")(x)
        return leaky_relu(x, 0.2)


class WACBlock(nn.Module):
    """Window MHA (+learned score bias, pre-LN) + conv MLP
    (reference swin_unet_v2.py:69-98)."""
    in_channels: int
    num_heads: int = 4
    window_size: int = 8
    mlp_ratio: float = 2
    conv_mlp: bool = True
    shift: bool = False

    @nn.compact
    def __call__(self, x):
        ws = (self.window_size if isinstance(self.window_size, (tuple, list))
              else (self.window_size, self.window_size))
        bias = WindowScoreBias(ws, name="relative_bias")()
        # pre-norm is applied to the attention input only (residual is raw x)
        xn = LayerNormNoBias(name="norm")(x)
        x1 = WindowMHA2d(self.in_channels, num_heads=self.num_heads,
                         window_size=ws, shift=self.shift,
                         name="mha")(xn, attn_mask=bias)
        x = x + x1
        if self.conv_mlp:
            x = x + GLUConvMLP(self.in_channels, mlp_ratio=self.mlp_ratio,
                               name="conv_mlp")(x)
        else:
            x = x + MLP(self.in_channels, mlp_ratio=self.mlp_ratio,
                        name="conv_mlp")(x)
        return x


class WACBlocks(nn.Module):
    """reference swin_unet_v2.py:101-119."""
    in_channels: int
    num_heads: int = 4
    window_size: object = 8
    mlp_ratio: float = 2
    num_layers: int = 2
    conv_mlp: object = True
    shift: object = None

    @nn.compact
    def __call__(self, x):
        n = self.num_layers
        window = self.window_size if isinstance(self.window_size, (list, tuple)) \
            else [self.window_size] * n
        conv_mlp = self.conv_mlp if isinstance(self.conv_mlp, (list, tuple)) \
            else [self.conv_mlp] * n
        shift = self.shift
        if shift is None:
            shift = [i % 2 == 1 for i in range(n)]
        for i in range(n):
            x = WACBlock(self.in_channels, num_heads=self.num_heads,
                         window_size=window[i], mlp_ratio=self.mlp_ratio,
                         conv_mlp=conv_mlp[i], shift=shift[i],
                         name=f"blocks_{i}")(x)
        return x


def get_shift_config(num_layers, last=False):
    # reference swin_unet_v2.py:259-264
    if last:
        return tuple(i % 2 == 1 for i in range(num_layers))
    return tuple(reversed([i % 2 == 1 for i in range(num_layers)]))


class IR(nn.Module):
    """Dual-path shallow stem (reference swin_unet_v2.py:120-141)."""
    out_channels: int = 32

    @nn.compact
    def __call__(self, x):
        half = self.out_channels // 2
        x1 = replication_pad2d(x, (1, 1, 1, 1))
        x1 = nn.Conv(half, (3, 3), padding="VALID", dtype=x.dtype,
                     name="path1_0")(x1)
        x1 = leaky_relu(x1, 0.2)
        x2 = pixel_unshuffle(x, 2)
        x2 = nn.Conv(half * 4, (1, 1), padding="VALID", dtype=x.dtype,
                     name="path2_1")(x2)
        x2 = WACBlock(half * 4, num_heads=2, window_size=8, mlp_ratio=1,
                      shift=True, name="path2_2")(x2)
        x2 = WACBlock(half * 4, num_heads=2, window_size=8, mlp_ratio=1,
                      shift=False, name="path2_3")(x2)
        x2 = pixel_shuffle(x2, 2)
        return jnp.concatenate([x1, x2], axis=-1)


class PatchDown(nn.Module):
    """reference swin_unet_v2.py:144-168 (residual = DC-AE channel-avg)."""
    out_channels: int
    residual: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = nn.Conv(self.out_channels, (2, 2), strides=(2, 2),
                    padding="VALID", dtype=x.dtype, name="conv")(x)
        if not self.residual:
            return leaky_relu(h, 0.2)
        group = c_in * 4 // self.out_channels
        sc = pixel_unshuffle(x, 2)
        B, H, W, _ = sc.shape
        sc = sc.reshape(B, H, W, self.out_channels, group).mean(axis=-1)
        return sc + leaky_relu(h, 0.2)


class PatchUp(nn.Module):
    """reference swin_unet_v2.py:171-194 (residual = channel-dup shuffle)."""
    out_channels: int
    residual: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = nn.Conv(self.out_channels * 4, (1, 1), padding="VALID",
                    dtype=x.dtype, name="proj")(x)
        h = leaky_relu(h, 0.2)
        if not self.residual:
            return pixel_shuffle(h, 2)
        repeats = self.out_channels * 4 // c_in
        sc = pixel_shuffle(jnp.repeat(x, repeats, axis=-1), 2)
        return sc + pixel_shuffle(h, 2)


class ToImage(nn.Module):
    """reference swin_unet_v2.py:197-211."""
    out_channels: int
    scale_factor: int

    @nn.compact
    def __call__(self, x):
        s = self.scale_factor
        x = nn.Conv(self.out_channels * s * s, (1, 1), padding="VALID",
                    dtype=x.dtype, name="proj")(x)
        if s > 1:
            x = pixel_shuffle(x, s)
        return crop2d(x, (s, s, s, s))


def _nearest_resample_kernel(scale_factor: int, source_channels: int = 3,
                             out_channels: int = 3) -> np.ndarray:
    """Nearest-neighbor-upsample conv init (reference swin_unet_v2.py:221-238).
    Returns HWIO (3, 3, in, out*s^2)."""
    s = scale_factor
    k = np.zeros((3, 3, source_channels, out_channels * s * s), np.float32)
    # torch builds OIHW (out/s^2, in, 3, 3) with center taps, NN-upsamples the
    # kernel spatially and pixel-unshuffles back into the output channels.
    # For a 3x3 kernel and s in {1,2,4} the NN-upsampled center tap stays the
    # center tap of each sub-kernel, so the result is: output channel
    # (c*s*s + j) takes source channel c at the center.
    for c in range(out_channels):
        for j in range(s * s):
            k[1, 1, c, c * s * s + j] = 1.0
    return k


class SourceResidual(nn.Module):
    """Learned-weight source skip with NN-init resampler
    (reference swin_unet_v2.py:214-250)."""
    out_channels: int
    scale_factor: int

    @nn.compact
    def __call__(self, x, src):
        s = self.scale_factor
        kernel = self.param(
            "resampling",
            lambda key: jnp.asarray(_nearest_resample_kernel(s, src.shape[-1],
                                                             self.out_channels)))
        scale_bias = self.param("scale_bias", nn.initializers.zeros, (1,))
        srcp = replication_pad2d(src, (1, 1, 1, 1))
        import jax
        r = jax.lax.conv_general_dilated(
            srcp.astype(x.dtype), kernel.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if s > 1:
            r = pixel_shuffle(r, s)
        unpad = (x.shape[1] - r.shape[1]) // 2
        if unpad < 0:
            r = crop2d(r, (-unpad,) * 4)
        elif unpad > 0:
            r = jnp.pad(r, ((0, 0), (unpad, unpad), (unpad, unpad), (0, 0)))
        return r + x * scale_bias.astype(x.dtype)


class SwinUNetV2Base(nn.Module):
    """reference swin_unet_v2.py:267-354."""
    out_channels: int = 3
    base_dim: int = 96
    lv1_mlp_ratio: float = 2
    lv2_mlp_ratio: float = 1
    lv2_ratio: float = 4
    first_layers: int = 2
    last_layers: int = 3
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x):
        C = self.base_dim
        C2 = int(C * self.lv2_ratio)
        heads = max(C // 32, 2)
        heads2 = max(C2 // 32, 2)
        src = x
        x = IR(32, name="ir")(x)
        x = nn.Conv(C, (3, 3), padding="VALID", dtype=x.dtype, name="patch")(x)
        x = crop2d(x, (7, 7, 7, 7))
        x = leaky_relu(x, 0.2)
        x1 = WACBlocks(C, mlp_ratio=self.lv1_mlp_ratio, window_size=[8, 6][:self.first_layers]
                       if self.first_layers <= 2 else [8, 6] + [8] * (self.first_layers - 2),
                       num_heads=heads, num_layers=self.first_layers,
                       shift=get_shift_config(self.first_layers),
                       name="wac1")(x)
        x = PatchDown(C2, residual=True, name="down1")(x1)
        x = WACBlocks(C2, mlp_ratio=self.lv2_mlp_ratio, window_size=8,
                      num_heads=heads2, num_layers=4,
                      shift=get_shift_config(4), name="wac2")(x)
        x = PatchUp(C, residual=True, name="up1")(x)
        x = x + x1
        x = WACBlocks(C, mlp_ratio=self.lv1_mlp_ratio, window_size=8,
                      num_heads=heads, num_layers=self.last_layers,
                      conv_mlp=[True] * (self.last_layers - 1) + [False],
                      shift=get_shift_config(self.last_layers),
                      name="wac3")(x)
        x = ToImage(self.out_channels, self.scale_factor,
                    name="to_residual_image")(x)
        return SourceResidual(self.out_channels, self.scale_factor,
                              name="to_image")(x, src)


def _v2_tile_ok(size):
    return size > 16 and (size - 16) % 12 == 0 and (size - 16) % 16 == 0


class _SwinUNetV2(I2IBaseModel):
    in_channels: int = 3
    out_channels: int = 3
    base_dim: int = 96
    lv1_mlp_ratio: float = 2
    lv2_mlp_ratio: float = 2
    lv2_ratio: float = 2
    first_layers: int = 2
    last_layers: int = 3

    def is_valid_tile_size(self, size):
        return _v2_tile_ok(size)

    @nn.compact
    def __call__(self, x, train: bool = False):
        z = SwinUNetV2Base(
            out_channels=self.out_channels, base_dim=self.base_dim,
            lv1_mlp_ratio=self.lv1_mlp_ratio,
            lv2_mlp_ratio=self.lv2_mlp_ratio, lv2_ratio=self.lv2_ratio,
            first_layers=self.first_layers, last_layers=self.last_layers,
            scale_factor=self.i2i_scale, name="unet")(x)
        if train:
            return z
        return jnp.clip(z, 0.0, 1.0)


@register_model
class SwinUNet1xV2(_SwinUNetV2):
    model_name = "waifu2x.swin_unet_v2_1x"
    i2i_scale = 1
    i2i_offset = 9
    i2i_blend_size = 4
    base_dim: int = 64


@register_model
class SwinUNet2xV2(_SwinUNetV2):
    model_name = "waifu2x.swin_unet_v2_2x"
    i2i_scale = 2
    i2i_offset = 18
    i2i_blend_size = 8
    base_dim: int = 96


@register_model
class SwinUNet4xV2(_SwinUNetV2):
    model_name = "waifu2x.swin_unet_v2_4x"
    i2i_scale = 4
    i2i_offset = 36
    i2i_blend_size = 16
    base_dim: int = 128


@register_model
class SwinUNetV2Downscaled(I2IBaseModel):
    """4x trunk + bicubic downscale to 2x/1x (reference swin_unet_v2.py:489-525)."""
    model_name = "waifu2x.swin_unet_v2_downscaled"
    in_channels: int = 3
    out_channels: int = 3
    base_dim: int = 128
    downscale_factor: int = 2

    i2i_blend_size = 8

    @property
    def i2i_scale(self):
        return 4 // self.downscale_factor

    @property
    def i2i_offset(self):
        return {2: 18, 4: 9}[self.downscale_factor]

    def is_valid_tile_size(self, size):
        return _v2_tile_ok(size)

    @nn.compact
    def __call__(self, x, train: bool = False):
        z = SwinUNetV2Base(out_channels=self.out_channels,
                           base_dim=self.base_dim, lv2_mlp_ratio=2,
                           lv2_ratio=2, scale_factor=4, name="unet")(x)
        if not train:
            z = jnp.clip(z, 0.0, 1.0)
        h, w = z.shape[1:3]
        z = resize(z, h // self.downscale_factor, w // self.downscale_factor,
                   mode="bicubic", antialias=True)
        if not train:
            z = jnp.clip(z, 0.0, 1.0)
        return z


register_model_alias("waifu2x.winc_unet_1x", "waifu2x.swin_unet_v2_1x")
register_model_alias("waifu2x.swin_unet_1x_v2", "waifu2x.swin_unet_v2_1x")
register_model_alias("waifu2x.winc_unet_2x", "waifu2x.swin_unet_v2_2x")
register_model_alias("waifu2x.winc_unet_4x", "waifu2x.swin_unet_v2_4x")
register_model_factory(
    "waifu2x.swin_unet_v2_1xs",
    lambda **kw: SwinUNet1xV2(base_dim=32, first_layers=1, last_layers=1,
                              lv1_mlp_ratio=1, lv2_mlp_ratio=1, **kw))
