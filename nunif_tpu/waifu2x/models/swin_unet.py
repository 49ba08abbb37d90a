"""waifu2x swin_unet family — TPU-native NHWC Swin U-Net.

Behavioral parity target: reference waifu2x/models/swin_unet.py:119-394
(SwinUNetBase topology, PatchDown/PatchUp/ToImage, 1x/2x/4x/8x/downscaled
variants, tile constraint (size-16) % 12 == 0 and % 16 == 0).

TPU-first: everything stays NHWC end-to-end (the reference permutes
BCHW<->BHWC around every block because torch convs are NCHW; here there is
nothing to permute), pixel-shuffle is a reshape/transpose XLA folds into the
surrounding matmuls, and window attention uses static shapes (no dynamic
pad) because the tile contract guarantees divisibility.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model, register_model_factory
from ...modules.attention import SwinTransformerBlocks
from ...modules.conv import leaky_relu
from ...modules.permute import pixel_shuffle
from ...modules.resize import resize, scale_by


class Im2ColConv3x3(nn.Module):
    """3x3 VALID conv computed as im2col + matmul.

    XLA's TPU conv emitter runs the few-channel stem convs at ~27M cycles
    each (profiled: patch_conv0 9.0 ms, patch_conv1 10.4 ms per 1080p
    frame).  On TPU, when strips divide, the conv runs as a Pallas strip
    kernel (ops/conv3x3.py) whose columns never touch HBM — the XLA
    im2col materializes the 9*Cin column tensor in HBM, ~17 ms/frame of
    layout traffic at Cin=48.  ``crop``/``lrelu_slope`` fuse the stem's
    post-conv crop and activation into the same pass.  Param names/shapes
    identical to nn.Conv so checkpoints are interchangeable.
    """
    features: int
    crop: int = 0
    lrelu_slope: float = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        c = self.crop
        strip = 8
        ho = x.shape[1] - 2 - 2 * c
        if (jax.default_backend() == "tpu" and ho >= strip
                and ho % strip == 0 and cin % 8 == 0):
            from ...ops.conv3x3 import stem_conv3x3
            return stem_conv3x3(x, kernel, bias, crop=c,
                                lrelu_slope=self.lrelu_slope, strip=strip)
        h, w = x.shape[1] - 2, x.shape[2] - 2
        cols = jnp.concatenate(
            [x[:, di:di + h, dj:dj + w, :]
             for di in range(3) for dj in range(3)], axis=-1)
        wmat = kernel.reshape(9 * cin, self.features).astype(x.dtype)
        y = jax.lax.dot_general(
            cols, wmat, dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + bias
        if self.lrelu_slope is not None:
            y = jnp.where(y >= 0, y, y * self.lrelu_slope)
        y = y.astype(x.dtype)
        return y[:, c:-c or None, c:-c or None, :] if c else y


class PatchDown(nn.Module):
    """2x2 stride-2 conv downsample (reference: swin_unet.py:45).

    Two implementations, same nn.Conv param tree (checkpoints
    interchangeable):
    - "conv": nn.Conv — r3 measured it beating a space-to-depth matmul
      end-to-end, but r4 profiling showed why the comparison was poisoned:
      the TPU conv emitter assigns {3,0,2,1:T(2,128)} layouts that force
      10.8 ms of layout-conversion reshapes onto NEIGHBORING ops
      (tools/profile_waifu2x.py r4, reshape.99/fusion.4).
    - "matmul": space-to-depth + one MXU matmul, keeping the natural
      {3,2,1,0:T(8,128)} layout through the block.  NUNIF_TPU_PATCHDOWN
      selects; default per r4 measurement.
    """
    out_channels: int

    @nn.compact
    def __call__(self, x):
        import os
        impl = os.environ.get("NUNIF_TPU_PATCHDOWN") or (
            "matmul" if jax.default_backend() == "tpu" else "conv")
        if impl != "matmul":
            return nn.Conv(self.out_channels, (2, 2), strides=(2, 2),
                           padding="VALID", dtype=x.dtype, name="conv")(x)
        cin = x.shape[-1]
        k, bb = _Conv2x2Params(cin, self.out_channels, name="conv")()
        b_, h, w, _ = x.shape
        xs = x.reshape(b_, h // 2, 2, w // 2, 2, cin)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h // 2, w // 2,
                                                    4 * cin)
        y = jax.lax.dot_general(
            xs, k.reshape(4 * cin, self.out_channels).astype(x.dtype),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + bb.astype(jnp.float32)).astype(x.dtype)


class _Conv2x2Params(nn.Module):
    """nn.Conv-shaped param holder ((2,2,cin,cout) kernel + bias) so the
    matmul PatchDown shares checkpoints with the nn.Conv one."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (2, 2, self.cin, self.cout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.cout,), jnp.float32)
        return k, b


class _ProjParams(nn.Module):
    """nn.Dense-shaped param holder ({kernel, bias}, lecun/zeros init) so
    checkpoints stay interchangeable while the caller controls the math."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.cin, self.cout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.cout,), jnp.float32)
        return k, b


class PatchUp(nn.Module):
    """linear -> pixel_shuffle(2) upsample (reference: swin_unet.py:66).

    The stored kernel keeps torch pixel_shuffle column order
    (lane = c*4 + di*2 + dj) for checkpoint compatibility, but the
    matmul runs with columns permuted to (di, dj, c)-major: the shuffle
    then needs no stride-4 lane gather — even/odd output rows are
    contiguous 2C-lane slabs whose (W, 2C) -> (2W, C) width merge is a
    free minor-dims reshape, leaving one sublane row interleave.  The
    permutation is applied to the (Cin, 4C) weight, not the activation.
    """
    out_channels: int

    @nn.compact
    def __call__(self, x):
        import os
        co = self.out_channels
        cin = x.shape[-1]
        k, bb = _ProjParams(cin, co * 4, name="proj")()
        lane = jnp.arange(co * 4)
        perm = (lane % co) * 4 + lane // co   # new (di,dj,c) <- old (c,di,dj)
        kp = k[:, perm].astype(x.dtype)
        bp = bb[perm].astype(x.dtype)
        y = jax.lax.dot_general(
            x, kp, dimension_numbers=(((3,), (0,)), ((), ()))) + bp
        b, h, w, _ = y.shape
        variant = os.environ.get("NUNIF_TPU_PATCHUP", "v1")
        if variant == "v1":
            # single 6-d transpose: XLA emits ONE combined relayout
            # instead of a row-interleave copy + a separate 10.8 ms
            # (W, 2C) -> (2W, C) lane split (tools/profile_waifu2x.py r4)
            y = y.reshape(b, h, w, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(b, h * 2, w * 2, co)
        y = y.reshape(b, h, w, 2, 2 * co).transpose(0, 1, 3, 2, 4)
        return y.reshape(b, h * 2, w * 2, co)


class ToImage(nn.Module):
    """linear head -> pixel_shuffle(scale) (reference: swin_unet.py:86).

    ``do_shuffle=False`` returns the pre-shuffle (H, W, C*s^2) head output —
    the tiled renderer blends in that layout and defers the sub-pixel
    reorder to the final uint8 quantize (the fp32 3-channel-minor shuffle
    is the single most layout-hostile op on TPU: measured ~27ms/tile at
    4K vs ~2ms as a one-shot uint8 pass)."""
    out_channels: int
    scale_factor: int
    do_shuffle: bool = True

    @nn.compact
    def __call__(self, x):
        s = self.scale_factor
        if s == 1:
            return nn.Dense(self.out_channels, dtype=x.dtype, name="proj")(x)
        if s in (2, 4):
            x = nn.Dense(self.out_channels * s * s, dtype=x.dtype, name="proj")(x)
        else:  # 8
            x = nn.Dense(self.out_channels * s * s, dtype=x.dtype, name="proj0")(x)
            x = leaky_relu(x, 0.2)
            x = nn.Dense(self.out_channels * s * s, dtype=x.dtype, name="proj1")(x)
        if not self.do_shuffle:
            return x
        return pixel_shuffle(x, s)


class SwinUNetBase(nn.Module):
    """U-Net over Swin blocks (reference: swin_unet.py:119-199).

    Topology: patch(2 valid 3x3 convs) -> crop6 -> swin1 -> down1 -> swin2
    -> down2 -> swin3(x3 depth) -> up2 -> +skip -> swin4 -> up1 -> +skip
    -> swin5 -> to_image.
    """
    in_channels: int = 3
    out_channels: int = 3
    base_dim: int = 96
    base_layers: int = 2
    scale_factor: int = 1
    norm: str = "none"
    pre_shuffle: bool = False  # see ToImage.do_shuffle

    @nn.compact
    def __call__(self, x):
        assert self.scale_factor in (1, 2, 4, 8)
        c = self.base_dim
        heads = c // 16
        depth = self.base_layers
        w = 6

        x = Im2ColConv3x3(c // 2, name="patch_conv0")(x)
        x = leaky_relu(x, 0.1)
        # crop 6 on each side (fused into the conv kernel): combined with
        # the two valid convs this removes 8 input px per side so the
        # feature grid divides 12 and 16
        x2 = Im2ColConv3x3(c, crop=6, lrelu_slope=0.1,
                           name="patch_conv1")(x)
        assert x2.shape[1] % 12 == 0 and x2.shape[1] % 16 == 0, x2.shape

        x3 = SwinTransformerBlocks(c, heads, depth, w, norm=self.norm,
                                   name="swin1")(x2)
        x4 = PatchDown(c * 2, name="down1")(x3)
        x4 = SwinTransformerBlocks(c * 2, heads, depth, w, norm=self.norm,
                                   name="swin2")(x4)
        x5 = PatchDown(c * 2, name="down2")(x4)
        x5 = SwinTransformerBlocks(c * 2, heads, depth * 3, w, norm=self.norm,
                                   name="swin3")(x5)
        x5 = PatchUp(c * 2, name="up2")(x5)
        # U-Net skips ride into block0's kernel (proj1 = Identity in all
        # reference configs); the fused add saves an XLA pass at this res
        x = SwinTransformerBlocks(c * 2, heads, depth, w, norm=self.norm,
                                  name="swin4")(x5, skip=x4)
        if self.scale_factor in (1, 2):
            x = PatchUp(c, name="up1")(x)
            x = SwinTransformerBlocks(c, heads, depth, w, norm=self.norm,
                                      name="swin5")(x, skip=x3)
            x = ToImage(self.out_channels, self.scale_factor,
                        do_shuffle=not self.pre_shuffle,
                        name="to_image")(x)
        else:
            x = PatchUp(c * 2, name="up1")(x)
            x = SwinTransformerBlocks(c * 2, heads, depth, w, norm=self.norm,
                                      name="swin5")(
                x, skip=nn.Dense(c * 2, dtype=x.dtype, name="proj2")(x3))
            x = ToImage(self.out_channels, self.scale_factor,
                        do_shuffle=not self.pre_shuffle,
                        name="to_image")(x)
        return x


# valid input tiles: size > 16, (size-16) % 12 == 0, (size-16) % 16 == 0
# i.e. size = 16 + 48k  -> size % 48 == 16
_SWIN_TILE_CONSTRAINTS = ((48, 16),)


def _pre_antialias(x):
    """resize 2x up then back down with bicubic (reference: swin_unet.py:249)."""
    h, w = x.shape[-3], x.shape[-2]
    x = resize(x, h * 2, w * 2, mode="bicubic", antialias=True)
    return resize(x, h, w, mode="bicubic", antialias=True)


@register_model
class SwinUNet(I2IBaseModel):
    model_name = "waifu2x.swin_unet_1x"
    in_channels: int = 3
    out_channels: int = 3

    i2i_scale = 1
    i2i_offset = 8
    i2i_blend_size = 4
    i2i_default_tile_size = 256
    i2i_default_batch_size = 8
    i2i_tile_constraints = _SWIN_TILE_CONSTRAINTS

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        z = SwinUNetBase(self.in_channels, self.out_channels, 96, 2,
                         scale_factor=1, name="unet")(x)
        return z if train else jnp.clip(z, 0.0, 1.0)


@register_model
class SwinUNet2x(I2IBaseModel):
    model_name = "waifu2x.swin_unet_2x"
    in_channels: int = 3
    out_channels: int = 3
    base_dim: int = 96
    layer_norm: bool = False
    pre_shuffle_output: bool = False  # renderer blend-in-head-layout hook

    i2i_scale = 2
    i2i_offset = 16
    i2i_blend_size = 8
    i2i_default_tile_size = 256
    i2i_default_batch_size = 8
    i2i_tile_constraints = _SWIN_TILE_CONSTRAINTS

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm = "layernorm_nobias" if self.layer_norm else "none"
        z = SwinUNetBase(self.in_channels, self.out_channels, self.base_dim, 2,
                         scale_factor=2, norm=norm,
                         pre_shuffle=self.pre_shuffle_output, name="unet")(x)
        return z if train else jnp.clip(z, 0.0, 1.0)


@register_model
class SwinUNet4x(I2IBaseModel):
    model_name = "waifu2x.swin_unet_4x"
    in_channels: int = 3
    out_channels: int = 3
    pre_antialias: bool = False
    base_dim: int = 96
    layer_norm: bool = False
    pre_shuffle_output: bool = False

    i2i_scale = 4
    i2i_offset = 32
    i2i_blend_size = 16
    i2i_default_tile_size = 256
    i2i_default_batch_size = 8
    i2i_tile_constraints = _SWIN_TILE_CONSTRAINTS

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.pre_antialias:
            x = _pre_antialias(x)
        norm = "layernorm_nobias" if self.layer_norm else "none"
        z = SwinUNetBase(self.in_channels, self.out_channels, self.base_dim, 2,
                         scale_factor=4, norm=norm,
                         pre_shuffle=self.pre_shuffle_output, name="unet")(x)
        return z if train else jnp.clip(z, 0.0, 1.0)


@register_model
class SwinUNet8x(I2IBaseModel):
    model_name = "waifu2x.swin_unet_8x"
    in_channels: int = 3
    out_channels: int = 3

    i2i_scale = 4  # reference registers 8x trunk with scale=4 (swin_unet.py:296)
    i2i_offset = 64
    i2i_blend_size = 32
    i2i_default_tile_size = 256
    i2i_default_batch_size = 8
    i2i_tile_constraints = _SWIN_TILE_CONSTRAINTS

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        z = SwinUNetBase(self.in_channels, self.out_channels, 96, 2,
                         scale_factor=8, name="unet")(x)
        return z if train else jnp.clip(z, 0.0, 1.0)


@register_model
class SwinUNetDownscaled(I2IBaseModel):
    """4x trunk + bicubic downscale to 2x or 1x — shares weights with
    SwinUNet4x (reference: swin_unet.py:322-394, to_2x/to_1x)."""
    model_name = "waifu2x.swin_unet_downscaled"
    in_channels: int = 3
    out_channels: int = 3
    downscale_factor: int = 2
    pre_antialias: bool = False

    i2i_blend_size = 8
    i2i_default_tile_size = 256
    i2i_default_batch_size = 8
    i2i_tile_constraints = _SWIN_TILE_CONSTRAINTS

    @property
    def i2i_scale(self):  # type: ignore[override]
        return 4 // self.downscale_factor

    @property
    def i2i_offset(self):  # type: ignore[override]
        return 32 // self.downscale_factor

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.pre_antialias:
            x = _pre_antialias(x)
        z = SwinUNetBase(self.in_channels, self.out_channels, 96, 2,
                         scale_factor=4, name="unet")(x)
        if not train:
            z = jnp.clip(z, 0.0, 1.0)
        h, w = z.shape[-3], z.shape[-2]
        z = resize(z, h // self.downscale_factor, w // self.downscale_factor,
                   mode="bicubic", antialias=True)
        return z if train else jnp.clip(z, 0.0, 1.0)


def swin_unet_4xl(**kwargs):
    return SwinUNet4x(base_dim=192, layer_norm=True, **kwargs)


register_model_factory("waifu2x.swin_unet_4xl", swin_unet_4xl)
