"""inpaint.light_video_inpaint_v1 — temporal disocclusion inpainting
(NHWC flax).

Behavioral parity target: reference iw3/models/light_video_inpaint_v1.py
:92-241 — same GMLP U-net as light_inpaint_v1 but with temporal
GMLP3D blocks (window (SEQ_LEN,1,1) over the 12-frame clip axis)
interleaved at level 2; infer pads the clip to a multiple of SEQ_LEN with
edge frames.

TPU note: the reference micro-batches the 2D stages to bound VRAM
(:162-193); under XLA the full 12-frame batch is one program and the
scheduler handles memory, so the micro-batch loop is dropped by design.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model
from ...modules.attention import WindowGMLP3d
from ...modules.conv import leaky_relu
from ...modules.norm import LayerNormNoBias
from ...modules.pad import replication_pad2d, crop2d
from ...modules.permute import pixel_shuffle, pixel_unshuffle
from .light_inpaint_v1 import (
    GMLPBlock, GLUConvMLP, inpaint_preprocess,
)

SEQ_LEN = 12  # reference :89


class GMLP3DBlock(nn.Module):
    """reference :61-78: temporal gMLP over the clip (batch) axis."""
    in_channels: int
    window_size: tuple
    mlp_ratio: int = 2
    shift: bool = False

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) where B is the frame axis -> (1, B, H, W, C)
        B, H, W, C = x.shape
        norm1 = LayerNormNoBias(name="norm1")
        norm2 = LayerNormNoBias(name="norm2")
        t = x[None]
        t = t + WindowGMLP3d(self.in_channels, self.window_size,
                             mlp_ratio=self.mlp_ratio, shift=self.shift,
                             name="gmlp")(t, norm1, norm2)
        x = t[0]
        x = x + GLUConvMLP(self.in_channels, mlp_ratio=1, name="glu_conv")(x)
        return x


@register_model
class LightVideoInpaintV1(I2IBaseModel):
    model_name = "inpaint.light_video_inpaint_v1"
    i2i_scale = 1
    i2i_offset = 16
    i2i_blend_size = 8

    base_dim: int = 96
    lv2_mlp_ratio: int = 1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False,
                 skip_i2i_offset: bool = True):
        """x: (SEQ_LEN, H, W, 3) masked clip; mask: (SEQ_LEN, H, W, 1)."""
        assert mask is not None
        assert x.shape[0] == SEQ_LEN, x.shape
        df = 4
        mod = 16
        pack = df * df
        C = self.base_dim
        C2 = C * 2
        src = x
        x = (x - 0.5) / 0.5
        B, H, W, _ = x.shape
        pad1 = (mod * df) - W % (mod * df)
        pad2 = (mod * df) - H % (mod * df)
        x = replication_pad2d(x, (0, pad1, 0, pad2))
        m = replication_pad2d(mask, (0, pad1, 0, pad2))

        h = nn.Conv(C, (df, df), strides=(df, df), padding="VALID",
                    dtype=x.dtype, name="patch")(x)
        h = leaky_relu(h, 0.1)
        mask_bias = self.param("mask_bias",
                               nn.initializers.truncated_normal(0.01),
                               (1, 1, 1, C))
        m_tok = jnp.max(pixel_unshuffle(m, df), axis=-1, keepdims=True) > 0.99
        h = jnp.where(m_tok, mask_bias.astype(h.dtype), h)

        h1 = GMLPBlock(C, 16, mlp_ratio=2, shift=False, name="enc1")(h)
        h2 = nn.Conv(C2, (2, 2), strides=(2, 2), padding="VALID",
                     dtype=x.dtype, name="down")(h1)
        # level-2 stack (reference :107-113): 2D windows interleaved with
        # temporal 3D blocks — [2D shift, 3D, 2D, 3D, 2D shift]
        h2 = GMLPBlock(C2, (8, 8), mlp_ratio=self.lv2_mlp_ratio,
                       shift=True, name="enc2_0")(h2)
        h2 = GMLP3DBlock(C2, (SEQ_LEN, 1, 1), mlp_ratio=2,
                         name="enc2_1")(h2)
        h2 = GMLPBlock(C2, (8, 8), mlp_ratio=self.lv2_mlp_ratio,
                       shift=False, name="enc2_2")(h2)
        h2 = GMLP3DBlock(C2, (SEQ_LEN, 1, 1), mlp_ratio=2,
                         name="enc2_3")(h2)
        h2 = GMLPBlock(C2, (8, 8), mlp_ratio=self.lv2_mlp_ratio,
                       shift=True, name="enc2_4")(h2)
        h2 = nn.Conv(C * 4, (1, 1), padding="VALID", dtype=x.dtype,
                     name="up")(h2)
        h2 = pixel_shuffle(h2, 2)
        h = GMLPBlock(C, 16, mlp_ratio=2, shift=False, name="dec1")(h1 + h2)
        h = nn.Conv(3 * pack, (1, 1), padding="VALID", dtype=x.dtype,
                    name="to_image")(h)
        out = pixel_shuffle(h, df)
        out = crop2d(out, (0, pad1, 0, pad2))
        m = crop2d(m, (0, pad1, 0, pad2))

        if not skip_i2i_offset:
            off = self.i2i_offset
            src = crop2d(src, (off,) * 4)
            m = crop2d(m, (off,) * 4)
            out = crop2d(out, (off,) * 4)
        composed = src * (1 - m) + out * m
        if train:
            return composed
        return jnp.clip(composed, 0.0, 1.0)


@register_model
class LightVideoInpaintV1Medium(LightVideoInpaintV1):
    model_name = "inpaint.light_video_inpaint_v1_medium"
    base_dim: int = 128
    lv2_mlp_ratio: int = 2


@register_model
class LightVideoInpaintV1Large(LightVideoInpaintV1):
    model_name = "inpaint.light_video_inpaint_v1_large"
    base_dim: int = 192
    lv2_mlp_ratio: int = 2


from ...models import register_model_alias  # noqa: E402

register_model_alias("inpaint.light_video_inpaint_v1_small",
                     "inpaint.light_video_inpaint_v1")


import functools


@functools.lru_cache(maxsize=16)
def _jitted_clip_inpaint(model, closing, inner_dilation, outer_dilation,
                         base_width):
    import jax

    @jax.jit
    def fn(params, x, mask):
        x, mask = inpaint_preprocess(x, mask, closing=closing,
                                     inner_dilation=inner_dilation,
                                     outer_dilation=outer_dilation,
                                     base_width=base_width)
        return model.apply_fn(params, x, mask=mask, skip_i2i_offset=True)
    return fn


def video_inpaint_infer(model, params, x, mask, closing=False,
                        inner_dilation=0, outer_dilation=0, base_width=None):
    """reference :136-160: pad the clip to SEQ_LEN with edge frames,
    one jitted (preprocess+forward) program per SEQ_LEN clip, unpad."""
    B = x.shape[0]
    pad_b = (SEQ_LEN - B % SEQ_LEN) % SEQ_LEN
    pad_b1 = pad_b // 2
    pad_b2 = pad_b - pad_b1
    if pad_b:
        x = jnp.concatenate([jnp.repeat(x[:1], pad_b1, axis=0), x,
                             jnp.repeat(x[-1:], pad_b2, axis=0)], axis=0)
        mask = jnp.concatenate([jnp.repeat(mask[:1], pad_b1, axis=0), mask,
                                jnp.repeat(mask[-1:], pad_b2, axis=0)], axis=0)
    fn = _jitted_clip_inpaint(model, bool(closing), inner_dilation,
                              outer_dilation, base_width)
    outs = []
    for i in range(0, x.shape[0], SEQ_LEN):
        outs.append(fn(params, x[i:i + SEQ_LEN], mask[i:i + SEQ_LEN]))
    out = jnp.concatenate(outs, axis=0)
    if pad_b1:
        out = out[pad_b1:]
    if pad_b2:
        out = out[:-pad_b2]
    return out
