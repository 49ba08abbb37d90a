"""inpaint.light_inpaint_v1 — disocclusion inpainting net (NHWC flax).

Behavioral parity target: reference iw3/models/light_inpaint_v1.py:15-150 —
pixel-unshuffle(4) patch embed, learned mask token substitution, GMLP
U-net (w16 enc -> w8 x4 -> w16 dec), ICNR pixel-shuffle head, masked
composite with the source.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model
from ...modules.attention import WindowGMLP2d
from ...modules.conv import leaky_relu
from ...modules.norm import LayerNormNoBias
from ...modules.pad import replication_pad2d, crop2d
from ...modules.permute import pixel_shuffle, pixel_unshuffle
from ..dilation import mask_closing, dilate_inner, dilate_outer


def _gaussian_kernel1d(k: int) -> np.ndarray:
    sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    x = np.arange(k) - (k - 1) / 2
    w = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (w / w.sum()).astype(np.float32)


def gaussian_blur2d(x, kernel_size: int = 15):
    """Separable gaussian (reference nunif/modules/gaussian_filter.py)."""
    import jax
    k = jnp.asarray(_gaussian_kernel1d(kernel_size))
    C = x.shape[-1]
    pad = kernel_size // 2
    kh = jnp.tile(k.reshape(kernel_size, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(k.reshape(1, kernel_size, 1, 1), (1, 1, 1, C))
    x32 = x.astype(jnp.float32)
    x32 = jax.lax.conv_general_dilated(
        x32, kh, (1, 1), ((pad, pad), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    x32 = jax.lax.conv_general_dilated(
        x32, kw, (1, 1), ((0, 0), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    return x32.astype(x.dtype)


class GLUConvMLP(nn.Module):
    """reference light_inpaint_v1.py:15-34 (no trailing activation)."""
    out_channels: int
    kernel_size: int = 3
    mlp_ratio: int = 2

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_channels * self.mlp_ratio)
        x = nn.Conv(mid, (1, 1), padding="VALID", dtype=x.dtype, name="w1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)
        p = (self.kernel_size - 1) // 2
        x = replication_pad2d(x, (p, p, p, p))
        return nn.Conv(self.out_channels,
                       (self.kernel_size, self.kernel_size),
                       padding="VALID", dtype=x.dtype, name="w2")(x)


class GMLPBlock(nn.Module):
    """reference light_inpaint_v1.py:37-49."""
    in_channels: int
    window_size: int
    mlp_ratio: int = 2
    shift: bool = False

    @nn.compact
    def __call__(self, x):
        norm1 = LayerNormNoBias(name="norm1")
        norm2 = LayerNormNoBias(name="norm2")
        x = x + WindowGMLP2d(self.in_channels, self.window_size,
                             mlp_ratio=self.mlp_ratio, shift=self.shift,
                             name="gmlp")(x, norm1, norm2)
        x = x + GLUConvMLP(self.in_channels, mlp_ratio=1,
                           name="glu_conv")(x)
        return x


@register_model
class LightInpaintV1(I2IBaseModel):
    model_name = "inpaint.light_inpaint_v1"
    i2i_scale = 1
    i2i_offset = 16
    i2i_blend_size = 8

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False,
                 skip_i2i_offset: bool = True):
        """x: (B,H,W,3) masked image; mask: (B,H,W,1) in {0,1}."""
        assert mask is not None
        df = 4
        mod = 16
        pack = df * df
        C = 96
        src = x
        x = (x - 0.5) / 0.5
        B, H, W, _ = x.shape
        pad1 = (mod * df) - W % (mod * df)
        pad2 = (mod * df) - H % (mod * df)
        x = replication_pad2d(x, (0, pad1, 0, pad2))
        m = replication_pad2d(mask, (0, pad1, 0, pad2))

        h = pixel_unshuffle(x, df)
        h = nn.Conv(C, (1, 1), padding="VALID", dtype=x.dtype,
                    name="patch_0")(h)
        h = leaky_relu(h, 0.2)
        mask_bias = self.param("mask_bias",
                               nn.initializers.truncated_normal(0.01),
                               (1, 1, 1, C))
        m_tok = jnp.max(pixel_unshuffle(m, df), axis=-1, keepdims=True) > 0.99
        h = jnp.where(m_tok, mask_bias.astype(h.dtype), h)

        h1 = GMLPBlock(C, 16, shift=True, name="enc1")(h)
        h2 = nn.Conv(C * 2, (2, 2), strides=(2, 2), padding="VALID",
                     dtype=x.dtype, name="down")(h1)
        for i, shift in enumerate((False, True, False, True)):
            h2 = GMLPBlock(C * 2, 8, shift=shift, name=f"enc2_{i}")(h2)
        h2 = nn.Conv(C * 4, (1, 1), padding="VALID", dtype=x.dtype,
                     name="up")(h2)
        h2 = pixel_shuffle(h2, 2)
        h = GMLPBlock(C, 16, shift=False, name="dec1")(h1 + h2)
        h = replication_pad2d(h, (1, 1, 1, 1))
        h = nn.Conv(3 * pack, (3, 3), padding="VALID", dtype=x.dtype,
                    name="to_image_1")(h)
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


def inpaint_preprocess(x, mask, closing=False, inner_dilation=0,
                       outer_dilation=0, base_width=None):
    """reference light_inpaint_v1.py:94-104."""
    if closing:
        mask = mask_closing(mask)
    else:
        mask = mask.astype(jnp.float32)
    mask = dilate_inner(mask, n_iter=inner_dilation, base_width=base_width)
    mask = dilate_outer(mask, n_iter=outer_dilation, base_width=base_width)
    x = x * (1 - mask)
    mask = jnp.clip(gaussian_blur2d(mask, 15) + mask, 0.0, 1.0)
    return x, mask


import functools


@functools.lru_cache(maxsize=32)
def _jitted_inpaint(model, closing, inner_dilation, outer_dilation,
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


def inpaint_infer(model, params, x, mask, closing=False, inner_dilation=0,
                  outer_dilation=0, base_width=None):
    """One jitted program per (model, options, shape) — preprocess +
    forward + composite all fuse on device."""
    return _jitted_inpaint(model, bool(closing), inner_dilation,
                           outer_dilation, base_width)(params, x, mask)
