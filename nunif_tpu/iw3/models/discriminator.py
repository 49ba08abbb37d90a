"""iw3 inpainting discriminators (NHWC flax).

Behavioral parity target: reference iw3/models/discriminator.py:119-270 —
L3ConditionalDiscriminator (conditioned PatchGAN reused from waifu2x) and
FFCDiscriminator (LaMa-style: strided conv stages each followed by a
Fourier-convolution block), both optionally returning a downsampled,
dilated hole mask aligned with the patch logits for masked hinge loss.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...models import Model, register_model
from ...modules.conv import leaky_relu
from ...modules.fourier_unit import FourierUnit
from ...modules.pad import replication_pad2d, crop2d
from ...modules.permute import pixel_unshuffle
from ...modules.pool import max_pool2d
from ...waifu2x.models.discriminator import (
    normalize, modcrop, fit_to_size, ImageToCondition, ResBlockGNLReLU,
)


def mask_dilate(mask):
    """3x3 max-pool dilation of the token mask (reference :20-24)."""
    return max_pool2d(mask, 3, stride=1)


def _mask_to_logit_grid(mask, logits_hw):
    """(B,H,W,1) image mask -> (B,h,w,1) grid aligned to 8x-downsampled,
    border-cropped logits (reference :135-142,200-207)."""
    m = jnp.max(pixel_unshuffle(mask, 8), axis=-1, keepdims=True)
    m = mask_dilate(m.astype(jnp.float32))
    m = crop2d(m, (2,) * 4)
    assert m.shape[1:3] == logits_hw, (m.shape, logits_hw)
    return m > 0


class FFCBlock(nn.Module):
    """reference :147-164: spectral unit + conv fusion, residual."""
    in_channels: int

    @nn.compact
    def __call__(self, x):
        f = FourierUnit(self.in_channels, self.in_channels, residual=False,
                        name="ffc")(x)
        h = jnp.concatenate([x, f], axis=-1)
        h = nn.Conv(self.in_channels, (1, 1), padding="VALID", dtype=x.dtype,
                    name="fusion_0")(h)
        h = leaky_relu(h, 0.2)
        h = replication_pad2d(h, (1, 1, 1, 1))
        h = nn.Conv(self.in_channels, (3, 3), padding="VALID", dtype=x.dtype,
                    name="fusion_3")(h)
        return x + h


@register_model
class FFCDiscriminator(Model):
    """reference :167-213."""
    model_name = "inpaint.ffc_discriminator"

    @nn.compact
    def __call__(self, x, c=None, mask=None, train: bool = False):
        x = modcrop(x, 8)
        if mask is not None:
            mask = fit_to_size(x, mask)
        x = normalize(x)
        for i, ch in enumerate((64, 128, 256)):
            x = replication_pad2d(x, (1, 1, 1, 1))
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding="VALID",
                        dtype=x.dtype, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=x.dtype,
                             name=f"gn{i}")(x)
            x = leaky_relu(x, 0.2)
            x = FFCBlock(ch, name=f"ffc{i}")(x)
        x = nn.Conv(1, (1, 1), padding="VALID", dtype=x.dtype,
                    name="classifier")(x)
        x = crop2d(x, (2,) * 4)
        if mask is not None:
            return x, _mask_to_logit_grid(mask, x.shape[1:3])
        return x


@register_model
class InpaintL3ConditionalDiscriminator(Model):
    """reference :110-144: waifu2x L3 PatchGAN + image condition, with the
    inpaint mask output."""
    model_name = "inpaint.l3_conditional_discriminator"

    @nn.compact
    def __call__(self, x, c=None, mask=None, train: bool = False):
        x = modcrop(x, 8)
        c = fit_to_size(x, c if c is not None else x)
        if mask is not None:
            mask = fit_to_size(x, mask)
        cond = ImageToCondition(32, (256,), 1, name="to_cond")(c)
        x = normalize(x)
        # L3 feature stack (waifu2x l3_discriminator structure)
        for i, ch in enumerate((64, 128, 256)):
            x = replication_pad2d(x, (1, 1, 1, 1))
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding="VALID",
                        dtype=x.dtype, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-6,
                             dtype=x.dtype, name=f"gn{i}")(x)
            x = leaky_relu(x, 0.2)
        x = ResBlockGNLReLU(256, name="res")(x)
        x = x + cond[0].astype(x.dtype)
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=x.dtype,
                    name="classifier")(x)
        x = crop2d(x, (2,) * 4)
        if mask is not None:
            return x, _mask_to_logit_grid(mask, x.shape[1:3])
        return x
