"""iw3.sod_v1 — salient object detection for convergence estimation.

Behavioral parity target: reference iw3/models/sod_v1.py — U2NETP over
[rgb(3), depth, depth^0.5, depth^2] at 192x192.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model
from ...modules.resize import resize
from ...utils.u2netp import U2NETP

SOD_SIZE = 192


@register_model
class SODV1(I2IBaseModel):
    model_name = "iw3.sod_v1"
    i2i_scale = 1
    i2i_offset = 0
    i2i_blend_size = 0

    @property
    def i2i_in_channels(self):
        return 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, 4) = rgb + depth, any size; resized to 192 internally
        rgb, depth = x[..., :3], x[..., 3:4]
        feats = jnp.concatenate(
            [depth, depth ** 0.5, depth ** 2], axis=-1)
        h = jnp.concatenate([rgb, feats], axis=-1)
        if h.shape[1:3] != (SOD_SIZE, SOD_SIZE):
            h = resize(h, SOD_SIZE, SOD_SIZE, mode="bilinear", antialias=True)
        outs = U2NETP(name="u2netp")(h)
        d0 = outs[0]
        if d0.shape[1:3] != x.shape[1:3]:
            d0 = resize(d0, x.shape[1], x.shape[2], mode="bilinear",
                        antialias=False)
        if train:
            return outs
        return jnp.clip(d0, 0.0, 1.0)
