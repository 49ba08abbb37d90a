"""iw3.depth_aa — depth-map anti-aliasing net (NHWC flax).

Behavioral parity target: reference iw3/models/depth_aa.py — pixel-
unshuffle(2) -> 1x1 proj -> 3 WABlocks(w8, shift T/F/T) -> 1x1 proj
(zero-init) -> pixel-shuffle, residual on the min-max-normalized depth.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model
from ...modules.pad import replication_pad2d, crop2d
from ...modules.permute import pixel_shuffle, pixel_unshuffle
from .row_flow_v3 import WABlock as _WABlockV3


@register_model
class DepthAA(I2IBaseModel):
    model_name = "iw3.depth_aa"
    i2i_scale = 1
    i2i_offset = 0
    i2i_blend_size = 0

    @nn.compact
    def __call__(self, x, train: bool = False, clamp=None):
        # x: (B, H, W, 1) depth in [0,1]
        src = x
        B, H, W, _ = x.shape
        pad_w = 16 - W % 16
        pad_h = 16 - H % 16
        pw1, pw2 = pad_w // 2, pad_w - pad_w // 2
        ph1, ph2 = pad_h // 2, pad_h - pad_h // 2
        h = replication_pad2d(x, (pw1, pw2, ph1, ph2))
        h = pixel_unshuffle(h, 2)
        h = nn.Conv(32, (1, 1), padding="VALID", dtype=x.dtype,
                    name="proj_in")(h)
        # reference depth_aa.py WABlock keeps row_flow_v3's trailing
        # LeakyReLU on the conv MLP
        for i, shift in enumerate((True, False, True)):
            h = _WABlockV3(32, (8, 8), shift=(shift, shift), num_heads=2,
                           name=f"blocks_{i}")(h)
        h = nn.Conv(4, (1, 1), padding="VALID", dtype=x.dtype,
                    kernel_init=nn.initializers.zeros,
                    name="proj_out")(h)
        h = pixel_shuffle(h, 2)
        h = crop2d(h, (pw1, pw2, ph1, ph2))
        x = src + h
        do_clamp = (not train) if clamp is None else clamp
        if do_clamp:
            x = jnp.clip(x, 0.0, 1.0)
        return x


def depth_aa_infer(model, params, x):
    """reference depth_aa.py infer: normalize -> forward -> denormalize."""
    min_v = jnp.min(x)
    max_v = jnp.max(x)
    scale = jnp.maximum(max_v - min_v, 1e-12)
    xn = jnp.nan_to_num((x - min_v) / scale)
    y = model.apply_fn(params, xn, clamp=False)
    return y * scale + min_v
