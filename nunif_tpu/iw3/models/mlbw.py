"""sbs.mlbw — multi-layer blend warp net.

Behavioral parity target: reference iw3/models/mlbw.py:38-250 (lv1 1x9
row convs around a WABlock trunk on (1,8)-unshuffled features; outputs
num_layers deltas + softmax layer weights [+ optional hole-mask logits];
delta_output inference mode).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model, register_model_factory
from ...modules.attention import WindowMHA2d, WindowScoreBias
from ...modules.pad import replication_pad2d, crop2d
from ...modules.permute import pixel_shuffle2, pixel_unshuffle2

OFFSET = 32


class WABlock(nn.Module):
    """reference mlbw.py:18-34 (conv_mlp without trailing activation)."""
    in_channels: int
    window_size: tuple
    shift: tuple
    num_heads: int

    @nn.compact
    def __call__(self, x):
        bias = WindowScoreBias(self.window_size, name="bias")()
        x = x + WindowMHA2d(self.in_channels, num_heads=self.num_heads,
                            window_size=self.window_size, shift=self.shift,
                            name="mha")(x, attn_mask=bias)
        h = nn.Conv(self.in_channels, (1, 1), padding="VALID",
                    dtype=x.dtype, name="conv_mlp_0")(x)
        h = nn.gelu(h, approximate=False)
        h = replication_pad2d(h, (1, 1, 1, 1))
        h = nn.Conv(self.in_channels, (3, 3), padding="VALID",
                    dtype=x.dtype, name="conv_mlp_3")(h)
        return x + h


@register_model
class MLBW(I2IBaseModel):
    model_name = "sbs.mlbw"
    i2i_scale = 1
    i2i_offset = OFFSET
    i2i_blend_size = 4
    num_layers: int = 2
    base_dim: int = 32
    small: bool = False
    cycle: bool = False
    hole_mask: bool = False
    symmetric: bool = False
    delta_output: bool = True

    @property
    def i2i_in_channels(self):
        return 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: 3-channel packed [depth, div_feat, conv_feat] NHWC
        df = (1, 8)
        mod = 4
        pack = df[0] * df[1]
        C = self.base_dim * self.num_layers
        assert C >= pack and C // pack >= self.num_layers * 2
        B, H, W, _ = x.shape
        pad_w = (mod * df[1]) - W % (mod * df[1])
        pad_h = (mod * df[0]) - H % (mod * df[0])
        pw1, pw2 = pad_w // 2, pad_w - pad_w // 2
        ph1, ph2 = pad_h // 2, pad_h - pad_h // 2
        h = replication_pad2d(x, (pw1, pw2, ph1, ph2))

        h = replication_pad2d(h, (4, 4, 0, 0))
        h = nn.Conv(C // pack, (1, 9), padding="VALID", dtype=x.dtype,
                    name="lv1_in_1")(h)
        h = x1 = nn.leaky_relu(h, negative_slope=0.2)

        h = pixel_unshuffle2(h, df)
        if self.small:
            specs = [((False, True),), ((False, False),)]
        else:
            specs = [((True, True),), ((False, False),),
                     ((True, True),), ((False, False),)]
        for i, (shift,) in enumerate(specs):
            h = WABlock(C, (4, 4), shift=shift, num_heads=self.num_layers,
                        name=f"lv2_{i}")(h)
        h = pixel_shuffle2(h, df)

        h = h + x1
        h = replication_pad2d(h, (4, 4, 0, 0))
        extra = 1 if self.hole_mask else 0
        h = nn.Conv(self.num_layers * 2 + extra, (1, 9), padding="VALID",
                    dtype=x.dtype, name="lv1_out_1")(h)
        h = crop2d(h, (pw1, pw2, ph1, ph2))

        if self.hole_mask:
            delta = h[..., :self.num_layers]
            layer_weight = h[..., self.num_layers:self.num_layers * 2]
            hole_mask_logits = h[..., self.num_layers * 2:]
        else:
            delta = h[..., :self.num_layers]
            layer_weight = h[..., self.num_layers:]
            hole_mask_logits = None

        layer_weight = nn.softmax(layer_weight.astype(jnp.float32), axis=-1)
        if self.hole_mask:
            return delta, layer_weight, hole_mask_logits
        return delta, layer_weight


register_model_factory("sbs.mlbw_l2",
                       lambda **kw: MLBW(num_layers=2, base_dim=32, **kw))
register_model_factory("sbs.mlbw_l4",
                       lambda **kw: MLBW(num_layers=4, base_dim=32, **kw))
register_model_factory("sbs.mlbw_l2s",
                       lambda **kw: MLBW(num_layers=2, base_dim=32, small=True, **kw))
register_model_factory("sbs.mlbw_l4s",
                       lambda **kw: MLBW(num_layers=4, base_dim=32, small=True, **kw))
register_model_factory("sbs.mask_mlbw_l2",
                       lambda **kw: MLBW(num_layers=2, base_dim=32, hole_mask=True, **kw))
