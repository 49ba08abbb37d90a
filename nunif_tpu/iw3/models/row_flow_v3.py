"""sbs.row_flow_v3 — learned horizontal delta-warp net.

Behavioral parity target: reference iw3/models/row_flow_v3.py:32-117
(WABlock stack over (1,8) pixel-unshuffled features, replication-padded
3x3 head, delta_output inference mode).

TPU-first: NHWC throughout; the (1,8) unshuffle keeps rows intact so the
window attention below operates on 8-pixel-wide packed columns — all
static shapes, fused by XLA.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model
from ...modules.attention import WindowMHA2d, WindowScoreBias
from ...modules.pad import replication_pad2d, crop2d
from ...modules.permute import pixel_shuffle2, pixel_unshuffle2

OFFSET = 32


class WABlock(nn.Module):
    """reference row_flow_v3.py:13-29 (also iw3/models/depth_aa.py:11-26,
    which adds window shift)."""
    in_channels: int
    window_size: tuple
    shift: tuple = (False, False)
    num_heads: int = 2

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
        h = nn.leaky_relu(h, negative_slope=0.1)
        return x + h


@register_model
class RowFlowV3(I2IBaseModel):
    model_name = "sbs.row_flow_v3"
    i2i_scale = 1
    i2i_offset = OFFSET
    i2i_blend_size = 4
    symmetric: bool = False
    delta_output: bool = True

    @property
    def i2i_in_channels(self):
        return 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        # delta-output inference: x is the 3-channel packed input
        # [depth, divergence_feat, convergence_feat] (NHWC)
        df = (1, 8)
        mod = 4 * 3
        pack = df[0] * df[1]
        C = 64
        B, H, W, _ = x.shape
        pad1 = (mod * df[1]) - W % (mod * df[1])
        pad2 = (mod * df[0]) - H % (mod * df[0])
        assert C >= pack
        h = replication_pad2d(x, (0, pad1, 0, pad2))
        h = pixel_unshuffle2(h, df)
        h = nn.Conv(C, (1, 1), padding="VALID", dtype=x.dtype,
                    name="blocks_0")(h)
        h = WABlock(C, (4, 4), name="blocks_1")(h)
        h = WABlock(C, (3, 3), name="blocks_2")(h)
        h = pixel_shuffle2(h, df)
        h = crop2d(h, (0, pad1, 0, pad2))
        h = replication_pad2d(h, (1, 1, 1, 1))
        delta = nn.Conv(1, (3, 3), padding="VALID", dtype=x.dtype,
                        name="last_layer_1")(h)
        return delta
