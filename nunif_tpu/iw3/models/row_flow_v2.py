"""sbs.row_flow_v2 — row-conv horizontal delta-warp net.

Behavioral parity target: reference iw3/models/row_flow_v2.py:10-80
(1x3 feature conv, non_overlap 1x1 head, 1x9 overlap residual stack;
delta_output inference returns non_overlap + overlap_residual).
"""
from __future__ import annotations

import flax.linen as nn

from ...models import I2IBaseModel, register_model
from ...modules.pad import replication_pad2d


@register_model
class RowFlowV2(I2IBaseModel):
    model_name = "sbs.row_flow_v2"
    i2i_scale = 1
    i2i_offset = 28
    i2i_blend_size = 4
    symmetric: bool = False
    delta_output: bool = True

    @property
    def i2i_in_channels(self):
        return 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: 3-channel packed [depth, div_feat, conv_feat] NHWC
        h = replication_pad2d(x, (1, 1, 0, 0))
        h = nn.Conv(16, (1, 3), padding="VALID", dtype=x.dtype, name="feature_0")(h)
        h = nn.relu(h)
        non_overlap = nn.Conv(1, (1, 1), padding="VALID", dtype=x.dtype,
                              name="non_overlap")(h)
        r = replication_pad2d(h, (4, 4, 0, 0))
        r = nn.relu(nn.Conv(16, (1, 9), padding="VALID", dtype=x.dtype,
                            name="overlap_residual_0")(r))
        r = replication_pad2d(r, (4, 4, 0, 0))
        r = nn.relu(nn.Conv(32, (1, 9), padding="VALID", dtype=x.dtype,
                            name="overlap_residual_2")(r))
        r = replication_pad2d(r, (4, 4, 0, 0))
        r = nn.relu(nn.Conv(32, (1, 9), padding="VALID", dtype=x.dtype,
                            name="overlap_residual_4")(r))
        r = replication_pad2d(r, (1, 1, 1, 1))
        r = nn.Conv(1, (3, 3), padding="VALID", dtype=x.dtype,
                    name="overlap_residual_6")(r)
        return non_overlap + r
