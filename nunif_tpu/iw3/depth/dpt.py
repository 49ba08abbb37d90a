"""DPT decoder head for Depth-Anything (flax, NHWC).

Architecture parity target: the DPTHead used by Depth-Anything v1/v2
(consumed by the reference via torch.hub; see
/root/reference/iw3/depth_anything_model.py): per-level 1x1 projection,
resize pyramid (4x/2x deconv, identity, stride-2 conv), scratch 3x3
layer_rn convs, RefineNet feature-fusion with residual conv units, and the
two-stage output head.  Relative head ends in ReLU; metric head in
Sigmoid * max_depth.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from ...modules.resize import resize


def _interp(x, h, w):
    # DPT uses bilinear align_corners=True; our resize matrix is torch's
    # antialias=False bilinear — for upsampling these agree closely; weight
    # conversion fidelity is dominated by convs.
    return resize(x, h, w, mode="bilinear", antialias=False, align_corners=True)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=x.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=x.dtype,
                    name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, res=None, out_hw=None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(res)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        x = _interp(x, *out_hw)
        return nn.Conv(self.features, (1, 1), padding="VALID", dtype=x.dtype,
                       name="out_conv")(x)


class DPTHead(nn.Module):
    features: int
    out_channels: Sequence[int]
    max_depth: float = 0.0  # > 0 => metric head (sigmoid * max_depth)
    out_dim: int = 1        # > 1 => raw multi-channel output (e.g. DA3
                            # mono's depth+sky dual head), no activation

    @nn.compact
    def __call__(self, feats, patch_hw, return_features: bool = False):
        ph, pw = patch_hw
        B = feats[0].shape[0]
        levels = []
        for i, tokens in enumerate(feats):
            x = tokens.reshape(B, ph, pw, tokens.shape[-1])
            x = nn.Conv(self.out_channels[i], (1, 1), padding="VALID",
                        dtype=x.dtype, name=f"projects_{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(self.out_channels[i], (4, 4),
                                     strides=(4, 4), padding="VALID",
                                     dtype=x.dtype, name="resize_0",
                                     transpose_kernel=True)(x)
            elif i == 1:
                x = nn.ConvTranspose(self.out_channels[i], (2, 2),
                                     strides=(2, 2), padding="VALID",
                                     dtype=x.dtype, name="resize_1",
                                     transpose_kernel=True)(x)
            elif i == 3:
                # explicit (1,1) padding: torch Conv2d(s=2, p=1) alignment,
                # NOT flax "SAME" (which pads asymmetrically at stride 2)
                x = nn.Conv(self.out_channels[i], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=x.dtype,
                            name="resize_3")(x)
            levels.append(x)

        rn = [nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                      dtype=x.dtype, name=f"layer{i + 1}_rn")(levels[i])
              for i in range(4)]

        p4 = FeatureFusionBlock(self.features, name="refinenet4")(
            rn[3], out_hw=rn[2].shape[1:3])
        p3 = FeatureFusionBlock(self.features, name="refinenet3")(
            p4, rn[2], out_hw=rn[1].shape[1:3])
        p2 = FeatureFusionBlock(self.features, name="refinenet2")(
            p3, rn[1], out_hw=rn[0].shape[1:3])
        p1 = FeatureFusionBlock(self.features, name="refinenet1")(p2, rn[0])

        out = nn.Conv(self.features // 2, (3, 3), padding="SAME",
                      dtype=p1.dtype, name="output_conv1")(p1)
        out = _interp(out, ph * 14, pw * 14)
        out32 = nn.Conv(32, (3, 3), padding="SAME", dtype=out.dtype,
                        name="output_conv2_0")(out)
        out32 = nn.relu(out32)
        out = nn.Conv(self.out_dim, (1, 1), padding="VALID",
                      dtype=out32.dtype, name="output_conv2_2")(out32)
        if self.out_dim > 1:
            out = out.astype(jnp.float32)
        elif self.max_depth > 0:
            out = nn.sigmoid(out.astype(jnp.float32)) * self.max_depth
        else:
            out = nn.relu(out)
        if return_features:
            # hook set for the ZoeDepth metric head (ZoeD_Any_* variants):
            # [conditional-log-binomial input, bottleneck, attractor levels]
            return out, [out32, rn[3], p4, p3, p2, p1]
        return out  # (B, H, W, 1)
