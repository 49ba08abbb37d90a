"""Plain-torch iw3 stereo models matching the reference checkpoint format.

Behavioral specs: reference iw3/models/row_flow_v2.py:10-92,
row_flow_v3.py:13-112, mlbw.py:18-251.  Only the delta-producing
``_forward`` trunks are implemented (eval mode) — the warp/composite
wrappers live outside the networks in the TPU rebuild.
"""
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F

from .winc import WindowMHA2d, WindowScoreBias


def _pixel_unshuffle_rect(x, df):
    """torch F.pixel_unshuffle generalized to rect factors (reference
    nunif/modules/permute.py pixel_unshuffle)."""
    dh, dw = df
    B, C, H, W = x.shape
    x = x.reshape(B, C, H // dh, dh, W // dw, dw)
    x = x.permute(0, 1, 3, 5, 2, 4)
    return x.reshape(B, C * dh * dw, H // dh, W // dw)


def _pixel_shuffle_rect(x, df):
    dh, dw = df
    B, C, H, W = x.shape
    c = C // (dh * dw)
    x = x.reshape(B, c, dh, dw, H, W)
    x = x.permute(0, 1, 4, 2, 5, 3)
    return x.reshape(B, c, H * dh, W * dw)


class RowFlowV2(nn.Module):
    def __init__(self):
        super().__init__()
        self.feature = nn.Sequential(OrderedDict([
            ("0", nn.Conv2d(3, 16, kernel_size=(1, 3))),
            ("1", nn.ReLU())]))
        self.non_overlap = nn.Conv2d(16, 1, 1)
        self.overlap_residual = nn.Sequential(OrderedDict([
            ("0", nn.Conv2d(16, 16, kernel_size=(1, 9))),
            ("1", nn.ReLU()),
            ("2", nn.Conv2d(16, 32, kernel_size=(1, 9))),
            ("3", nn.ReLU()),
            ("4", nn.Conv2d(32, 32, kernel_size=(1, 9))),
            ("5", nn.ReLU()),
            ("6", nn.Conv2d(32, 1, kernel_size=3))]))

    def forward(self, x):
        x = F.pad(x, (1, 1, 0, 0), mode="replicate")
        x = self.feature(x)
        non_overlap = self.non_overlap(x)
        r = F.pad(x, (4, 4, 0, 0), mode="replicate")
        r = F.relu(self.overlap_residual[0](r))
        r = F.pad(r, (4, 4, 0, 0), mode="replicate")
        r = F.relu(self.overlap_residual[2](r))
        r = F.pad(r, (4, 4, 0, 0), mode="replicate")
        r = F.relu(self.overlap_residual[4](r))
        r = F.pad(r, (1, 1, 1, 1), mode="replicate")
        r = self.overlap_residual[6](r)
        return non_overlap + r


class WABlockV3(nn.Module):
    """row_flow_v3 WABlock (trailing LeakyReLU on conv_mlp)."""

    def __init__(self, in_channels, window_size, num_heads=2, shift=False,
                 leaky=True):
        super().__init__()
        self.mha = WindowMHA2d(in_channels, num_heads, window_size,
                               shift=shift)
        self.conv_mlp = nn.Sequential(
            nn.Conv2d(in_channels, in_channels, 1), nn.GELU(), nn.Identity(),
            nn.Conv2d(in_channels, in_channels, 3))
        self.bias = WindowScoreBias(window_size)
        self.leaky = leaky

    def forward(self, x):
        x = x + self.mha(x, attn_mask=self.bias())
        h = self.conv_mlp[0](x)
        h = F.gelu(h)
        h = F.pad(h, (1, 1, 1, 1), mode="replicate")
        h = self.conv_mlp[3](h)
        if self.leaky:
            h = F.leaky_relu(h, 0.1)
        return x + h


class RowFlowV3(nn.Module):
    def __init__(self):
        super().__init__()
        df = (1, 8)
        pack = df[0] * df[1]
        C = 64
        self.downscaling_factor = df
        self.mod = 4 * 3
        self.blocks = nn.Sequential(
            nn.Conv2d(3 * pack, C, 1),
            WABlockV3(C, (4, 4)),
            WABlockV3(C, (3, 3)))
        self.last_layer = nn.Sequential(
            nn.Identity(), nn.Conv2d(C // pack, 1, 3))

    def forward(self, x):
        H, W = x.shape[2:]
        df = self.downscaling_factor
        pad1 = (self.mod * df[1]) - W % (self.mod * df[1])
        pad2 = (self.mod * df[0]) - H % (self.mod * df[0])
        x = F.pad(x, (0, pad1, 0, pad2), mode="replicate")
        x = _pixel_unshuffle_rect(x, df)
        x = self.blocks(x)
        x = _pixel_shuffle_rect(x, df)
        x = F.pad(x, (0, -pad1, 0, -pad2))
        x = F.pad(x, (1, 1, 1, 1), mode="replicate")
        return self.last_layer[1](x)


class MLBW(nn.Module):
    def __init__(self, num_layers=2, base_dim=32, small=False,
                 hole_mask=False):
        super().__init__()
        df = (1, 8)
        pack = df[0] * df[1]
        self.downscaling_factor = df
        self.mod = 4
        self.num_layers = num_layers
        self.hole_mask = hole_mask
        C = base_dim * num_layers
        self.lv1_in = nn.Sequential(
            nn.Identity(), nn.Conv2d(3, C // pack, kernel_size=(1, 9)),
            nn.LeakyReLU(0.2))
        if small:
            self.lv2 = nn.Sequential(
                WABlockV3(C, (4, 4), num_heads=num_layers,
                          shift=(False, True), leaky=False),
                WABlockV3(C, (4, 4), num_heads=num_layers,
                          shift=(False, False), leaky=False))
        else:
            self.lv2 = nn.Sequential(
                WABlockV3(C, (4, 4), num_heads=num_layers,
                          shift=(True, True), leaky=False),
                WABlockV3(C, (4, 4), num_heads=num_layers,
                          shift=(False, False), leaky=False),
                WABlockV3(C, (4, 4), num_heads=num_layers,
                          shift=(True, True), leaky=False),
                WABlockV3(C, (4, 4), num_heads=num_layers,
                          shift=(False, False), leaky=False))
        extra = 1 if hole_mask else 0
        self.lv1_out = nn.Sequential(
            nn.Identity(),
            nn.Conv2d(C // pack, num_layers * 2 + extra, kernel_size=(1, 9)))

    def forward(self, x):
        H, W = x.shape[2:]
        df = self.downscaling_factor
        pad_w = (self.mod * df[1]) - W % (self.mod * df[1])
        pad_h = (self.mod * df[0]) - H % (self.mod * df[0])
        pw1, pw2 = pad_w // 2, pad_w - pad_w // 2
        ph1, ph2 = pad_h // 2, pad_h - pad_h // 2
        x = F.pad(x, (pw1, pw2, ph1, ph2), mode="replicate")
        x = F.pad(x, (4, 4, 0, 0), mode="replicate")
        x = x1 = F.leaky_relu(self.lv1_in[1](x), 0.2)
        x = _pixel_unshuffle_rect(x, df)
        x = self.lv2(x)
        x = _pixel_shuffle_rect(x, df)
        x = x + x1
        x = F.pad(x, (4, 4, 0, 0), mode="replicate")
        x = self.lv1_out[1](x)
        x = F.pad(x, (-pw1, -pw2, -ph1, -ph2))
        if self.hole_mask:
            delta, layer_weight = x[:, :self.num_layers * 2].chunk(2, dim=1)
            hole_mask_logits = x[:, self.num_layers * 2:]
        else:
            delta, layer_weight = x.chunk(2, dim=1)
            hole_mask_logits = None
        layer_weight = F.softmax(layer_weight.float(), dim=1)
        return delta, layer_weight, hole_mask_logits
