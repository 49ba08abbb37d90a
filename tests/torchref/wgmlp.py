"""Plain-torch wgmlp_4x matching the reference checkpoint format
(behavioral spec: reference waifu2x/models/wgmlp.py:15-470 +
nunif/modules/attention.py GMLP/WindowGMLP2d)."""
import torch
import torch.nn as nn
import torch.nn.functional as F

from .winc import (bchw_to_bnc, bnc_to_bchw, GLUConvMLP, MLP, PatchDown,
                   PatchUp, ToImage, SourceResidual)


class GMLP(nn.Module):
    def __init__(self, embed_dim, seq_len, mlp_ratio=1):
        super().__init__()
        self.proj_in = nn.Linear(embed_dim, int(embed_dim * mlp_ratio * 2))
        self.proj_spatial = nn.Conv1d(seq_len, seq_len, 1, bias=True)
        self.proj_out = nn.Linear(int(embed_dim * mlp_ratio * 2) // 2,
                                  embed_dim)

    def forward(self, x, norm1=None, norm2=None):
        shortcut = x
        if norm1 is not None:
            x = norm1(x)
        x = F.gelu(self.proj_in(x))
        u, v = x.chunk(2, dim=-1)
        if norm2 is not None:
            v = norm2(v)
        v = self.proj_spatial(v)
        x = self.proj_out(u * v)
        return x + shortcut


class WindowGMLP2d(nn.Module):
    def __init__(self, in_channels, window_size=(4, 4), mlp_ratio=2,
                 shift=False):
        super().__init__()
        ws = (tuple(window_size) if isinstance(window_size, (tuple, list))
              else (window_size, window_size))
        self.window_size = ws
        self.shift = shift
        self.pad_h = ws[0] // 2 if shift else 0
        self.pad_w = ws[1] // 2 if shift else 0
        self.gmlp = GMLP(in_channels, ws[0] * ws[1], mlp_ratio)

    def forward(self, x, norm1=None, norm2=None):
        if self.shift:
            x = F.pad(x, (self.pad_w, self.pad_w, self.pad_h, self.pad_h))
        out_shape = x.shape
        x = bchw_to_bnc(x, self.window_size)
        x = self.gmlp(x, norm1, norm2)
        x = bnc_to_bchw(x, out_shape, self.window_size)
        if self.shift:
            x = F.pad(x, (-self.pad_w, -self.pad_w, -self.pad_h, -self.pad_h))
        return x


class WGMLPBlock(nn.Module):
    def __init__(self, in_channels, window_size=8, mlp_ratio=2, shift=False,
                 conv_mlp=True):
        super().__init__()
        self.gmlp = WindowGMLP2d(in_channels, window_size, mlp_ratio=1,
                                 shift=shift)
        self.norm1 = nn.LayerNorm(in_channels, bias=False)
        self.norm2 = nn.LayerNorm(in_channels, bias=False)
        if conv_mlp:
            self.conv_mlp = GLUConvMLP(in_channels, in_channels,
                                       mlp_ratio=mlp_ratio)
        else:
            self.conv_mlp = MLP(in_channels, in_channels,
                                mlp_ratio=mlp_ratio)

    def forward(self, x):
        x = self.gmlp(x, self.norm1, self.norm2)
        return x + self.conv_mlp(x)


class WGMLPBlocks(nn.Module):
    def __init__(self, in_channels, window_size=8, mlp_ratio=2, num_layers=2,
                 conv_mlp=True, shift=None):
        super().__init__()
        if isinstance(conv_mlp, bool):
            conv_mlp = [conv_mlp] * num_layers
        if shift is None:
            shift = [i % 2 == 1 for i in range(num_layers)]
        self.blocks = nn.Sequential(*[
            WGMLPBlock(in_channels, window_size, mlp_ratio, shift[i],
                       conv_mlp[i]) for i in range(num_layers)])

    def forward(self, x):
        return self.blocks(x)


class Overscan(nn.Module):
    def __init__(self, in_channels):
        super().__init__()
        C = in_channels
        self.conv1 = nn.Conv2d(C, C, 3, dilation=1)
        self.conv2 = nn.Conv2d(C, C // 2, 3, dilation=2)
        self.conv3 = nn.Conv2d(C // 2, C // 2, 3, dilation=3)
        self.fuse = nn.Sequential(
            nn.Conv2d(C + C // 2 + C // 2, C, 3), nn.LeakyReLU(0.2),
            nn.Conv2d(C, C, 1))

    def forward(self, x):
        x = F.pad(x, (7,) * 4, mode="replicate")
        x1 = F.leaky_relu(self.conv1(x), 0.2)
        x2 = F.leaky_relu(self.conv2(x1), 0.2)
        x3 = F.leaky_relu(self.conv3(x2), 0.2)
        x1 = F.pad(x1, (-5,) * 4)
        x2 = F.pad(x2, (-3,) * 4)
        return self.fuse(torch.cat([x1, x2, x3], dim=1))


class IR(nn.Module):
    def __init__(self, in_channels=3, out_channels=16):
        super().__init__()
        self.patch = nn.Conv2d(in_channels, out_channels, 3)
        self.overscan = Overscan(out_channels)
        self.fusion = nn.Conv2d(out_channels * 2, out_channels, 3)

    def forward(self, x):
        x = F.pad(x, (1,) * 4, mode="replicate")
        x = F.leaky_relu(self.patch(x), 0.2)
        ov = self.overscan(x)
        x = torch.cat([x, ov], dim=1)
        return self.fusion(F.pad(x, (1,) * 4, mode="replicate"))


def get_shift_config(num_layers, last=False):
    if last:
        return tuple(reversed([i % 2 == 0 for i in range(num_layers)]))
    return tuple(reversed([i % 2 == 1 for i in range(num_layers)]))


class WGMLPBase(nn.Module):
    def __init__(self, in_channels=3, out_channels=3, base_dim=128,
                 lv1_mlp_ratio=2, lv2_mlp_ratio=2, first_layers=2,
                 last_layers=3, scale_factor=4):
        super().__init__()
        C, C2 = base_dim, base_dim * 2
        self.ir = IR(3, 16)
        self.patch = nn.Conv2d(16, C, 3)
        self.wgmlp1 = WGMLPBlocks(C, 8, lv1_mlp_ratio, first_layers,
                                  shift=get_shift_config(first_layers))
        self.down1 = PatchDown(C, C2, residual=True)
        self.wgmlp2 = WGMLPBlocks(C2, 8, lv2_mlp_ratio, 4,
                                  shift=get_shift_config(4))
        self.up1 = PatchUp(C2, C, residual=True)
        self.wgmlp3 = WGMLPBlocks(C, 8, lv1_mlp_ratio, last_layers,
                                  conv_mlp=[True] * (last_layers - 1) + [False],
                                  shift=get_shift_config(last_layers))
        self.to_residual_image = ToImage(C, out_channels, scale_factor)
        self.to_image = SourceResidual(out_channels, scale_factor)

    def forward(self, x):
        src = x
        x = self.ir(x)
        x = self.patch(x)
        x = F.pad(x, (-7,) * 4)
        x = F.leaky_relu(x, 0.2)
        x1 = self.wgmlp1(x)
        x = self.down1(x1)
        x = self.wgmlp2(x)
        x = self.up1(x)
        x = x + x1
        x = self.wgmlp3(x)
        x = self.to_residual_image(x)
        return self.to_image(x, src)


class WGMLP4x(nn.Module):
    def __init__(self, **kwargs):
        super().__init__()
        self.unet = WGMLPBase(scale_factor=4, **kwargs)

    def forward(self, x):
        return torch.clamp(self.unet(x), 0, 1)
