"""Plain-torch stlizer light_outpaint_v1 matching the reference checkpoint
format (behavioral spec: reference stlizer/models/light_outpaint_v1.py
:12-205)."""
import torch
import torch.nn as nn
import torch.nn.functional as F

from .winc import WindowMHA2d, WindowScoreBias


class PoolBlock(nn.Module):
    def __init__(self, in_channels, kernel_size=5):
        super().__init__()
        self.pooling = nn.AvgPool2d(kernel_size, stride=1,
                                    padding=kernel_size // 2,
                                    count_include_pad=False)
        self.mlp = nn.Sequential(
            nn.Conv2d(in_channels, in_channels * 2, 1),
            nn.LeakyReLU(0.2),
            nn.Identity(),
            nn.Conv2d(in_channels * 2, in_channels * 2, 3,
                      groups=in_channels * 2),
            nn.GLU(dim=1),
            nn.Conv2d(in_channels, in_channels, 1))

    def forward(self, x):
        h = self.pooling(x) - x
        h = self.mlp[1](self.mlp[0](h))
        h = F.pad(h, (1,) * 4, mode="replicate")
        h = self.mlp[4](self.mlp[3](h))
        return x + self.mlp[5](h)


class MHABlock(nn.Module):
    def __init__(self, in_channels, window_size=8, num_heads=4):
        super().__init__()
        self.mha = WindowMHA2d(in_channels, num_heads, window_size)
        self.mlp = nn.Sequential(
            nn.Conv2d(in_channels, in_channels * 2, 1), nn.GLU(dim=1),
            nn.Conv2d(in_channels, in_channels, 1))
        self.bias = WindowScoreBias(window_size)

    def forward(self, x):
        x = x + self.mha(x, attn_mask=self.bias())
        return x + self.mlp(x)


class Downsampling(nn.Module):
    def __init__(self, in_channels, dims):
        super().__init__()
        blocks = []
        in_ch = in_channels
        for dim in dims:
            blocks.append(nn.Identity())
            blocks.append(nn.Conv2d(in_ch, dim, 3, 2))
            blocks.append(nn.LeakyReLU(0.2))
            in_ch = dim
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        for i in range(0, len(self.blocks), 3):
            x = F.pad(x, (1,) * 4, mode="replicate")
            x = self.blocks[i + 2](self.blocks[i + 1](x))
        return x


class ToImageBilinaer(nn.Module):
    def __init__(self, in_channels, out_channels, scale_factor):
        super().__init__()
        self.proj = nn.Conv2d(in_channels, out_channels, 1)
        self.scale_factor = scale_factor

    def forward(self, x):
        return F.interpolate(self.proj(x), scale_factor=self.scale_factor,
                             mode="bilinear", align_corners=False)


class OutpaintBase(nn.Module):
    def __init__(self, dim=64, window_size=8):
        super().__init__()
        C, C2 = dim, dim // 2
        self.mod = 8
        self.downscaling_factor = window_size
        self.dct = Downsampling(4, [C // 8, C // 4, C])
        self.proj_mid = nn.Conv2d(C, C2, 1)
        self.proj_out = nn.Conv2d(C2, C, 1)
        self.enc_block = nn.Sequential(
            MHABlock(C, 8, C // 32), PoolBlock(C))
        self.mid_block = nn.Sequential(
            MHABlock(C2, 8, C2 // 32), PoolBlock(C2),
            MHABlock(C2, 8, C2 // 32), PoolBlock(C2))
        self.dec_block = nn.Sequential(
            MHABlock(C, 8, C // 32), PoolBlock(C))
        self.to_image_biliner = ToImageBilinaer(C, 3, window_size)

    def forward(self, x, mask):
        H, W = x.shape[2:]
        mod = self.mod * self.downscaling_factor
        pad1 = 0 if W % mod == 0 else mod - W % mod
        pad2 = 0 if H % mod == 0 else mod - H % mod
        if pad1 or pad2:
            x = F.pad(x, (0, pad1, 0, pad2), mode="replicate")
        mask_f = mask.to(x.dtype)
        if pad1 or pad2:
            mask_f = F.pad(mask_f, (0, pad1, 0, pad2), value=1.0)
            x = x * (1 - mask_f)
        x = torch.cat([x, mask_f], dim=1)
        x = self.dct(x)
        x = self.enc_block(x)
        x = x + self.proj_out(self.mid_block(self.proj_mid(x)))
        x = self.dec_block(x)
        x = self.to_image_biliner(x)
        return F.pad(x, (0, -pad1, 0, -pad2))


class LightOutpaintV1(nn.Module):
    def __init__(self):
        super().__init__()
        self.net = OutpaintBase(64, 8)

    def forward(self, x, mask):
        mask3 = mask.expand_as(x).to(x.dtype)
        z = self.net(x, mask)
        return (x * (1 - mask3) + z * mask3).clamp(0, 1)
