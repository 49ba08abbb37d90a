"""Plain-torch light_inpaint_v1 / light_video_inpaint_v1 / depth_aa
matching the reference checkpoint format.

Behavioral specs: reference iw3/models/light_inpaint_v1.py:15-154,
light_video_inpaint_v1.py:24-227, depth_aa.py:11-86.  Eval mode; the
mask-blur/dilation preprocessing is tested separately — networks here
take the already-masked image + blurred mask.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F

from .wgmlp import GMLP
from .winc import bchw_to_bnc, bnc_to_bchw
from .iw3_models import WABlockV3, _pixel_unshuffle_rect


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


class WindowGMLP3d(nn.Module):
    """No-shift variant only (reference uses shift=False for the temporal
    blocks)."""

    def __init__(self, in_channels, window_size=(4, 4, 4), mlp_ratio=2):
        super().__init__()
        self.window_size = tuple(window_size)
        sd, sh, sw = self.window_size
        self.gmlp = GMLP(in_channels, sd * sh * sw, mlp_ratio)

    def forward(self, x, norm1=None, norm2=None):
        B, C, D, H, W = x.shape
        sd, sh, sw = self.window_size
        od, oh, ow = D // sd, H // sh, W // sw
        h = x.reshape(B, C, od, sd, oh, sh, ow, sw)
        h = h.permute(0, 2, 4, 6, 3, 5, 7, 1)
        h = h.reshape(B * od * oh * ow, sd * sh * sw, C)
        h = self.gmlp(h, norm1, norm2)
        h = h.reshape(B, od, oh, ow, sd, sh, sw, C)
        h = h.permute(0, 7, 1, 4, 2, 5, 3, 6)
        return h.reshape(B, C, D, H, W)


class GLUConvMLP(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, mlp_ratio=2):
        super().__init__()
        mid = int(out_channels * mlp_ratio)
        self.pad = (kernel_size - 1) // 2
        self.w1 = nn.Conv2d(in_channels, mid, 1)
        self.w2 = nn.Conv2d(mid // 2, out_channels, kernel_size)

    def forward(self, x):
        x = F.glu(self.w1(x), dim=1)
        x = F.pad(x, (self.pad,) * 4, mode="replicate")
        return self.w2(x)


class GMLPBlock(nn.Module):
    def __init__(self, in_channels, window_size, mlp_ratio=2, shift=False):
        super().__init__()
        self.gmlp = WindowGMLP2d(in_channels, window_size, mlp_ratio, shift)
        self.norm1 = nn.LayerNorm(in_channels, bias=False)
        self.norm2 = nn.LayerNorm(in_channels * mlp_ratio, bias=False)
        self.glu_conv = GLUConvMLP(in_channels, in_channels, mlp_ratio=1)

    def forward(self, x):
        x = x + self.gmlp(x, self.norm1, self.norm2)
        return x + self.glu_conv(x)


class GMLP3DBlock(nn.Module):
    def __init__(self, in_channels, window_size, mlp_ratio=2):
        super().__init__()
        self.gmlp = WindowGMLP3d(in_channels, window_size, mlp_ratio)
        self.norm1 = nn.LayerNorm(in_channels, bias=False)
        self.norm2 = nn.LayerNorm(in_channels * mlp_ratio, bias=False)
        self.glu_conv = GLUConvMLP(in_channels, in_channels, mlp_ratio=1)

    def forward(self, x):
        B, C, H, W = x.shape
        h = x.permute(1, 0, 2, 3).reshape(1, C, B, H, W)
        h = h + self.gmlp(h, self.norm1, self.norm2)
        x = h.permute(0, 2, 1, 3, 4).reshape(B, C, H, W)
        return x + self.glu_conv(x)


class LightInpaintV1(nn.Module):
    def __init__(self):
        super().__init__()
        df = 4
        pack = df * df
        C, C2 = 96, 192
        self.downscaling_factor = df
        self.mod = 16
        self.i2i_offset = 16
        self.mask_bias = nn.Parameter(
            torch.empty(1, C, 1, 1).normal_(std=0.01))
        self.patch = nn.Sequential(nn.Conv2d(3 * pack, C, 1), nn.LeakyReLU(0.2))
        self.enc1 = GMLPBlock(C, 16, mlp_ratio=2, shift=True)
        self.down = nn.Conv2d(C, C2, 2, 2)
        self.enc2 = nn.Sequential(
            GMLPBlock(C2, 8, 2, False), GMLPBlock(C2, 8, 2, True),
            GMLPBlock(C2, 8, 2, False), GMLPBlock(C2, 8, 2, True))
        self.up = nn.Conv2d(C2, C * 4, 1)
        self.dec1 = GMLPBlock(C, 16, mlp_ratio=2, shift=False)
        self.to_image = nn.Sequential(
            nn.Identity(), nn.Conv2d(C, 3 * pack, 3))

    def _forward(self, x, mask):
        df = self.downscaling_factor
        x = F.pixel_unshuffle(x, df)
        x = self.patch(x)
        mask = F.pixel_unshuffle(mask, df).amax(dim=1, keepdim=True) > 0.99
        x = torch.where(mask, self.mask_bias.to(x.dtype), x)
        x1 = self.enc1(x)
        x2 = self.down(x1)
        x2 = self.enc2(x2)
        x2 = F.pixel_shuffle(self.up(x2), 2)
        x = self.dec1(x1 + x2)
        x = F.pad(x, (1,) * 4, mode="replicate")
        x = self.to_image[1](x)
        return F.pixel_shuffle(x, df)

    def forward(self, x, mask, skip_i2i_offset=True):
        src = x
        x = (x - 0.5) / 0.5
        H, W = x.shape[2:]
        mod = self.mod * self.downscaling_factor
        pad1 = mod - W % mod
        pad2 = mod - H % mod
        x = F.pad(x, (0, pad1, 0, pad2), mode="replicate")
        mask = F.pad(mask, (0, pad1, 0, pad2), mode="replicate")
        x = self._forward(x, mask)
        x = F.pad(x, (0, -pad1, 0, -pad2))
        mask = F.pad(mask, (0, -pad1, 0, -pad2))
        if not skip_i2i_offset:
            src = F.pad(src, (-self.i2i_offset,) * 4)
            mask = F.pad(mask, (-self.i2i_offset,) * 4)
            x = F.pad(x, (-self.i2i_offset,) * 4)
        mask = mask.expand_as(src)
        return (src * (1 - mask) + x * mask).clamp(0, 1)


SEQ_LEN = 12


class LightVideoInpaintV1(nn.Module):
    def __init__(self, base_dim=96, lv2_mlp_ratio=1):
        super().__init__()
        df = 4
        pack = df * df
        C, C2 = base_dim, base_dim * 2
        self.downscaling_factor = df
        self.mod = 16
        self.i2i_offset = 16
        self.mask_bias = nn.Parameter(
            torch.empty(1, C, 1, 1).normal_(std=0.01))
        self.patch = nn.Conv2d(3, C, df, df)
        self.enc1 = GMLPBlock(C, 16, mlp_ratio=2, shift=False)
        self.down = nn.Conv2d(C, C2, 2, 2)
        self.enc2 = nn.ModuleList([
            GMLPBlock(C2, (8, 8), lv2_mlp_ratio, shift=True),
            GMLP3DBlock(C2, (SEQ_LEN, 1, 1), 2),
            GMLPBlock(C2, (8, 8), lv2_mlp_ratio, shift=False),
            GMLP3DBlock(C2, (SEQ_LEN, 1, 1), 2),
            GMLPBlock(C2, (8, 8), lv2_mlp_ratio, shift=True)])
        self.up = nn.Conv2d(C2, C * 4, 1)
        self.dec1 = GMLPBlock(C, 16, mlp_ratio=2, shift=False)
        self.to_image = nn.Conv2d(C, 3 * pack, 1)

    def _forward(self, x, mask):
        df = self.downscaling_factor
        mask = F.pixel_unshuffle(mask, df).amax(dim=1, keepdim=True) > 0.99
        x0 = F.leaky_relu(self.patch(x), 0.1)
        x0 = torch.where(mask, self.mask_bias.to(x0.dtype), x0)
        x1 = self.enc1(x0)
        x2 = self.down(x1)
        for mod in self.enc2:
            x2 = mod(x2)
        x3 = F.pixel_shuffle(self.up(x2), 2)
        out = self.dec1(x1 + x3)
        out = self.to_image(out)
        return F.pixel_shuffle(out, df)

    def forward(self, x, mask, skip_i2i_offset=True):
        src = x
        x = (x - 0.5) / 0.5
        H, W = x.shape[2:]
        mod = self.mod * self.downscaling_factor
        pad1 = mod - W % mod
        pad2 = mod - H % mod
        x = F.pad(x, (0, pad1, 0, pad2), mode="replicate")
        mask = F.pad(mask, (0, pad1, 0, pad2), mode="replicate")
        x = self._forward(x, mask)
        x = F.pad(x, (0, -pad1, 0, -pad2))
        mask = F.pad(mask, (0, -pad1, 0, -pad2))
        if not skip_i2i_offset:
            src = F.pad(src, (-self.i2i_offset,) * 4)
            mask = F.pad(mask, (-self.i2i_offset,) * 4)
            x = F.pad(x, (-self.i2i_offset,) * 4)
        mask = mask.expand_as(src)
        return (src * (1 - mask) + x * mask).clamp(0, 1)


class DepthAA(nn.Module):
    def __init__(self):
        super().__init__()
        C = 32
        self.proj_in = nn.Conv2d(4, C, 1)
        self.blocks = nn.ModuleList([
            WABlockV3(C, (8, 8), num_heads=2, shift=(True, True)),
            WABlockV3(C, (8, 8), num_heads=2, shift=(False, False)),
            WABlockV3(C, (8, 8), num_heads=2, shift=(True, True))])
        self.proj_out = nn.Conv2d(C, 4, 1)
        nn.init.constant_(self.proj_out.weight, 0)

    def forward(self, x):
        src = x
        H, W = x.shape[2:]
        pad_w = 16 - W % 16
        pad_h = 16 - H % 16
        pw1, pw2 = pad_w // 2, pad_w - pad_w // 2
        ph1, ph2 = pad_h // 2, pad_h - pad_h // 2
        x = F.pad(x, (pw1, pw2, ph1, ph2), mode="replicate")
        x = F.pixel_unshuffle(x, 2)
        x = self.proj_in(x)
        for b in self.blocks:
            x = b(x)
        x = self.proj_out(x)
        x = F.pixel_shuffle(x, 2)
        x = F.pad(x, (-pw1, -pw2, -ph1, -ph2))
        return (src + x).clamp(0, 1)
