"""Plain-torch U2NETP matching the reference checkpoint format
(behavioral spec: reference nunif/utils/u2netp.py:11-432, vendored from
the published U-2-Net architecture)."""
import torch
import torch.nn as nn
import torch.nn.functional as F


class REBNCONV(nn.Module):
    def __init__(self, in_ch=3, out_ch=3, dirate=1):
        super().__init__()
        self.conv_s1 = nn.Conv2d(in_ch, out_ch, 3, padding=dirate,
                                 dilation=dirate)
        self.bn_s1 = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn_s1(self.conv_s1(x)))


def _up_like(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear",
                         align_corners=False)


class RSU(nn.Module):
    """Generic residual U-block; height 7/6/5/4 = reference RSU7..RSU4."""

    def __init__(self, height, in_ch, mid_ch, out_ch):
        super().__init__()
        self.height = height
        self.rebnconvin = REBNCONV(in_ch, out_ch, 1)
        for i in range(1, height):
            c_in = out_ch if i == 1 else mid_ch
            setattr(self, f"rebnconv{i}", REBNCONV(c_in, mid_ch, 1))
        setattr(self, f"rebnconv{height}", REBNCONV(mid_ch, mid_ch, 2))
        for i in range(height - 1, 0, -1):
            c_out = out_ch if i == 1 else mid_ch
            setattr(self, f"rebnconv{i}d", REBNCONV(mid_ch * 2, c_out, 1))

    def forward(self, x):
        hxin = self.rebnconvin(x)
        enc = []
        h = hxin
        for i in range(1, self.height):
            h = getattr(self, f"rebnconv{i}")(h)
            enc.append(h)
            if i < self.height - 1:
                h = F.max_pool2d(h, 2, 2, ceil_mode=True)
        h = getattr(self, f"rebnconv{self.height}")(h)
        for i in range(self.height - 1, 0, -1):
            skip = enc[i - 1]
            if h.shape[2:] != skip.shape[2:]:
                h = _up_like(h, skip)
            h = getattr(self, f"rebnconv{i}d")(torch.cat((h, skip), 1))
        return h + hxin


class RSU4F(nn.Module):
    def __init__(self, in_ch, mid_ch, out_ch):
        super().__init__()
        self.rebnconvin = REBNCONV(in_ch, out_ch, 1)
        self.rebnconv1 = REBNCONV(out_ch, mid_ch, 1)
        self.rebnconv2 = REBNCONV(mid_ch, mid_ch, 2)
        self.rebnconv3 = REBNCONV(mid_ch, mid_ch, 4)
        self.rebnconv4 = REBNCONV(mid_ch, mid_ch, 8)
        self.rebnconv3d = REBNCONV(mid_ch * 2, mid_ch, 4)
        self.rebnconv2d = REBNCONV(mid_ch * 2, mid_ch, 2)
        self.rebnconv1d = REBNCONV(mid_ch * 2, out_ch, 1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        h1 = self.rebnconv1(hxin)
        h2 = self.rebnconv2(h1)
        h3 = self.rebnconv3(h2)
        h4 = self.rebnconv4(h3)
        h3d = self.rebnconv3d(torch.cat((h4, h3), 1))
        h2d = self.rebnconv2d(torch.cat((h3d, h2), 1))
        h1d = self.rebnconv1d(torch.cat((h2d, h1), 1))
        return h1d + hxin


class U2NETP(nn.Module):
    def __init__(self, in_ch=3, out_ch=1):
        super().__init__()
        self.stage1 = RSU(7, in_ch, 16, 64)
        self.stage2 = RSU(6, 64, 16, 64)
        self.stage3 = RSU(5, 64, 16, 64)
        self.stage4 = RSU(4, 64, 16, 64)
        self.stage5 = RSU4F(64, 16, 64)
        self.stage6 = RSU4F(64, 16, 64)
        self.stage5d = RSU4F(128, 16, 64)
        self.stage4d = RSU(4, 128, 16, 64)
        self.stage3d = RSU(5, 128, 16, 64)
        self.stage2d = RSU(6, 128, 16, 64)
        self.stage1d = RSU(7, 128, 16, 64)
        for i in range(1, 7):
            setattr(self, f"side{i}", nn.Conv2d(64, out_ch, 3, padding=1))
        self.outconv = nn.Conv2d(6 * out_ch, out_ch, 1)

    def forward(self, x):
        hx1 = self.stage1(x)
        hx2 = self.stage2(F.max_pool2d(hx1, 2, 2, ceil_mode=True))
        hx3 = self.stage3(F.max_pool2d(hx2, 2, 2, ceil_mode=True))
        hx4 = self.stage4(F.max_pool2d(hx3, 2, 2, ceil_mode=True))
        hx5 = self.stage5(F.max_pool2d(hx4, 2, 2, ceil_mode=True))
        hx6 = self.stage6(F.max_pool2d(hx5, 2, 2, ceil_mode=True))
        hx6up = _up_like(hx6, hx5)
        hx5d = self.stage5d(torch.cat((hx6up, hx5), 1))
        hx4d = self.stage4d(torch.cat((_up_like(hx5d, hx4), hx4), 1))
        hx3d = self.stage3d(torch.cat((_up_like(hx4d, hx3), hx3), 1))
        hx2d = self.stage2d(torch.cat((_up_like(hx3d, hx2), hx2), 1))
        hx1d = self.stage1d(torch.cat((_up_like(hx2d, hx1), hx1), 1))
        d1 = self.side1(hx1d)
        d2 = _up_like(self.side2(hx2d), d1)
        d3 = _up_like(self.side3(hx3d), d1)
        d4 = _up_like(self.side4(hx4d), d1)
        d5 = _up_like(self.side5(hx5d), d1)
        d6 = _up_like(self.side6(hx6), d1)
        d0 = self.outconv(torch.cat((d1, d2, d3, d4, d5, d6), 1))
        return tuple(torch.sigmoid(d) for d in (d0, d1, d2, d3, d4, d5, d6))
