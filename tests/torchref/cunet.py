"""Plain-torch CUNet/UpCUNet matching the reference checkpoint format
(behavioral spec: reference waifu2x/models/cunet.py:10-218)."""
import torch
import torch.nn as nn
import torch.nn.functional as F


class SEBlock(nn.Module):
    def __init__(self, in_channels, reduction=8, bias=True):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, in_channels // reduction, 1,
                               bias=bias)
        self.conv2 = nn.Conv2d(in_channels // reduction, in_channels, 1,
                               bias=bias)

    def forward(self, x):
        z = F.adaptive_avg_pool2d(x, 1)
        z = torch.sigmoid(self.conv2(F.relu(self.conv1(z))))
        return x * z.expand(x.shape)


class UNetConv(nn.Module):
    def __init__(self, in_channels, mid_channels, out_channels, se):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(in_channels, mid_channels, 3, 1, 0), nn.LeakyReLU(0.1),
            nn.Conv2d(mid_channels, out_channels, 3, 1, 0), nn.LeakyReLU(0.1))
        self.seblock = SEBlock(out_channels, 8, True) if se else None

    def forward(self, x):
        z = self.conv(x)
        return self.seblock(z) if self.seblock is not None else z


class UNet1(nn.Module):
    def __init__(self, in_channels, out_channels, deconv):
        super().__init__()
        self.conv1 = UNetConv(in_channels, 32, 64, se=False)
        self.conv1_down = nn.Conv2d(64, 64, 2, 2, 0)
        self.conv2 = UNetConv(64, 128, 64, se=True)
        self.conv2_up = nn.ConvTranspose2d(64, 64, 2, 2, 0)
        self.conv3 = nn.Conv2d(64, 64, 3, 1, 0)
        if deconv:
            self.conv_bottom = nn.ConvTranspose2d(64, out_channels, 4, 2, 3)
        else:
            self.conv_bottom = nn.Conv2d(64, out_channels, 3, 1, 0)

    def forward(self, x):
        x1 = self.conv1(x)
        x2 = F.leaky_relu(self.conv1_down(x1), 0.1)
        x2 = self.conv2(x2)
        x2 = F.leaky_relu(self.conv2_up(x2), 0.1)
        x1 = F.pad(x1, (-4,) * 4)
        x3 = F.leaky_relu(self.conv3(x1 + x2), 0.1)
        return self.conv_bottom(x3)


class UNet2(nn.Module):
    def __init__(self, in_channels, out_channels, deconv):
        super().__init__()
        self.conv1 = UNetConv(in_channels, 32, 64, se=False)
        self.conv1_down = nn.Conv2d(64, 64, 2, 2, 0)
        self.conv2 = UNetConv(64, 64, 128, se=True)
        self.conv2_down = nn.Conv2d(128, 128, 2, 2, 0)
        self.conv3 = UNetConv(128, 256, 128, se=True)
        self.conv3_up = nn.ConvTranspose2d(128, 128, 2, 2, 0)
        self.conv4 = UNetConv(128, 64, 64, se=True)
        self.conv4_up = nn.ConvTranspose2d(64, 64, 2, 2, 0)
        self.conv5 = nn.Conv2d(64, 64, 3, 1, 0)
        if deconv:
            self.conv_bottom = nn.ConvTranspose2d(64, out_channels, 4, 2, 3)
        else:
            self.conv_bottom = nn.Conv2d(64, out_channels, 3, 1, 0)

    def forward(self, x):
        x1 = self.conv1(x)
        x2 = F.leaky_relu(self.conv1_down(x1), 0.1)
        x2 = self.conv2(x2)
        x3 = F.leaky_relu(self.conv2_down(x2), 0.1)
        x3 = self.conv3(x3)
        x3 = F.leaky_relu(self.conv3_up(x3), 0.1)
        x2 = F.pad(x2, (-4,) * 4)
        x4 = self.conv4(x2 + x3)
        x4 = F.leaky_relu(self.conv4_up(x4), 0.1)
        x1 = F.pad(x1, (-16,) * 4)
        x5 = F.leaky_relu(self.conv5(x1 + x4), 0.1)
        return self.conv_bottom(x5)


class CUNet(nn.Module):
    def __init__(self, in_channels=3, out_channels=3, scale=1, no_clip=True):
        super().__init__()
        self.unet1 = UNet1(in_channels, out_channels, deconv=(scale == 2))
        self.unet2 = UNet2(in_channels, out_channels, deconv=False)
        self.no_clip = no_clip

    def forward(self, x):
        z1 = self.unet1(x)
        if not self.no_clip:
            z1 = torch.clamp(z1, 0.0, 1.0)
        z2 = self.unet2(z1)
        z1 = F.pad(z1, (-20,) * 4)
        return torch.clamp(z1 + z2, 0.0, 1.0)
