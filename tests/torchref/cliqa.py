"""Plain-torch cliqa predictors matching the reference checkpoint format
(behavioral spec: reference cliqa/models/*.py + nunif/modules/res_block.py
ResBlockBNReLU)."""
import torch
import torch.nn as nn


class ResBlockBNReLU(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(channels, channels, 3, 1, 1, bias=False),
            nn.BatchNorm2d(channels), nn.ReLU(),
            nn.Conv2d(channels, channels, 3, 1, 1, bias=False),
            nn.BatchNorm2d(channels))
        self.identity = nn.Identity()

    def forward(self, x):
        return torch.relu(self.conv(x) + self.identity(x))


def _trunk(in_ch):
    return nn.Sequential(
        nn.Conv2d(in_ch, 64, 3, 1, 1, padding_mode="replicate", bias=False),
        nn.BatchNorm2d(64), nn.ReLU(),
        nn.Conv2d(64, 128, 3, 1, 1, bias=False),
        nn.BatchNorm2d(128), nn.ReLU(),
        nn.MaxPool2d((2, 2)),
        ResBlockBNReLU(128), nn.MaxPool2d((2, 2)),
        ResBlockBNReLU(128), nn.MaxPool2d((2, 2)))


def _head(pool):
    return nn.Sequential(
        nn.Conv2d(128, 256, 3, 1, 1, bias=False),
        nn.BatchNorm2d(256), nn.ReLU(),
        nn.AdaptiveMaxPool2d(1) if pool == "max" else nn.AdaptiveAvgPool2d(1),
        nn.Conv2d(256, 1, 1))


class JPEGQuality(nn.Module):
    def __init__(self):
        super().__init__()
        self.features = _trunk(6)
        self.quality_output = _head("max")
        self.subsampling_output = _head("avg")

    def forward(self, x):
        B = x.shape[0]
        r, g, b = x[:, 0:1], x[:, 1:2], x[:, 2:3]
        y = r * 0.299 + g * 0.587 + b * 0.114
        cb = (b - y) * 0.564 + 0.5
        cr = (r - y) * 0.713 + 0.5
        x = torch.cat([y, cb, cr, r, g, b], dim=1) * 2.0 - 1.0
        x = self.features(x)
        return (self.quality_output(x).view(B, -1),
                self.subsampling_output(x).view(B, -1))


class GrainNoiseLevel(nn.Module):
    def __init__(self):
        super().__init__()
        self.features = _trunk(3)
        self.noise_level_output = _head("max")

    def forward(self, x):
        B = x.shape[0]
        x = self.features(x * 2.0 - 1.0)
        return self.noise_level_output(x).view(B, -1)


class ScaleFactor(nn.Module):
    def __init__(self):
        super().__init__()
        self.features = _trunk(3)
        self.scale_factor_output = _head("max")

    def forward(self, x):
        B = x.shape[0]
        x = self.features(x * 2.0 - 1.0)
        return self.scale_factor_output(x).view(B, -1)
