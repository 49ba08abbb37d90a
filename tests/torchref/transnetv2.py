"""Plain-torch TransNetV2 matching the reference checkpoint format
(behavioral spec: reference nunif/utils/transnetv2.py:7-310, vendored from
the published TransNetV2)."""
import torch
import torch.nn as nn
import torch.nn.functional as F


class Conv3DConfigurable(nn.Module):
    def __init__(self, in_filters, filters, dilation_rate, use_bias=True):
        super().__init__()
        conv1 = nn.Conv3d(in_filters, 2 * filters, (1, 3, 3),
                          padding=(0, 1, 1), bias=False)
        conv2 = nn.Conv3d(2 * filters, filters, (3, 1, 1),
                          dilation=(dilation_rate, 1, 1),
                          padding=(dilation_rate, 0, 0), bias=use_bias)
        self.layers = nn.ModuleList([conv1, conv2])

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class DilatedDCNNV2(nn.Module):
    def __init__(self, in_filters, filters, activation=None):
        super().__init__()
        self.Conv3D_1 = Conv3DConfigurable(in_filters, filters, 1, False)
        self.Conv3D_2 = Conv3DConfigurable(in_filters, filters, 2, False)
        self.Conv3D_4 = Conv3DConfigurable(in_filters, filters, 4, False)
        self.Conv3D_8 = Conv3DConfigurable(in_filters, filters, 8, False)
        self.bn = nn.BatchNorm3d(filters * 4, eps=1e-3)
        self.activation = activation

    def forward(self, x):
        out = torch.cat([self.Conv3D_1(x), self.Conv3D_2(x),
                         self.Conv3D_4(x), self.Conv3D_8(x)], dim=1)
        out = self.bn(out)
        if self.activation is not None:
            out = self.activation(out)
        return out


class StackedDDCNNV2(nn.Module):
    def __init__(self, in_filters, n_blocks, filters):
        super().__init__()
        self.DDCNN = nn.ModuleList([
            DilatedDCNNV2(in_filters if i == 1 else filters * 4, filters,
                          activation=F.relu if i != n_blocks else None)
            for i in range(1, n_blocks + 1)])
        self.pool = nn.AvgPool3d(kernel_size=(1, 2, 2))

    def forward(self, x):
        shortcut = None
        for block in self.DDCNN:
            x = block(x)
            if shortcut is None:
                shortcut = x
        x = F.relu(x)
        x = x + shortcut
        return self.pool(x)


def _banded_lookup(similarities, lookup_window):
    B, T, _ = similarities.shape
    half = (lookup_window - 1) // 2
    padded = F.pad(similarities, [half, half])
    bi = torch.arange(B).view(B, 1, 1).repeat(1, T, lookup_window)
    ti = torch.arange(T).view(1, T, 1).repeat(B, 1, lookup_window)
    li = torch.arange(lookup_window).view(1, 1, -1).repeat(B, T, 1) + ti
    return padded[bi, ti, li]


class FrameSimilarity(nn.Module):
    def __init__(self, in_filters, similarity_dim=128, lookup_window=101,
                 output_dim=128, use_bias=True):
        super().__init__()
        self.projection = nn.Linear(in_filters, similarity_dim, bias=use_bias)
        self.fc = nn.Linear(lookup_window, output_dim)
        self.lookup_window = lookup_window

    def forward(self, inputs):
        x = torch.cat([torch.mean(t, dim=[3, 4]) for t in inputs], dim=1)
        x = torch.transpose(x, 1, 2)
        x = F.normalize(self.projection(x), p=2, dim=2)
        sims = torch.bmm(x, x.transpose(1, 2))
        return F.relu(self.fc(_banded_lookup(sims, self.lookup_window)))


class ColorHistograms(nn.Module):
    def __init__(self, lookup_window=101, output_dim=128):
        super().__init__()
        self.fc = nn.Linear(lookup_window, output_dim)
        self.lookup_window = lookup_window

    def forward(self, frames):
        f = frames.int()
        B, T, H, W, _ = f.shape
        flat = f.view(B * T, H * W, 3)
        bins = ((flat[:, :, 0] >> 5) << 6) + ((flat[:, :, 1] >> 5) << 3) + \
            (flat[:, :, 2] >> 5)
        prefix = (torch.arange(B * T) << 9).view(-1, 1)
        bins = (bins + prefix).view(-1)
        hist = torch.zeros(B * T * 512, dtype=torch.int32)
        hist.scatter_add_(0, bins.long(),
                          torch.ones(len(bins), dtype=torch.int32))
        hist = hist.view(B, T, 512).float()
        hist = F.normalize(hist, p=2, dim=2)
        sims = torch.bmm(hist, hist.transpose(1, 2))
        return F.relu(self.fc(_banded_lookup(sims, self.lookup_window)))


class TransNetV2(nn.Module):
    def __init__(self, F_=16, L=3, S=2, D=1024):
        super().__init__()
        self.SDDCNN = nn.ModuleList(
            [StackedDDCNNV2(3, S, F_)] +
            [StackedDDCNNV2((F_ * 2 ** (i - 1)) * 4, S, F_ * 2 ** i)
             for i in range(1, L)])
        self.frame_sim_layer = FrameSimilarity(
            sum((F_ * 2 ** i) * 4 for i in range(L)))
        self.color_hist_layer = ColorHistograms()
        output_dim = ((F_ * 2 ** (L - 1)) * 4) * 3 * 6 + 128 + 128
        self.fc1 = nn.Linear(output_dim, D)
        self.cls_layer1 = nn.Linear(D, 1)
        self.cls_layer2 = nn.Linear(D, 1)

    def forward(self, inputs):
        # inputs: (B, T, 27, 48, 3) float 0..255
        x = inputs.permute([0, 4, 1, 2, 3]).contiguous()
        block_features = []
        for block in self.SDDCNN:
            x = block(x)
            block_features.append(x)
        x = x.permute(0, 2, 3, 4, 1)
        x = x.reshape(x.shape[0], x.shape[1], -1)
        x = torch.cat([self.frame_sim_layer(block_features), x], 2)
        x = torch.cat([self.color_hist_layer(inputs), x], 2)
        x = F.relu(self.fc1(x))
        return self.cls_layer1(x), self.cls_layer2(x)
