"""Plain-torch swin_unet matching the reference checkpoint format.

Behavioral spec: reference waifu2x/models/swin_unet.py:119-199 topology with
torchvision SwinTransformerBlock V1 attention internals (shifted window
attention with relative position bias, eval mode, dropout 0).  State-dict
keys match the released waifu2x checkpoints (unet.patch.0, unet.swin1.block.0
.attn.qkv, mlp.0/mlp.3, down1.conv, up2.proj, to_image.proj, ...).
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


def _relative_position_index(ws):
    coords_h = torch.arange(ws[0])
    coords_w = torch.arange(ws[1])
    coords = torch.stack(torch.meshgrid(coords_h, coords_w, indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 0] *= 2 * ws[1] - 1
    return rel.sum(-1).flatten()


class ShiftedWindowAttention(nn.Module):
    """torchvision V1 shifted_window_attention (eval, no dropout)."""

    def __init__(self, dim, window_size, shift_size, num_heads):
        super().__init__()
        self.window_size = list(window_size)
        self.shift_size = list(shift_size)
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        n_bias = (2 * window_size[0] - 1) * (2 * window_size[1] - 1)
        self.relative_position_bias_table = nn.Parameter(
            torch.empty(n_bias, num_heads).normal_(std=0.02))
        self.register_buffer("relative_position_index",
                             _relative_position_index(window_size))

    def _bias(self):
        n = self.window_size[0] * self.window_size[1]
        b = self.relative_position_bias_table[self.relative_position_index]
        return b.view(n, n, -1).permute(2, 0, 1).unsqueeze(0)

    def forward(self, x):
        B, H, W, C = x.shape
        ws = list(self.window_size)
        ss = list(self.shift_size)
        pad_r = (ws[1] - W % ws[1]) % ws[1]
        pad_b = (ws[0] - H % ws[0]) % ws[0]
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        _, pad_H, pad_W, _ = x.shape
        if ws[0] >= pad_H:
            ss[0] = 0
        if ws[1] >= pad_W:
            ss[1] = 0
        if sum(ss) > 0:
            x = torch.roll(x, shifts=(-ss[0], -ss[1]), dims=(1, 2))
        num_windows = (pad_H // ws[0]) * (pad_W // ws[1])
        x = x.view(B, pad_H // ws[0], ws[0], pad_W // ws[1], ws[1], C)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(
            B * num_windows, ws[0] * ws[1], C)

        qkv = F.linear(x, self.qkv.weight, self.qkv.bias)
        qkv = qkv.reshape(x.size(0), x.size(1), 3, self.num_heads,
                          C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (C // self.num_heads) ** -0.5
        attn = q.matmul(k.transpose(-2, -1))
        attn = attn + self._bias()
        if sum(ss) > 0:
            attn_mask = x.new_zeros((pad_H, pad_W))
            h_slices = ((0, -ws[0]), (-ws[0], -ss[0]), (-ss[0], None))
            w_slices = ((0, -ws[1]), (-ws[1], -ss[1]), (-ss[1], None))
            count = 0
            for h in h_slices:
                for w in w_slices:
                    attn_mask[h[0]:h[1], w[0]:w[1]] = count
                    count += 1
            attn_mask = attn_mask.view(pad_H // ws[0], ws[0],
                                       pad_W // ws[1], ws[1])
            attn_mask = attn_mask.permute(0, 2, 1, 3).reshape(
                num_windows, ws[0] * ws[1])
            attn_mask = attn_mask.unsqueeze(1) - attn_mask.unsqueeze(2)
            attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0)
            attn_mask = attn_mask.masked_fill(attn_mask == 0, 0.0)
            attn = attn.view(x.size(0) // num_windows, num_windows,
                             self.num_heads, x.size(1), x.size(1))
            attn = attn + attn_mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, x.size(1), x.size(1))
        attn = F.softmax(attn, dim=-1)
        x = attn.matmul(v).transpose(1, 2).reshape(x.size(0), x.size(1), C)
        x = F.linear(x, self.proj.weight, self.proj.bias)

        x = x.view(B, pad_H // ws[0], pad_W // ws[1], ws[0], ws[1], C)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, pad_H, pad_W, C)
        if sum(ss) > 0:
            x = torch.roll(x, shifts=(ss[0], ss[1]), dims=(1, 2))
        return x[:, :H, :W, :].contiguous()


class SwinTransformerBlockV1(nn.Module):
    def __init__(self, dim, num_heads, window_size, shift_size,
                 mlp_ratio=2.0, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or (lambda d: nn.Identity())
        self.norm1 = norm_layer(dim)
        self.attn = ShiftedWindowAttention(dim, window_size, shift_size,
                                           num_heads)
        self.norm2 = norm_layer(dim)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.Sequential(nn.Linear(dim, hidden), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(hidden, dim),
                                 nn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class SwinTransformerBlocks(nn.Module):
    def __init__(self, dim, num_head, num_layers, window_size,
                 norm_layer=None):
        super().__init__()
        self.block = nn.Sequential(*[
            SwinTransformerBlockV1(
                dim, num_head, window_size,
                [0 if i % 2 == 0 else w // 2 for w in window_size],
                norm_layer=norm_layer)
            for i in range(num_layers)])

    def forward(self, x):
        return self.block(x)


class PatchDown(nn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels, 2, 2, 0)

    def forward(self, x):
        x = x.permute(0, 3, 1, 2)
        x = self.conv(x)
        return x.permute(0, 2, 3, 1).contiguous()


class PatchUp(nn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.proj = nn.Linear(in_channels, out_channels * 4)

    def forward(self, x):
        x = self.proj(x)
        x = x.permute(0, 3, 1, 2)
        x = F.pixel_shuffle(x, 2)
        return x.permute(0, 2, 3, 1).contiguous()


class ToImage(nn.Module):
    def __init__(self, in_channels, out_channels, scale_factor):
        super().__init__()
        self.scale_factor = scale_factor
        if scale_factor == 1:
            self.proj = nn.Linear(in_channels, out_channels)
        elif scale_factor in (2, 4):
            self.proj = nn.Linear(in_channels, out_channels * scale_factor ** 2)
        else:
            s2 = scale_factor ** 2
            self.proj = nn.Sequential(
                nn.Linear(in_channels, out_channels * s2),
                nn.LeakyReLU(0.2),
                nn.Linear(out_channels * s2, out_channels * s2))

    def forward(self, x):
        x = self.proj(x)
        x = x.permute(0, 3, 1, 2).contiguous()
        if self.scale_factor > 1:
            x = F.pixel_shuffle(x, self.scale_factor)
        return x


class SwinUNetBase(nn.Module):
    def __init__(self, in_channels=3, out_channels=3, base_dim=96,
                 base_layers=2, scale_factor=1, norm_layer=None):
        super().__init__()
        C, H, L, W = base_dim, base_dim // 16, base_layers, [6, 6]
        self.patch = nn.Sequential(
            nn.Conv2d(in_channels, C // 2, 3, 1, 0), nn.LeakyReLU(0.1),
            nn.Conv2d(C // 2, C, 3, 1, 0), nn.LeakyReLU(0.1))
        self.swin1 = SwinTransformerBlocks(C, H, L, W, norm_layer)
        self.down1 = PatchDown(C, C * 2)
        self.swin2 = SwinTransformerBlocks(C * 2, H, L, W, norm_layer)
        self.down2 = PatchDown(C * 2, C * 2)
        self.swin3 = SwinTransformerBlocks(C * 2, H, L * 3, W, norm_layer)
        self.up2 = PatchUp(C * 2, C * 2)
        if scale_factor in (1, 2):
            self.proj2 = nn.Identity()
            self.swin4 = SwinTransformerBlocks(C * 2, H, L, W, norm_layer)
            self.up1 = PatchUp(C * 2, C)
            self.swin5 = SwinTransformerBlocks(C, H, L, W, norm_layer)
            self.to_image = ToImage(C, out_channels, scale_factor)
        else:
            self.proj2 = nn.Linear(C, C * 2)
            self.swin4 = SwinTransformerBlocks(C * 2, H, L, W, norm_layer)
            self.up1 = PatchUp(C * 2, C * 2)
            self.swin5 = SwinTransformerBlocks(C * 2, H, L, W, norm_layer)
            self.to_image = ToImage(C * 2, out_channels, scale_factor)

    def forward(self, x):
        x2 = self.patch(x)
        x2 = F.pad(x2, (-6, -6, -6, -6))
        x2 = x2.permute(0, 2, 3, 1).contiguous()
        x3 = self.swin1(x2)
        x4 = self.down1(x3)
        x4 = self.swin2(x4)
        x5 = self.down2(x4)
        x5 = self.swin3(x5)
        x5 = self.up2(x5)
        x = x5 + x4
        x = self.swin4(x)
        x = self.up1(x)
        x = x + self.proj2(x3)
        x = self.swin5(x)
        return self.to_image(x)


class SwinUNet(nn.Module):
    """Top wrapper so state_dict keys carry the ``unet.`` prefix."""

    def __init__(self, **kwargs):
        super().__init__()
        self.unet = SwinUNetBase(**kwargs)

    def forward(self, x):
        return torch.clamp(self.unet(x), 0, 1)
