"""Plain-torch swin_unet_v2 (winc_unet) matching the reference checkpoint
format.

Behavioral spec: reference waifu2x/models/swin_unet_v2.py:14-354 with
nunif/modules/attention.py WindowMHA2d (zero-pad shift) + WindowScoreBias
(learned MLP score bias) internals.  Eval mode, fp32.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


def bchw_to_bnc(x, ws):
    B, C, H, W = x.shape
    sh, sw = ws
    oh, ow = H // sh, W // sw
    x = x.reshape(B, C, oh, sh, ow, sw)
    x = x.permute(0, 2, 4, 3, 5, 1)
    return x.reshape(B * oh * ow, sh * sw, C)


def bnc_to_bchw(x, out_shape, ws):
    OB, OC, OH, OW = out_shape
    sh, sw = ws
    h, w = OH // sh, OW // sw
    x = x.reshape(OB, h, w, sh, sw, OC)
    x = x.permute(0, 5, 1, 3, 2, 4)
    return x.reshape(OB, OC, OH, OW)


class MHA(nn.Module):
    def __init__(self, embed_dim, num_heads, qkv_dim=None):
        super().__init__()
        qkv_dim = qkv_dim or embed_dim // num_heads
        self.qkv_dim = qkv_dim
        self.num_heads = num_heads
        self.qkv_proj = nn.Linear(embed_dim, qkv_dim * num_heads * 3)
        self.head_proj = nn.Linear(qkv_dim * num_heads, embed_dim)

    def forward(self, x, attn_mask=None):
        B, N, _ = x.shape
        q, k, v = self.qkv_proj(x).split(self.qkv_dim * self.num_heads, dim=-1)

        def heads(t):
            return t.view(B, N, self.num_heads, self.qkv_dim).permute(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = q.matmul(k.transpose(-2, -1)) * self.qkv_dim ** -0.5
        if attn_mask is not None:
            attn = attn + attn_mask
        attn = F.softmax(attn, dim=-1)
        out = attn.matmul(v).permute(0, 2, 1, 3).reshape(
            B, N, self.qkv_dim * self.num_heads)
        return self.head_proj(out)


class WindowMHA2d(nn.Module):
    def __init__(self, in_channels, num_heads, window_size=(4, 4),
                 qkv_dim=None, shift=False):
        super().__init__()
        self.window_size = (tuple(window_size)
                            if isinstance(window_size, (tuple, list))
                            else (window_size, window_size))
        self.shift = (tuple(shift) if isinstance(shift, (tuple, list))
                      else (shift, shift))
        self.pad_h = self.window_size[0] // 2 if self.shift[0] else 0
        self.pad_w = self.window_size[1] // 2 if self.shift[1] else 0
        self.mha = MHA(in_channels, num_heads, qkv_dim)

    def forward(self, x, attn_mask=None, layer_norm=None):
        if self.pad_h or self.pad_w:
            x = F.pad(x, (self.pad_w, self.pad_w, self.pad_h, self.pad_h))
        out_shape = x.shape
        x = bchw_to_bnc(x, self.window_size)
        if layer_norm is not None:
            x = layer_norm(x)
        x = self.mha(x, attn_mask=attn_mask)
        x = bnc_to_bchw(x, out_shape, self.window_size)
        if self.pad_h or self.pad_w:
            x = F.pad(x, (-self.pad_w, -self.pad_w, -self.pad_h, -self.pad_h))
        return x


def _score_bias_input(ws):
    n = ws[0] * ws[1]
    pos = torch.stack(torch.meshgrid(torch.arange(ws[0]), torch.arange(ws[1]),
                                     indexing="ij"), dim=2).reshape(n, 2)
    delta = (pos[:, None, :] - pos[None, :, :]).reshape(n * n, 2)
    uniq = sorted({tuple(p) for p in delta.tolist()})
    index = torch.tensor([uniq.index(tuple(d)) for d in delta.tolist()])
    uniq = torch.tensor(uniq, dtype=torch.float32)
    return index, uniq / uniq.abs().max()


class WindowScoreBias(nn.Module):
    def __init__(self, window_size, hidden_dim=None):
        super().__init__()
        ws = (tuple(window_size) if isinstance(window_size, (tuple, list))
              else (window_size, window_size))
        self.ws = ws
        index, delta = _score_bias_input(ws)
        self.register_buffer("index", index)
        self.register_buffer("delta", delta)
        hidden = hidden_dim or int((ws[0] * ws[1]) ** 0.5) * 2
        self.to_bias = nn.Sequential(nn.Linear(2, hidden), nn.GELU(),
                                     nn.Linear(hidden, 1))

    def forward(self):
        n = self.ws[0] * self.ws[1]
        bias = self.to_bias(self.delta)[self.index]
        return bias.reshape(n, n)


class GLUConvMLP(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, mlp_ratio=2):
        super().__init__()
        mid = int(out_channels * mlp_ratio)
        self.pad = (kernel_size - 1) // 2
        self.w1 = nn.Conv2d(in_channels, mid, 1)
        self.w2 = nn.Conv2d(mid // 2, out_channels, kernel_size)

    def forward(self, x):
        x = self.w1(x)
        x = F.glu(x, dim=1)
        x = F.pad(x, (self.pad,) * 4, mode="replicate")
        return F.leaky_relu(self.w2(x), 0.2)


class MLP(nn.Module):
    def __init__(self, in_channels, out_channels, mlp_ratio=2):
        super().__init__()
        mid = int(out_channels * mlp_ratio)
        self.w1 = nn.Conv2d(in_channels, mid, 1)
        self.w2 = nn.Conv2d(mid, out_channels, 1)

    def forward(self, x):
        return self.w2(F.leaky_relu(self.w1(x), 0.1))


class WACBlock(nn.Module):
    def __init__(self, in_channels, num_heads=4, window_size=8, mlp_ratio=2,
                 conv_mlp=True, shift=False):
        super().__init__()
        ws = (tuple(window_size) if isinstance(window_size, (tuple, list))
              else (window_size, window_size))
        self.mha = WindowMHA2d(in_channels, num_heads, ws, shift=shift)
        self.relative_bias = WindowScoreBias(ws)
        self.norm = nn.LayerNorm(in_channels, bias=False)
        if conv_mlp:
            self.conv_mlp = GLUConvMLP(in_channels, in_channels,
                                       mlp_ratio=mlp_ratio)
        else:
            self.conv_mlp = MLP(in_channels, in_channels, mlp_ratio=mlp_ratio)

    def forward(self, x):
        x = x + self.mha(x, attn_mask=self.relative_bias(),
                         layer_norm=self.norm)
        return x + self.conv_mlp(x)


class WACBlocks(nn.Module):
    def __init__(self, in_channels, num_heads=4, window_size=8, mlp_ratio=2,
                 num_layers=2, conv_mlp=True, shift=None):
        super().__init__()
        if isinstance(window_size, int):
            window_size = [window_size] * num_layers
        if isinstance(conv_mlp, bool):
            conv_mlp = [conv_mlp] * num_layers
        if shift is None:
            shift = [i % 2 == 1 for i in range(num_layers)]
        self.blocks = nn.Sequential(*[
            WACBlock(in_channels, num_heads, window_size[i], mlp_ratio,
                     conv_mlp[i], shift[i]) for i in range(num_layers)])

    def forward(self, x):
        return self.blocks(x)


class IR(nn.Module):
    def __init__(self, in_channels=3, out_channels=32):
        super().__init__()
        self.path1 = nn.Sequential(
            nn.Conv2d(in_channels, out_channels // 2, 3), nn.LeakyReLU(0.2))
        self.path2 = nn.Sequential(
            nn.PixelUnshuffle(2),
            nn.Conv2d(in_channels * 4, out_channels // 2 * 4, 1),
            WACBlock(out_channels // 2 * 4, num_heads=2, window_size=8,
                     mlp_ratio=1, shift=True),
            WACBlock(out_channels // 2 * 4, num_heads=2, window_size=8,
                     mlp_ratio=1, shift=False),
            nn.PixelShuffle(2))

    def forward(self, x):
        x1 = self.path1(F.pad(x, (1,) * 4, mode="replicate"))
        x2 = self.path2(x)
        return torch.cat([x1, x2], dim=1)


class PatchDown(nn.Module):
    def __init__(self, in_channels, out_channels, residual=False):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels, 2, 2)
        self.out_channels = out_channels
        self.residual = residual
        if residual:
            self.group_size = in_channels * 4 // out_channels

    def forward(self, x):
        if self.residual:
            sc = F.pixel_unshuffle(x, 2)
            B, C, H, W = sc.shape
            sc = sc.view(B, self.out_channels, self.group_size, H, W).mean(2)
            return sc + F.leaky_relu(self.conv(x), 0.2)
        return F.leaky_relu(self.conv(x), 0.2)


class PatchUp(nn.Module):
    def __init__(self, in_channels, out_channels, residual=False):
        super().__init__()
        self.proj = nn.Conv2d(in_channels, out_channels * 4, 1)
        self.residual = residual
        if residual:
            self.repeats = out_channels * 4 // in_channels

    def forward(self, x):
        if self.residual:
            sc = F.pixel_shuffle(x.repeat_interleave(self.repeats, dim=1), 2)
            return sc + F.pixel_shuffle(F.leaky_relu(self.proj(x), 0.2), 2)
        return F.pixel_shuffle(F.leaky_relu(self.proj(x), 0.2), 2)


class ToImage(nn.Module):
    def __init__(self, in_channels, out_channels, scale_factor):
        super().__init__()
        self.scale_factor = scale_factor
        self.proj = nn.Conv2d(in_channels, out_channels * scale_factor ** 2, 1)

    def forward(self, x):
        x = self.proj(x)
        if self.scale_factor > 1:
            x = F.pixel_shuffle(x, self.scale_factor)
        return F.pad(x, (-self.scale_factor,) * 4)


class SourceResidual(nn.Module):
    def __init__(self, out_channels, scale_factor, source_channels=3):
        super().__init__()
        self.scale_factor = scale_factor
        self.resampling = nn.Conv2d(source_channels,
                                    out_channels * scale_factor ** 2, 3,
                                    bias=False)
        self.scale_bias = nn.Parameter(torch.zeros(1))
        with torch.no_grad():
            s = scale_factor
            OUT, IN, H, W = self.resampling.weight.shape
            w = torch.zeros((OUT // (s * s), IN, H, W))
            for c in range(3):
                w[c, c, 1, 1] = 1.0
            if s > 1:
                w = w.permute(1, 0, 2, 3)
                w = F.interpolate(w, scale_factor=s, mode="nearest")
                w = F.pixel_unshuffle(w, s)
                w = w.permute(1, 0, 2, 3)
            self.resampling.weight.copy_(w)

    def forward(self, x, src):
        src = F.pad(src, (1,) * 4, mode="replicate")
        src = self.resampling(src)
        if self.scale_factor > 1:
            src = F.pixel_shuffle(src, self.scale_factor)
        unpad = (x.shape[2] - src.shape[2]) // 2
        if unpad != 0:
            src = F.pad(src, (unpad,) * 4)
        return src + x * self.scale_bias


def get_shift_config(num_layers):
    return tuple(reversed([i % 2 == 1 for i in range(num_layers)]))


class SwinUNetV2Base(nn.Module):
    def __init__(self, in_channels=3, out_channels=3, base_dim=96,
                 lv1_mlp_ratio=2, lv2_mlp_ratio=1, lv2_ratio=4,
                 first_layers=2, last_layers=3, scale_factor=2):
        super().__init__()
        C = base_dim
        C2 = int(C * lv2_ratio)
        HEADS = max(C // 32, 2)
        HEADS2 = max(C2 // 32, 2)
        self.ir = IR(3, 32)
        self.patch = nn.Conv2d(32, C, 3)
        self.wac1 = WACBlocks(C, num_heads=HEADS, window_size=[8, 6],
                              mlp_ratio=lv1_mlp_ratio,
                              num_layers=first_layers,
                              shift=get_shift_config(first_layers))
        self.down1 = PatchDown(C, C2, residual=True)
        self.wac2 = WACBlocks(C2, num_heads=HEADS2, window_size=8,
                              mlp_ratio=lv2_mlp_ratio, num_layers=4,
                              shift=get_shift_config(4))
        self.up1 = PatchUp(C2, C, residual=True)
        self.wac3 = WACBlocks(C, num_heads=HEADS, window_size=8,
                              mlp_ratio=lv1_mlp_ratio, num_layers=last_layers,
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
        x1 = self.wac1(x)
        x = self.down1(x1)
        x = self.wac2(x)
        x = self.up1(x)
        x = x + x1
        x = self.wac3(x)
        x = self.to_residual_image(x)
        return self.to_image(x, src)


class SwinUNetV2(nn.Module):
    """Top wrapper so state_dict keys carry the ``unet.`` prefix."""

    def __init__(self, **kwargs):
        super().__init__()
        self.unet = SwinUNetV2Base(**kwargs)

    def forward(self, x):
        return torch.clamp(self.unet(x), 0, 1)
