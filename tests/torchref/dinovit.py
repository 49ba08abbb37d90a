"""Plain-torch DINOv2 ViT + DPT head + VDA temporal head matching the
released checkpoint key layouts.

Behavioral specs: the published DINOv2 ViT (patch-14, LayerScale,
pre-norm), the Depth-Anything v2 DPTHead, and Video-Depth-Anything's
DPTHeadTemporal with AnimateDiff-style temporal transformer modules
(GroupNorm -> proj_in -> [attn x2 with sinusoidal PE, GEGLU FF] ->
zero-init proj_out, residual).
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class LayerScale(nn.Module):
    def __init__(self, dim, init=1e-5):
        super().__init__()
        self.gamma = nn.Parameter(torch.full((dim,), init))

    def forward(self, x):
        return x * self.gamma


class Attention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.permute(0, 2, 1, 3) * hd ** -0.5
        k = k.permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3)
        attn = torch.softmax(q @ k.transpose(-2, -1), dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, C)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, num_heads)
        self.ls1 = LayerScale(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.ls2 = LayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class PatchEmbed(nn.Module):
    def __init__(self, dim, patch=14):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, patch)

    def forward(self, x):
        x = self.proj(x)  # (B, C, ph, pw)
        return x.flatten(2).transpose(1, 2)


class DinoVisionTransformer(nn.Module):
    def __init__(self, embed_dim=384, depth=12, num_heads=6,
                 pos_embed_size=37):
        super().__init__()
        self.patch_size = 14
        self.pos_embed_size = pos_embed_size
        self.patch_embed = PatchEmbed(embed_dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(
            torch.randn(1, 1 + pos_embed_size ** 2, embed_dim) * 0.02)
        self.blocks = nn.ModuleList(
            [Block(embed_dim, num_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)

    def get_intermediate_layers(self, x, idxs):
        B, _, H, W = x.shape
        ph, pw = H // self.patch_size, W // self.patch_size
        tokens = self.patch_embed(x)
        cls = self.cls_token.expand(B, -1, -1)
        tokens = torch.cat([cls, tokens], dim=1)
        assert (ph, pw) == (self.pos_embed_size, self.pos_embed_size), \
            "parity tests run at the native pos-embed grid (no interp)"
        tokens = tokens + self.pos_embed
        outs = {}
        for i, blk in enumerate(self.blocks):
            tokens = blk(tokens)
            if i in idxs:
                outs[i] = tokens
        return [self.norm(outs[i])[:, 1:] for i in idxs], (ph, pw)


class ResidualConvUnit(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, 1, 1)
        self.conv2 = nn.Conv2d(features, features, 3, 1, 1)

    def forward(self, x):
        h = self.conv1(F.relu(x))
        h = self.conv2(F.relu(h))
        return x + h


class FeatureFusionBlock(nn.Module):
    def __init__(self, features, first=False):
        super().__init__()
        if not first:
            self.resConfUnit1 = ResidualConvUnit(features)
        self.resConfUnit2 = ResidualConvUnit(features)
        self.out_conv = nn.Conv2d(features, features, 1)

    def forward(self, x, res=None, size=None):
        if res is not None:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        if size is None:
            size = (x.shape[2] * 2, x.shape[3] * 2)
        x = F.interpolate(x, size=size, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class _Scratch(nn.Module):
    def __init__(self, features, out_channels):
        super().__init__()
        for i, c in enumerate(out_channels):
            setattr(self, f"layer{i + 1}_rn",
                    nn.Conv2d(c, features, 3, 1, 1, bias=False))
        self.refinenet4 = FeatureFusionBlock(features, first=True)
        self.refinenet3 = FeatureFusionBlock(features)
        self.refinenet2 = FeatureFusionBlock(features)
        self.refinenet1 = FeatureFusionBlock(features)
        self.output_conv1 = nn.Conv2d(features, features // 2, 3, 1, 1)
        self.output_conv2 = nn.Sequential(
            nn.Conv2d(features // 2, 32, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(32, 1, 1), nn.ReLU())


class DPTHead(nn.Module):
    """Depth-Anything v2 relative head (key layout: projects/resize_layers/
    scratch)."""

    def __init__(self, in_dim, features, out_channels):
        super().__init__()
        self.projects = nn.ModuleList(
            [nn.Conv2d(in_dim, c, 1) for c in out_channels])
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(out_channels[0], out_channels[0], 4, 4),
            nn.ConvTranspose2d(out_channels[1], out_channels[1], 2, 2),
            nn.Identity(),
            nn.Conv2d(out_channels[3], out_channels[3], 3, 2, 1)])
        self.scratch = _Scratch(features, out_channels)

    def forward(self, feats, ph, pw):
        levels = []
        for i, t in enumerate(feats):
            x = t.transpose(1, 2).reshape(t.shape[0], -1, ph, pw)
            x = self.projects[i](x)
            x = self.resize_layers[i](x)
            levels.append(x)
        s = self.scratch
        rn = [getattr(s, f"layer{i + 1}_rn")(levels[i]) for i in range(4)]
        p4 = s.refinenet4(rn[3], size=rn[2].shape[2:])
        p3 = s.refinenet3(p4, rn[2], size=rn[1].shape[2:])
        p2 = s.refinenet2(p3, rn[1], size=rn[0].shape[2:])
        p1 = s.refinenet1(p2, rn[0])
        out = s.output_conv1(p1)
        out = F.interpolate(out, size=(ph * 14, pw * 14), mode="bilinear",
                            align_corners=True)
        return s.output_conv2(out)


class DepthAnythingV2(nn.Module):
    def __init__(self, embed_dim=384, depth=12, num_heads=6, features=64,
                 out_channels=(48, 96, 192, 384), idxs=(2, 5, 8, 11),
                 pos_embed_size=37):
        super().__init__()
        self.idxs = list(idxs)
        self.pretrained = DinoVisionTransformer(embed_dim, depth, num_heads,
                                                pos_embed_size)
        self.depth_head = DPTHead(embed_dim, features, out_channels)

    def forward(self, x):
        feats, (ph, pw) = self.pretrained.get_intermediate_layers(
            x, self.idxs)
        return self.depth_head(feats, ph, pw)


# ---------------------------------------------------------------- temporal

def sinusoidal_pe(max_len, dim):
    pos = torch.arange(max_len, dtype=torch.float64).unsqueeze(1)
    div = torch.exp(torch.arange(0, dim, 2, dtype=torch.float64)
                    * (-math.log(10000.0) / dim))
    pe = torch.zeros(max_len, dim)
    pe[:, 0::2] = torch.sin(pos * div).float()
    pe[:, 1::2] = torch.cos(pos * div).float()[:, : pe[:, 1::2].shape[1]]
    return pe


class VersatileAttention(nn.Module):
    def __init__(self, dim, num_heads=8, max_len=32):
        super().__init__()
        self.num_heads = num_heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])
        self.register_buffer("pe", sinusoidal_pe(max_len, dim).unsqueeze(0))

    def forward(self, x):
        # x: (B*HW, T, C), temporal self-attention with PE on the input
        B, T, C = x.shape
        x = x + self.pe[:, :T]
        hd = C // self.num_heads
        q = self.to_q(x).reshape(B, T, self.num_heads, hd).permute(0, 2, 1, 3)
        k = self.to_k(x).reshape(B, T, self.num_heads, hd).permute(0, 2, 1, 3)
        v = self.to_v(x).reshape(B, T, self.num_heads, hd).permute(0, 2, 1, 3)
        attn = torch.softmax((q * hd ** -0.5) @ k.transpose(-2, -1), dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, T, C)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim, dim_out * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class FeedForward(nn.Module):
    """diffusers FeedForward: keys ff.net.0.proj / ff.net.2."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList([GEGLU(dim, dim * mult), nn.Identity(),
                                  nn.Linear(dim * mult, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class TemporalTransformerBlock(nn.Module):
    def __init__(self, dim, num_heads=8, max_len=32):
        super().__init__()
        self.attention_blocks = nn.ModuleList(
            [VersatileAttention(dim, num_heads, max_len) for _ in range(2)])
        self.norms = nn.ModuleList(
            [nn.LayerNorm(dim, eps=1e-6) for _ in range(2)])
        self.ff = FeedForward(dim)
        self.ff_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        for attn, norm in zip(self.attention_blocks, self.norms):
            x = x + attn(norm(x))
        x = x + self.ff(self.ff_norm(x))
        return x


class TemporalModule(nn.Module):
    """AnimateDiff-style motion module (temporal_transformer key layout)."""

    def __init__(self, dim, num_heads=8, max_len=32):
        super().__init__()
        tt = nn.Module()
        tt.norm = nn.GroupNorm(min(32, dim), dim, eps=1e-6)
        tt.proj_in = nn.Linear(dim, dim)
        tt.transformer_blocks = nn.ModuleList(
            [TemporalTransformerBlock(dim, num_heads, max_len)])
        tt.proj_out = nn.Linear(dim, dim)
        nn.init.zeros_(tt.proj_out.weight)
        nn.init.zeros_(tt.proj_out.bias)
        self.temporal_transformer = tt

    def forward(self, x):
        # x: (B, T, C, H, W)
        B, T, C, H, W = x.shape
        res = x
        tt = self.temporal_transformer
        h = tt.norm(x.reshape(B * T, C, H, W))
        h = h.permute(0, 2, 3, 1).reshape(B, T, H * W, C)
        h = tt.proj_in(h)
        h = h.permute(0, 2, 1, 3).reshape(B * H * W, T, C)
        h = tt.transformer_blocks[0](h)
        h = tt.proj_out(h)
        h = h.reshape(B, H * W, T, C).permute(0, 2, 3, 1)
        h = h.reshape(B, T, C, H, W)
        return res + h


class VideoDepthAnythingTorch(nn.Module):
    """FULL VDA tree oracle: DINOv2 per-frame trunk + DPT head with
    AnimateDiff motion modules at levels 2/3 (after the resize pyramid)
    and after refinenet4/refinenet3 — the published Video-Depth-Anything
    assembly the reference consumes via torch.hub
    (/root/reference/iw3/video_depth_anything_model.py:129)."""

    def __init__(self, embed_dim=384, depth=12, num_heads=6, features=64,
                 out_channels=(48, 96, 192, 384), idxs=(2, 5, 8, 11),
                 pos_embed_size=37, max_len=32):
        super().__init__()
        self.idxs = list(idxs)
        self.pretrained = DinoVisionTransformer(embed_dim, depth, num_heads,
                                                pos_embed_size)
        self.head = DPTHead(embed_dim, features, out_channels)
        self.head.motion_modules = nn.ModuleList([
            TemporalModule(out_channels[2], max_len=max_len),
            TemporalModule(out_channels[3], max_len=max_len),
            TemporalModule(features, max_len=max_len),
            TemporalModule(features, max_len=max_len)])

    def forward(self, x):
        # x: (B, T, 3, H, W) -> (B, T, 1, H, W)
        B, T = x.shape[:2]
        feats, (ph, pw) = self.pretrained.get_intermediate_layers(
            x.flatten(0, 1), self.idxs)
        head = self.head
        levels = []
        for i, t in enumerate(feats):
            z = t.transpose(1, 2).reshape(B * T, -1, ph, pw)
            z = head.projects[i](z)
            z = head.resize_layers[i](z)
            levels.append(z)

        def motion(i, z):
            return head.motion_modules[i](
                z.reshape(B, T, *z.shape[1:])).flatten(0, 1)

        levels[2] = motion(0, levels[2])
        levels[3] = motion(1, levels[3])
        s = head.scratch
        rn = [getattr(s, f"layer{i + 1}_rn")(levels[i]) for i in range(4)]
        p4 = s.refinenet4(rn[3], size=rn[2].shape[2:])
        p4 = motion(2, p4)
        p3 = s.refinenet3(p4, rn[2], size=rn[1].shape[2:])
        p3 = motion(3, p3)
        p2 = s.refinenet2(p3, rn[1], size=rn[0].shape[2:])
        p1 = s.refinenet1(p2, rn[0])
        out = s.output_conv1(p1)
        out = F.interpolate(out, size=(ph * 14, pw * 14), mode="bilinear",
                            align_corners=True)
        out = s.output_conv2(out)
        return out.reshape(B, T, 1, ph * 14, pw * 14)


class DepthAnythingV3MonoTorch(nn.Module):
    """FULL DA3-mono tree oracle: DINOv2 trunk + DPT head with a raw
    2-channel output (depth+sky; softplus/sigmoid applied OUTSIDE the
    head) — the assembly the reference consumes via torch.hub
    (/root/reference/iw3/depth_anything_v3_model.py)."""

    def __init__(self, embed_dim=384, depth=12, num_heads=6, features=64,
                 out_channels=(48, 96, 192, 384), idxs=(2, 5, 8, 11),
                 pos_embed_size=37):
        super().__init__()
        self.idxs = list(idxs)
        self.pretrained = DinoVisionTransformer(embed_dim, depth, num_heads,
                                                pos_embed_size)
        self.depth_head = DPTHead(embed_dim, features, out_channels)
        # raw 2-channel head: same key layout (output_conv2.{0,2}), final
        # ReLU removed, 2 output channels
        self.depth_head.scratch.output_conv2 = nn.Sequential(
            nn.Conv2d(features // 2, 32, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(32, 2, 1))

    def forward(self, x):
        feats, (ph, pw) = self.pretrained.get_intermediate_layers(
            x, self.idxs)
        head = self.depth_head
        levels = []
        for i, t in enumerate(feats):
            z = t.transpose(1, 2).reshape(t.shape[0], -1, ph, pw)
            z = head.projects[i](z)
            z = head.resize_layers[i](z)
            levels.append(z)
        s = head.scratch
        rn = [getattr(s, f"layer{i + 1}_rn")(levels[i]) for i in range(4)]
        p4 = s.refinenet4(rn[3], size=rn[2].shape[2:])
        p3 = s.refinenet3(p4, rn[2], size=rn[1].shape[2:])
        p2 = s.refinenet2(p3, rn[1], size=rn[0].shape[2:])
        p1 = s.refinenet1(p2, rn[0])
        out = s.output_conv1(p1)
        out = F.interpolate(out, size=(ph * 14, pw * 14), mode="bilinear",
                            align_corners=True)
        out = s.output_conv2(out)
        depth = F.softplus(out[:, 0])
        sky = torch.sigmoid(out[:, 1])
        return depth, sky
