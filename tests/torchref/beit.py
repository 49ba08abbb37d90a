"""Plain-torch MiDaS DPT-BEiT core matching the released checkpoint key
layout (behavioral spec: the published MiDaS v3.1 BEiT backbone — timm
BEiT with q/v-only biases, per-block relative position bias with cls
specials, LayerScale gammas — plus the DPT neck with project-readout
act_postprocess pyramids and the MiDaS scratch head)."""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from .dinovit import ResidualConvUnit, FeatureFusionBlock


def relative_position_index(g):
    coords = np.stack(np.meshgrid(np.arange(g), np.arange(g), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += g - 1
    rel[:, :, 1] += g - 1
    rel[:, :, 0] *= 2 * g - 1
    n = g * g
    num_rel = (2 * g - 1) * (2 * g - 1)
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel
    idx[0:, 0] = num_rel + 1
    idx[0, 0] = num_rel + 2
    return torch.from_numpy(idx)


class BeitAttention(nn.Module):
    def __init__(self, dim, num_heads, grid):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)
        n_rel = (2 * grid - 1) * (2 * grid - 1) + 3
        self.relative_position_bias_table = nn.Parameter(
            torch.randn(n_rel, num_heads) * 0.02)
        self.register_buffer("relative_position_index",
                             relative_position_index(grid))

    def forward(self, x):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv_bias = torch.cat(
            (self.q_bias, torch.zeros_like(self.v_bias), self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.reshape(B, N, self.num_heads, hd).permute(0, 2, 1, 3)
        k = k.reshape(B, N, self.num_heads, hd).permute(0, 2, 1, 3)
        v = v.reshape(B, N, self.num_heads, hd).permute(0, 2, 1, 3)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.reshape(-1)]
        bias = bias.reshape(N, N, -1).permute(2, 0, 1)
        attn = torch.softmax(attn + bias.unsqueeze(0), dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, C)
        return self.proj(out)


class BeitBlock(nn.Module):
    def __init__(self, dim, num_heads, grid, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = BeitAttention(dim, num_heads, grid)
        self.gamma_1 = nn.Parameter(torch.full((dim,), 0.1))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
                self.fc2 = nn.Linear(int(dim * mlp_ratio), dim)

            def forward(self, x):
                return self.fc2(F.gelu(self.fc1(x)))

        self.mlp = Mlp()
        self.gamma_2 = nn.Parameter(torch.full((dim,), 0.1))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        x = x + self.gamma_2 * self.mlp(self.norm2(x))
        return x


class BeitModel(nn.Module):
    def __init__(self, embed_dim, depth, num_heads, grid=24, patch=16):
        super().__init__()
        self.patch = patch

        class PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, embed_dim, patch, patch)

        self.patch_embed = PatchEmbed()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.blocks = nn.ModuleList(
            [BeitBlock(embed_dim, num_heads, grid) for _ in range(depth)])

    def forward_hooks(self, x, hooks):
        B = x.shape[0]
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(B, -1, -1), t], dim=1)
        outs = {}
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in hooks:
                outs[i] = t
        return [outs[i] for i in hooks]


class ProjectReadout(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * dim, dim), nn.GELU())

    def forward(self, tokens):
        cls_t, patch_t = tokens[:, :1], tokens[:, 1:]
        feats = torch.cat((patch_t, cls_t.expand_as(patch_t)), -1)
        return self.project(feats)


class MidasBeit(nn.Module):
    """MiDaS DPT-BEiT: keys pretrained.model.*, pretrained.act_postprocess
    {1-4}.*, scratch.*."""

    def __init__(self, embed_dim=768, depth=12, num_heads=12,
                 hooks=(2, 5, 8, 11), neck=(96, 192, 384, 768),
                 features=256, grid=24):
        super().__init__()
        self.hooks = list(hooks)

        class Pretrained(nn.Module):
            pass

        p = Pretrained()
        p.model = BeitModel(embed_dim, depth, num_heads, grid)
        p.act_postprocess1 = nn.Sequential(
            ProjectReadout(embed_dim), nn.Identity(), nn.Identity(),
            nn.Conv2d(embed_dim, neck[0], 1),
            nn.ConvTranspose2d(neck[0], neck[0], 4, 4))
        p.act_postprocess2 = nn.Sequential(
            ProjectReadout(embed_dim), nn.Identity(), nn.Identity(),
            nn.Conv2d(embed_dim, neck[1], 1),
            nn.ConvTranspose2d(neck[1], neck[1], 2, 2))
        p.act_postprocess3 = nn.Sequential(
            ProjectReadout(embed_dim), nn.Identity(), nn.Identity(),
            nn.Conv2d(embed_dim, neck[2], 1))
        p.act_postprocess4 = nn.Sequential(
            ProjectReadout(embed_dim), nn.Identity(), nn.Identity(),
            nn.Conv2d(embed_dim, neck[3], 1),
            nn.Conv2d(neck[3], neck[3], 3, 2, 1))
        self.pretrained = p

        class Scratch(nn.Module):
            pass

        s = Scratch()
        for i, c in enumerate(neck):
            setattr(s, f"layer{i + 1}_rn",
                    nn.Conv2d(c, features, 3, 1, 1, bias=False))
        s.refinenet4 = FeatureFusionBlock(features)  # rcu1 present (dead)
        s.refinenet3 = FeatureFusionBlock(features)
        s.refinenet2 = FeatureFusionBlock(features)
        s.refinenet1 = FeatureFusionBlock(features)
        s.output_conv = nn.Sequential(
            nn.Conv2d(features, features // 2, 3, 1, 1), nn.Identity(),
            nn.Conv2d(features // 2, 32, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(32, 1, 1), nn.ReLU())
        self.scratch = s

    def forward(self, x):
        B, _, H, W = x.shape
        gh, gw = H // 16, W // 16
        feats = self.pretrained.model.forward_hooks(x, self.hooks)
        p = self.pretrained
        posts = [p.act_postprocess1, p.act_postprocess2, p.act_postprocess3,
                 p.act_postprocess4]
        levels = []
        for i, (t, post) in enumerate(zip(feats, posts)):
            t = post[0](t)  # readout -> (B, N, C)
            t = t.transpose(1, 2).reshape(B, -1, gh, gw)
            for m in list(post)[3:]:
                t = m(t)
            levels.append(t)
        s = self.scratch
        rn = [getattr(s, f"layer{i + 1}_rn")(levels[i]) for i in range(4)]
        r4 = s.refinenet4(rn[3], size=rn[2].shape[2:])
        r3 = s.refinenet3(r4, rn[2], size=rn[1].shape[2:])
        r2 = s.refinenet2(r3, rn[1], size=rn[0].shape[2:])
        r1 = s.refinenet1(r2, rn[0])
        h = s.output_conv[0](r1)
        h = F.interpolate(h, size=(H, W), mode="bilinear",
                          align_corners=True)
        out32 = F.relu(s.output_conv[2](h))
        rel = F.relu(s.output_conv[4](out32))
        return rel[:, 0], [out32, rn[3], r4, r3, r2, r1]
