"""Hand-built torch DepthPro following the published Apple ml-depth-pro
architecture (the reference consumes it via torch.hub
"nagadomi/ml-depth-pro_iw3"; /root/reference/iw3/depth_pro_model.py is the
wrapper).  State-dict key names match the released checkpoint layout so
``torch_convert.convert_depth_pro`` is exercised 1:1:
encoder.{patch,image}_encoder.* (timm DINOv2 ViTs), encoder.upsample*,
decoder.convs/fusions, head.{0,1,2,4}, fov.{encoder,downsample,head}.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from .dinovit import Block


class Vit16(nn.Module):
    """timm-style DINOv2 ViT, patch 16, with forward-hook-style raw
    intermediate capture (apple hooks block outputs WITHOUT final norm)."""

    def __init__(self, embed_dim=64, depth=2, num_heads=2, pos_embed_size=4):
        super().__init__()
        self.patch_size = 16
        self.pos_embed_size = pos_embed_size
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed_dim, 16, stride=16)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(
            torch.randn(1, 1 + pos_embed_size ** 2, embed_dim) * 0.02)
        self.blocks = nn.ModuleList(
            [Block(embed_dim, num_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)

    def forward(self, x, hook_ids=()):
        B = x.shape[0]
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(B, -1, -1), t], dim=1)
        assert x.shape[-1] // 16 == self.pos_embed_size
        t = t + self.pos_embed
        raws = {}
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in hook_ids:
                raws[i] = t
        return self.norm(t), [raws[i] for i in hook_ids]


def _project_upsample(dim_in, dim_out, upsample_layers, dim_int=None):
    if dim_int is None:
        dim_int = dim_out
    blocks = [nn.Conv2d(dim_in, dim_int, 1, bias=False)]
    blocks += [nn.ConvTranspose2d(dim_int if i == 0 else dim_out, dim_out,
                                  2, stride=2, bias=False)
               for i in range(upsample_layers)]
    return nn.Sequential(*blocks)


class ResidualBlock(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.residual = nn.Sequential(
            nn.ReLU(False), nn.Conv2d(features, features, 3, 1, 1),
            nn.ReLU(False), nn.Conv2d(features, features, 3, 1, 1))

    def forward(self, x):
        return x + self.residual(x)


class FeatureFusionBlock2d(nn.Module):
    def __init__(self, features, deconv=False):
        super().__init__()
        self.resnet1 = ResidualBlock(features)
        self.resnet2 = ResidualBlock(features)
        self.use_deconv = deconv
        if deconv:
            self.deconv = nn.ConvTranspose2d(features, features, 2,
                                             stride=2, bias=False)
        self.out_conv = nn.Conv2d(features, features, 1, bias=True)

    def forward(self, x0, x1=None):
        x = x0
        if x1 is not None:
            x = x + self.resnet1(x1)
        x = self.resnet2(x)
        if self.use_deconv:
            x = self.deconv(x)
        return self.out_conv(x)


class DepthProEncoder(nn.Module):
    def __init__(self, dims_encoder, patch_encoder, image_encoder,
                 hook_block_ids, decoder_features):
        super().__init__()
        self.dims_encoder = list(dims_encoder)
        self.patch_encoder = patch_encoder
        self.image_encoder = image_encoder
        self.hook_block_ids = list(hook_block_ids)
        C = patch_encoder.pos_embed.shape[-1]
        self.out_size = patch_encoder.pos_embed_size
        self.upsample_latent0 = _project_upsample(
            C, decoder_features, 3, dim_int=self.dims_encoder[0])
        self.upsample_latent1 = _project_upsample(C, self.dims_encoder[0], 2)
        self.upsample0 = _project_upsample(C, self.dims_encoder[1], 1)
        self.upsample1 = _project_upsample(C, self.dims_encoder[2], 1)
        self.upsample2 = _project_upsample(C, self.dims_encoder[3], 1)
        self.upsample_lowres = nn.ConvTranspose2d(
            C, self.dims_encoder[3], 2, stride=2, bias=True)
        self.fuse_lowres = nn.Conv2d(2 * self.dims_encoder[3],
                                     self.dims_encoder[3], 1, bias=True)

    @staticmethod
    def split(x, tile, overlap_ratio):
        stride = int(tile * (1 - overlap_ratio))
        size = x.shape[-1]
        steps = int(math.ceil((size - tile) / stride)) + 1 if size > tile \
            else 1
        out = []
        for j in range(steps):
            for i in range(steps):
                out.append(x[..., j * stride:j * stride + tile,
                             i * stride:i * stride + tile])
        return torch.cat(out, dim=0), steps

    @staticmethod
    def merge(x, batch_size, steps, padding):
        idx = 0
        rows = []
        for j in range(steps):
            row = []
            for i in range(steps):
                t = x[batch_size * idx:batch_size * (idx + 1)]
                if j != 0:
                    t = t[..., padding:, :]
                if j != steps - 1:
                    t = t[..., :t.shape[-2] - padding, :]
                if i != 0:
                    t = t[..., :, padding:]
                if i != steps - 1:
                    t = t[..., :, :t.shape[-1] - padding]
                row.append(t)
                idx += 1
            rows.append(torch.cat(row, dim=-1))
        return torch.cat(rows, dim=-2)

    def _grid(self, tokens):
        B, N, C = tokens.shape
        g = self.out_size
        return tokens[:, 1:].reshape(B, g, g, C).permute(0, 3, 1, 2)

    def forward(self, x):
        B = x.shape[0]
        p = x.shape[-1] // 4
        x1 = F.interpolate(x, scale_factor=0.5, mode="bilinear",
                           align_corners=False)
        x2 = F.interpolate(x, scale_factor=0.25, mode="bilinear",
                           align_corners=False)
        x0_p, n_hi = self.split(x, p, 0.25)
        x1_p, n_mid = self.split(x1, p, 0.5)
        tiles = torch.cat([x0_p, x1_p, x2], dim=0)
        final, (raw0, raw1) = self.patch_encoder(
            tiles, hook_ids=self.hook_block_ids)
        final = self._grid(final)
        bh = B * n_hi * n_hi
        bm = bh + B * n_mid * n_mid
        p_hi, p_mid = self.out_size // 8, self.out_size // 4
        lat0 = self.merge(self._grid(raw0)[:bh], B, n_hi, p_hi)
        lat1 = self.merge(self._grid(raw1)[:bh], B, n_hi, p_hi)
        x0_f = self.merge(final[:bh], B, n_hi, p_hi)
        x1_f = self.merge(final[bh:bm], B, n_mid, p_mid)
        x2_f = final[bm:]
        g, _ = self.image_encoder(x2)
        g = self._grid(g)
        lat0 = self.upsample_latent0(lat0)
        lat1 = self.upsample_latent1(lat1)
        x0_f = self.upsample0(x0_f)
        x1_f = self.upsample1(x1_f)
        x2_f = self.upsample2(x2_f)
        g = self.upsample_lowres(g)
        g = self.fuse_lowres(torch.cat([x2_f, g], dim=1))
        return [lat0, lat1, x0_f, x1_f, g]


class MultiresConvDecoder(nn.Module):
    def __init__(self, dims_encoder, dim_decoder):
        super().__init__()
        convs = [nn.Identity()]
        for i in range(1, len(dims_encoder)):
            convs.append(nn.Conv2d(dims_encoder[i], dim_decoder, 3, 1, 1,
                                   bias=False))
        self.convs = nn.ModuleList(convs)
        self.fusions = nn.ModuleList(
            [FeatureFusionBlock2d(dim_decoder, deconv=(i != 0))
             for i in range(len(dims_encoder))])

    def forward(self, encodings):
        f = self.convs[-1](encodings[-1])
        lowres = f
        f = self.fusions[-1](f)
        for i in range(len(encodings) - 2, -1, -1):
            f = self.fusions[i](f, self.convs[i](encodings[i]))
        return f, lowres


class FOVNetwork(nn.Module):
    def __init__(self, num_features, fov_encoder):
        super().__init__()
        C = fov_encoder.pos_embed.shape[-1]
        self.encoder = nn.Sequential(fov_encoder,
                                     nn.Linear(C, num_features // 2))
        self.downsample = nn.Sequential(
            nn.Conv2d(num_features, num_features // 2, 3, stride=2,
                      padding=1),
            nn.ReLU(True))
        self.head = nn.Sequential(
            nn.Conv2d(num_features // 2, num_features // 4, 3, stride=2,
                      padding=1),
            nn.ReLU(True),
            nn.Conv2d(num_features // 4, num_features // 8, 3, stride=2,
                      padding=1),
            nn.ReLU(True),
            nn.Conv2d(num_features // 8, 1, 6, stride=1, padding=0))

    def forward(self, x, lowres_feature):
        x = F.interpolate(x, scale_factor=0.25, mode="bilinear",
                          align_corners=False)
        vit = self.encoder[0]
        tokens, _ = vit(x)
        tokens = self.encoder[1](tokens)
        x = tokens[:, 1:].permute(0, 2, 1)
        lr = self.downsample(lowres_feature)
        x = x.reshape_as(lr) + lr
        x = self.head[:-1](x)
        if x.shape[-1] != 6:
            # apple's 6x6 VALID conv assumes img_size 384; smaller tile
            # configs resize to its receptive field (mirrors the flax net)
            x = F.interpolate(x, size=(6, 6), mode="bilinear",
                              align_corners=False)
        return self.head[-1](x)


class DepthProTorch(nn.Module):
    """Tiny-config DepthPro (embed 64, depth 2, tile 128 -> input 512)."""

    def __init__(self, embed_dim=64, depth=2, num_heads=2, tile=128):
        super().__init__()
        grid = tile // 16
        dims = (embed_dim // 4, embed_dim // 2, embed_dim, embed_dim)
        df = embed_dim // 4
        self.encoder = DepthProEncoder(
            dims, Vit16(embed_dim, depth, num_heads, grid),
            Vit16(embed_dim, depth, num_heads, grid),
            hook_block_ids=(0, depth - 1), decoder_features=df)
        self.decoder = MultiresConvDecoder([df] + list(dims), df)
        self.head = nn.Sequential(
            nn.Conv2d(df, df // 2, 3, 1, 1),
            nn.ConvTranspose2d(df // 2, df // 2, 2, stride=2, bias=True),
            nn.Conv2d(df // 2, 32, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(32, 1, 1),
            nn.ReLU())
        self.fov = FOVNetwork(df, Vit16(embed_dim, depth, num_heads, grid))

    def forward(self, x):
        encodings = self.encoder(x)
        features, lowres = self.decoder(encodings)
        cid = self.head(features)
        fov_deg = self.fov(x, lowres.detach()).reshape(x.shape[0])
        return cid, fov_deg
