"""MiDaS DPT-BEiT-384 core (flax, NHWC) — the relative-depth backbone of
ZoeDepth.

Architecture parity target: the MiDaS "DPT_BEiT_L_384" model the reference
consumes via torch.hub ("nagadomi/MiDaS_iw3", see
/root/reference/iw3/zoedepth_model.py:240): BEiT ViT with per-block
relative-position bias (q/v-only biases, LayerScale gammas), DPT readout
projection + 4-level resize pyramid, RefineNet fusion, and the MiDaS
relative-depth output head.  The ZoeDepth metric head taps the bottleneck
and refinement features, so ``__call__`` returns them all.

TPU-first: the relative-position bias is materialized per (gh, gw) bucket
at trace time (bilinear resize of the pretrained 2D table) and folded into
the attention logits — static shapes, one compiled program per bucket.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


BEIT_CONFIGS = {
    # pretrained @ 384 with patch 16 => 24x24 grid
    "beit_l_384": dict(embed_dim=1024, depth=24, num_heads=16,
                       pretrained_grid=24, hooks=(5, 11, 17, 23),
                       neck_channels=(256, 512, 1024, 1024)),
    "beit_b_384": dict(embed_dim=768, depth=12, num_heads=12,
                       pretrained_grid=24, hooks=(2, 5, 8, 11),
                       neck_channels=(96, 192, 384, 768)),
}


def _relative_position_index(gh: int, gw: int) -> np.ndarray:
    """BEiT relative position index incl. the 3 cls-token specials.

    Returns (1+gh*gw, 1+gh*gw) int32 indexing into a flattened table of
    size (2*gh-1)*(2*gw-1) + 3.
    """
    coords = np.stack(np.meshgrid(np.arange(gh), np.arange(gw),
                                  indexing="ij"))          # (2, gh, gw)
    flat = coords.reshape(2, -1)                            # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += gh - 1
    rel[:, :, 1] += gw - 1
    rel[:, :, 0] *= 2 * gw - 1
    n = gh * gw
    num_rel = (2 * gh - 1) * (2 * gw - 1)
    index = np.zeros((n + 1, n + 1), np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel        # cls -> all
    index[0:, 0] = num_rel + 1    # all -> cls
    index[0, 0] = num_rel + 2     # cls -> cls
    return index.astype(np.int32)


class BeitAttention(nn.Module):
    dim: int
    num_heads: int
    pretrained_grid: int

    @nn.compact
    def __call__(self, x, grid_hw):
        B, N, C = x.shape
        gh, gw = grid_hw
        hd = self.dim // self.num_heads
        # BEiT: q and v have biases, k does not
        w_qkv = self.param("qkv_kernel", nn.initializers.lecun_normal(),
                           (C, 3 * self.dim))
        q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
        qkv = x @ w_qkv.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q + q_bias.astype(x.dtype)
        v = v + v_bias.astype(x.dtype)
        q = q.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)

        # relative position bias, resized from the pretrained grid
        pg = self.pretrained_grid
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            ((2 * pg - 1) * (2 * pg - 1) + 3, self.num_heads))
        if (gh, gw) != (pg, pg):
            grid_part = table[:-3].reshape(2 * pg - 1, 2 * pg - 1,
                                           self.num_heads)
            grid_part = jax.image.resize(
                grid_part.astype(jnp.float32),
                (2 * gh - 1, 2 * gw - 1, self.num_heads), method="bilinear")
            table_r = jnp.concatenate(
                [grid_part.reshape(-1, self.num_heads),
                 table[-3:].astype(jnp.float32)], axis=0)
        else:
            table_r = table.astype(jnp.float32)
        index = jnp.asarray(_relative_position_index(gh, gw))
        bias = table_r[index.reshape(-1)].reshape(N, N, self.num_heads)
        bias = bias.transpose(2, 0, 1)[None]   # (1, H, N, N)

        scores = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                            preferred_element_type=jnp.float32) + bias
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.dim)
        return nn.Dense(self.dim, dtype=x.dtype, name="proj")(out)


class BeitBlock(nn.Module):
    dim: int
    num_heads: int
    pretrained_grid: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, grid_hw):
        g1 = self.param("gamma_1", nn.initializers.constant(0.1), (self.dim,))
        g2 = self.param("gamma_2", nn.initializers.constant(0.1), (self.dim,))
        h = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm1")(x)
        h = BeitAttention(self.dim, self.num_heads, self.pretrained_grid,
                          name="attn")(h, grid_hw)
        x = x + g1.astype(x.dtype) * h
        h = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=x.dtype,
                     name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=x.dtype, name="mlp_fc2")(h)
        return x + g2.astype(x.dtype) * h


class BeitBackbone(nn.Module):
    """Returns hooked token maps (with cls) for the DPT neck."""
    embed_dim: int
    depth: int
    num_heads: int
    pretrained_grid: int
    hooks: Sequence[int]
    patch_size: int = 16

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        patches = nn.Conv(self.embed_dim,
                          (self.patch_size, self.patch_size),
                          strides=(self.patch_size, self.patch_size),
                          padding="VALID", dtype=x.dtype,
                          name="patch_embed")(x)
        tokens = patches.reshape(B, gh * gw, self.embed_dim)
        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(x.dtype),
                              (B, 1, self.embed_dim)), tokens], axis=1)
        outputs = {}
        hooks = set(self.hooks)
        for i in range(self.depth):
            tokens = BeitBlock(self.embed_dim, self.num_heads,
                               self.pretrained_grid,
                               name=f"blocks_{i}")(tokens, (gh, gw))
            if i in hooks:
                outputs[i] = tokens
        return [outputs[i] for i in self.hooks], (gh, gw)


class _ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=x.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=x.dtype,
                    name="conv2")(h)
        return x + h


class _FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, res=None, out_hw=None):
        from ...modules.resize import resize
        if res is not None:
            x = x + _ResidualConvUnit(self.features, name="resConfUnit1")(res)
        x = _ResidualConvUnit(self.features, name="resConfUnit2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        x = resize(x, *out_hw, mode="bilinear", antialias=False,
                   align_corners=True)
        return nn.Conv(self.features, (1, 1), padding="VALID", dtype=x.dtype,
                       name="out_conv")(x)


class MidasCore(nn.Module):
    """BEiT backbone + DPT neck.  x: (B,H,W,3) normalized (mean/std 0.5).

    Returns (rel_depth (B,H,W), features) where features =
    [out_conv32 (H/2), l4_rn (H/32), r4 (H/16), r3 (H/8), r2 (H/4), r1 (H/2)]
    — the hook set ZoeDepth's metric head consumes (btlnck + attractor
    levels + conditional-log-binomial input).
    """
    backbone: str = "beit_l_384"
    features: int = 256

    @nn.compact
    def __call__(self, x):
        cfg = dict(BEIT_CONFIGS[self.backbone])
        neck_channels = cfg.pop("neck_channels")
        feats, (gh, gw) = BeitBackbone(**cfg, name="pretrained")(x)
        B = x.shape[0]

        levels = []
        for i, tokens in enumerate(feats):
            cls_t, patch_t = tokens[:, :1], tokens[:, 1:]
            # DPT "project" readout: concat cls onto every token
            t = jnp.concatenate(
                [patch_t,
                 jnp.broadcast_to(cls_t, patch_t.shape)], axis=-1)
            t = nn.Dense(tokens.shape[-1], dtype=x.dtype,
                         name=f"readout_{i}")(t)
            t = nn.gelu(t, approximate=False)
            t = t.reshape(B, gh, gw, -1)
            t = nn.Conv(neck_channels[i], (1, 1), padding="VALID",
                        dtype=x.dtype, name=f"projects_{i}")(t)
            if i == 0:
                t = nn.ConvTranspose(neck_channels[i], (4, 4), strides=(4, 4),
                                     padding="VALID", dtype=x.dtype,
                                     name="resize_0", transpose_kernel=True)(t)
            elif i == 1:
                t = nn.ConvTranspose(neck_channels[i], (2, 2), strides=(2, 2),
                                     padding="VALID", dtype=x.dtype,
                                     name="resize_1", transpose_kernel=True)(t)
            elif i == 3:
                t = nn.Conv(neck_channels[i], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=x.dtype,
                            name="resize_3")(t)
            levels.append(t)

        rn = [nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                      dtype=x.dtype, name=f"layer{i + 1}_rn")(levels[i])
              for i in range(4)]

        r4 = _FeatureFusionBlock(self.features, name="refinenet4")(
            rn[3], out_hw=rn[2].shape[1:3])
        r3 = _FeatureFusionBlock(self.features, name="refinenet3")(
            r4, rn[2], out_hw=rn[1].shape[1:3])
        r2 = _FeatureFusionBlock(self.features, name="refinenet2")(
            r3, rn[1], out_hw=rn[0].shape[1:3])
        r1 = _FeatureFusionBlock(self.features, name="refinenet1")(r2, rn[0])

        # MiDaS output head; out_conv32 is the 32-channel tap ZoeDepth uses
        h = nn.Conv(self.features // 2, (3, 3), padding="SAME",
                    dtype=r1.dtype, name="output_conv1")(r1)
        from ...modules.resize import resize
        h = resize(h, x.shape[1], x.shape[2], mode="bilinear",
                   antialias=False, align_corners=True)
        out32 = nn.Conv(32, (3, 3), padding="SAME", dtype=h.dtype,
                        name="output_conv2_0")(h)
        out32 = nn.relu(out32)
        rel = nn.Conv(1, (1, 1), padding="VALID", dtype=out32.dtype,
                      name="output_conv2_2")(out32)
        rel = nn.relu(rel)[..., 0]   # (B, H, W)
        return rel, [out32, rn[3], r4, r3, r2, r1]
