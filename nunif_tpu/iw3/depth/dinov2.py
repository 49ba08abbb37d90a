"""DINOv2 vision transformer encoder (flax, NHWC input).

Architecture parity target: the DINOv2 ViT used by Depth-Anything v1/v2
(reference consumes it via torch.hub "nagadomi/Depth-Anything_iw3",
see /root/reference/iw3/depth_anything_model.py:196-226): patch 14 conv
embed, cls token, learned pos embed with bicubic grid interpolation,
pre-norm blocks with LayerScale, GELU MLP, final LayerNorm.

TPU-first: tokens stay (B, N, C) with C on the lane axis; attention is a
single fused einsum chain per block (XLA maps QK^T / PV onto the MXU);
bfloat16 compute with fp32 softmax.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.sdpa import sdpa


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=x.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,N,H,d)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        # shared SDPA entry: Pallas flash kernel by default on TPU (wins
        # end-to-end at production batch; see ops/sdpa.py), XLA lowering
        # via NUNIF_TPU_FLASH_SDPA=0
        out = sdpa(q, k, v, scale=head_dim ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=x.dtype, name="proj")(out)


class LayerScale(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(1e-5), (self.dim,))
        return x * gamma.astype(x.dtype)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, name="attn")(h)
        x = x + LayerScale(self.dim, name="ls1")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        h = nn.Dense(hidden, dtype=x.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=x.dtype, name="mlp_fc2")(h)
        x = x + LayerScale(self.dim, name="ls2")(h)
        return x


class DinoVisionTransformer(nn.Module):
    """Returns the intermediate patch-token maps requested.

    x: (B, H, W, 3) with H, W multiples of patch_size.
    """
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    pos_embed_size: int = 37  # 518/14 grid of the pretrained pos embed

    @nn.compact
    def __call__(self, x, out_indices: Sequence[int] = (),
                 raw_indices: Sequence[int] = ()):
        """out_indices: block outputs with the final norm applied
        (DINOv2 get_intermediate_layers(norm=True), Depth-Anything).
        raw_indices: block outputs WITHOUT the final norm (forward-hook
        captures, DepthPro latents) — appended after the normed feats."""
        B, H, W, _ = x.shape
        ph, pw = H // self.patch_size, W // self.patch_size
        n = ph * pw

        patches = nn.Conv(self.embed_dim,
                          (self.patch_size, self.patch_size),
                          strides=(self.patch_size, self.patch_size),
                          padding="VALID", dtype=x.dtype,
                          name="patch_embed")(x)
        tokens = patches.reshape(B, n, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + self.pos_embed_size ** 2, self.embed_dim))

        # interpolate the grid part of the pos embed to (ph, pw), bicubic —
        # matches DINOv2.interpolate_pos_encoding
        cls_pos = pos_embed[:, :1]
        grid_pos = pos_embed[:, 1:].reshape(
            1, self.pos_embed_size, self.pos_embed_size, self.embed_dim)
        if (ph, pw) != (self.pos_embed_size, self.pos_embed_size):
            grid_pos = jax.image.resize(
                grid_pos.astype(jnp.float32),
                (1, ph, pw, self.embed_dim), method="bicubic")
        grid_pos = grid_pos.reshape(1, n, self.embed_dim)

        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(x.dtype), (B, 1, self.embed_dim)),
             tokens], axis=1)
        tokens = tokens + jnp.concatenate([cls_pos, grid_pos], axis=1).astype(x.dtype)

        out_set = set(out_indices) | set(raw_indices)
        outputs = {}
        for i in range(self.depth):
            tokens = Block(self.embed_dim, self.num_heads, name=f"blocks_{i}")(tokens)
            if i in out_set:
                outputs[i] = tokens

        # DINOv2 applies the final norm to intermediate outputs
        # (get_intermediate_layers(..., norm=True), used by Depth-Anything)
        norm = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm")
        feats = ([norm(outputs[i])[:, 1:] for i in out_indices]
                 + [outputs[i][:, 1:] for i in raw_indices])  # drop cls
        return feats, (ph, pw)


VIT_CONFIGS = {
    "vitt": dict(embed_dim=64, depth=2, num_heads=2),  # tests only
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
}
INTERMEDIATE_LAYER_IDX = {
    "vits": [2, 5, 8, 11],
    "vitb": [2, 5, 8, 11],
    "vitl": [4, 11, 17, 23],
}
