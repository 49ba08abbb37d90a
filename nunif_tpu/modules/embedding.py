"""Soft embedding / positional seeding (flax).

Behavioral parity target: reference nunif/modules/embedding.py —
SoftEmbedding: sigmoid-gated weighted sum over a learned value bank;
PositionalSeeding: per-subpixel embeddings pixel-shuffled into a seed map.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .permute import pixel_shuffle


class SoftEmbedding(nn.Module):
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        # x: (B, in_channels)
        C = self.out_channels
        k = nn.Dense(C, name="k_0")(x)
        k = nn.relu(k)
        k = nn.Dense(C, name="k_2")(k)
        v = self.param("v", nn.initializers.normal(C ** -0.5), (C, C))
        w = nn.sigmoid(k) * (C ** -0.5)        # (B, C)
        out = (v[None] * w[:, :, None]).sum(axis=1)  # match ref sum(dim=2) on (B,C,C)
        return nn.Dense(C, name="proj")(out)


class PositionalSeeding(nn.Module):
    in_channels: int
    out_channels: int
    upscale_factor: int

    @nn.compact
    def __call__(self, x):
        # x: (B, in_channels) -> (B, s, s, out_channels)
        assert x.ndim == 2
        s = self.upscale_factor
        embeds = [SoftEmbedding(self.in_channels, self.out_channels,
                                name=f"embeds_{i}")(x)
                  for i in range(s * s)]
        z = jnp.concatenate(embeds, axis=1)[:, None, None, :]  # (B,1,1,C*s*s)
        return pixel_shuffle(z, s)
