"""imagenet classifier archs (NHWC flax).

Behavioral parity target: reference imagenet/models/torchvision_models.py
(torchvision vgg11_bn and swin_t wrappers with custom heads).  GroupNorm
replaces BatchNorm (pure function of params); swin uses the framework's
fused window attention blocks.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..models import SoftmaxBaseModel, register_model
from ..modules.attention import SwinTransformerBlocks


@register_model
class VGG11(SoftmaxBaseModel):
    """vgg11-bn-style classifier (reference imagenet vgg11_bn wrapper)."""
    model_name = "imagenet.vgg11"
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (c, n) in enumerate([(64, 1), (128, 1), (256, 2), (512, 2),
                                    (512, 2)]):
            for j in range(n):
                x = nn.Conv(c, (3, 3), padding="SAME", use_bias=False,
                            dtype=x.dtype, name=f"conv{i}_{j}")(x)
                x = nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                                 name=f"gn{i}_{j}")(
                    x.astype(jnp.float32)).astype(x.dtype)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(4096, dtype=x.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes, dtype=x.dtype, name="fc2")(x)
        return x


@register_model
class SwinT(SoftmaxBaseModel):
    """swin-t-style classifier (reference imagenet swin_t wrapper)."""
    model_name = "imagenet.swin_t"
    num_classes: int = 1000
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    heads: tuple = (3, 6, 12, 24)
    window_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        # patch embed 4x4
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
                    dtype=x.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(dtype=x.dtype, name="patch_norm")(x)
        dim = self.embed_dim
        for i, (depth, heads) in enumerate(zip(self.depths, self.heads)):
            x = SwinTransformerBlocks(dim, heads, depth,
                                      window_size=self.window_size,
                                      norm="layernorm",
                                      name=f"stage{i}")(x)
            if i < len(self.depths) - 1:
                # patch merging: 2x2 -> linear
                B, H, W, C = x.shape
                x = x.reshape(B, H // 2, 2, W // 2, 2, C)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    B, H // 2, W // 2, 4 * C)
                x = nn.LayerNorm(dtype=x.dtype, name=f"merge_norm{i}")(x)
                x = nn.Dense(2 * C, use_bias=False, dtype=x.dtype,
                             name=f"merge{i}")(x)
                dim *= 2
        x = nn.LayerNorm(dtype=x.dtype, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=x.dtype, name="head")(x)
