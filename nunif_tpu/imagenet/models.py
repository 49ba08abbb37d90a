"""imagenet classifier archs (NHWC flax).

Behavioral parity target: reference imagenet/models/torchvision_models.py
(torchvision vgg11_bn and swin_t wrappers).  VGG11 follows the EXACT
torchvision vgg11_bn topology so torchvision-pretrained weights convert
losslessly (models/torch_convert.convert_vgg11_bn) — the model's main role
is the perceptual-loss / feature-extractor backbone, which requires the
released IMAGENET1K weights to load bit-true.  Swin uses the framework's
fused window attention blocks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models import SoftmaxBaseModel, register_model
from ..modules.attention import SwinTransformerBlocks


class FrozenBatchNorm(nn.Module):
    """BatchNorm with running statistics stored as PARAMS.

    Eval (default): y = (x - mean) / sqrt(var + eps) * scale + bias — the
    exact torch eval-mode BN, so torchvision running stats convert 1:1.
    Train (use_batch_stats=True): normalizes by the current batch's
    statistics (standard BN train behavior) as a pure function; running
    stats are NOT updated inside the jitted step — refresh them after
    training with imagenet.training.calibrate_bn (a forward sweep), the
    functional equivalent of torch's momentum accumulation.
    """
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_batch_stats: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        if use_batch_stats:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


# torchvision vgg cfg "A": (out_channels per conv, 'M' = maxpool)
_VGG11_CFG = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512,
              "M")


@register_model
class VGG11(SoftmaxBaseModel):
    """torchvision vgg11_bn topology (reference
    imagenet/models/torchvision_models.py:10 wraps it unmodified):
    cfg-A conv/BN/ReLU features -> 7x7 avgpool -> 3-layer classifier."""
    model_name = "imagenet.vgg11"
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = 0
        for c in _VGG11_CFG:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(c, (3, 3), padding="SAME", dtype=x.dtype,
                        name=f"conv{k}")(x)
            x = FrozenBatchNorm(name=f"bn{k}")(x, use_batch_stats=train)
            x = nn.relu(x)
            k += 1
        # AdaptiveAvgPool2d((7,7)): identity at the canonical 224 input;
        # average-pool any larger multiple-of-7 extent down to 7x7
        h, w = x.shape[1], x.shape[2]
        if (h, w) != (7, 7):
            assert h % 7 == 0 and w % 7 == 0, (h, w)
            x = nn.avg_pool(x, (h // 7, w // 7), strides=(h // 7, w // 7))
        # torch flatten is CHW-major: transpose so converted classifier
        # weights (trained on C*7*7 order) line up
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, dtype=x.dtype, name="fc0")(x))
        x = nn.relu(nn.Dense(4096, dtype=x.dtype, name="fc1")(x))
        return nn.Dense(self.num_classes, dtype=x.dtype, name="fc2")(x)


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
