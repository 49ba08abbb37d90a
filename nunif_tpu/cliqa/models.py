"""cliqa predictor CNNs (NHWC flax).

Behavioral parity target: reference cliqa/models/jpeg_quality.py,
grain_noise_level.py, scale_factor.py — small conv trunks with residual
blocks (nunif/modules/res_block.py ResBlockBNReLU) and max/avg-pooled
regression heads.

Norm modes:
  * ``norm="gn"`` (default) — GroupNorm(32) for training from scratch;
    keeps the model a pure function of params (no running stats).
  * ``norm="none"`` — no normalization; used for reference checkpoints,
    whose eval-mode BatchNorm folds into the conv weights+biases at
    conversion (torch_convert.convert_cliqa).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..models import Model, register_model
from ..modules.pad import replication_pad2d


class _Norm(nn.Module):
    mode: str  # "gn" | "none"

    @nn.compact
    def __call__(self, x):
        if self.mode == "none":
            return x
        return nn.GroupNorm(num_groups=32, dtype=jnp.float32)(
            x.astype(jnp.float32)).astype(x.dtype)


class ResBlockCliqa(nn.Module):
    """reference nunif/modules/res_block.py:11-77 (BN flavor, identity
    shortcut): relu(bn(conv(bn-relu-conv(x))) + x)."""
    channels: int
    norm: str = "gn"

    @nn.compact
    def __call__(self, x):
        bias = self.norm == "none"
        h = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=bias,
                    dtype=x.dtype, name="conv1")(x)
        h = nn.relu(_Norm(self.norm, name="gn1")(h))
        h = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=bias,
                    dtype=x.dtype, name="conv2")(h)
        h = _Norm(self.norm, name="gn2")(h)
        return nn.relu(h + x)


class _Trunk(nn.Module):
    in_channels: int = 3
    norm: str = "gn"

    @nn.compact
    def __call__(self, x):
        bias = self.norm == "none"
        x = replication_pad2d(x, (1, 1, 1, 1))
        x = nn.Conv(64, (3, 3), padding="VALID", use_bias=bias,
                    dtype=x.dtype, name="conv0")(x)
        x = nn.relu(_Norm(self.norm, name="gn0")(x))
        x = nn.Conv(128, (3, 3), padding="SAME", use_bias=bias,
                    dtype=x.dtype, name="conv1")(x)
        x = nn.relu(_Norm(self.norm, name="gn1")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ResBlockCliqa(128, self.norm, name="res1")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ResBlockCliqa(128, self.norm, name="res2")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class _Head(nn.Module):
    pool: str  # "max" | "avg"
    norm: str = "gn"

    @nn.compact
    def __call__(self, x):
        bias = self.norm == "none"
        x = nn.Conv(256, (3, 3), padding="SAME", use_bias=bias,
                    dtype=x.dtype, name="conv")(x)
        x = nn.relu(_Norm(self.norm, name="gn")(x))
        if self.pool == "max":
            x = jnp.max(x, axis=(1, 2), keepdims=True)
        else:
            x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = nn.Conv(1, (1, 1), padding="VALID", dtype=x.dtype, name="out")(x)
        return x.reshape(x.shape[0], -1)


@register_model
class JPEGQuality(Model):
    """quality (0-100) + chroma-subsampling logit
    (reference cliqa/models/jpeg_quality.py:8-75)."""
    model_name = "cliqa.jpeg_quality"
    norm: str = "gn"

    @staticmethod
    def preprocess(x):
        r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
        y = r * 0.299 + g * 0.587 + b * 0.114
        cb = (b - y) * 0.564 + 0.5
        cr = (r - y) * 0.713 + 0.5
        return jnp.concatenate([y, cb, cr, r, g, b], axis=-1) * 2.0 - 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.preprocess(x)
        h = _Trunk(6, self.norm, name="features")(x)
        quality = _Head("max", self.norm, name="quality_output")(h)
        subsampling = _Head("avg", self.norm, name="subsampling_output")(h)
        return quality, subsampling


@register_model
class GrainNoiseLevel(Model):
    """noise level (0-50 = 50-PSNR) (reference grain_noise_level.py)."""
    model_name = "cliqa.grain_noise_level"
    norm: str = "gn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _Trunk(3, self.norm, name="features")(x * 2.0 - 1.0)
        return _Head("max", self.norm, name="noise_level_output")(h)


@register_model
class ScaleFactor(Model):
    """pre-upscale factor (1.0-2.0) (reference scale_factor.py)."""
    model_name = "cliqa.scale_factor"
    norm: str = "gn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _Trunk(3, self.norm, name="features")(x * 2.0 - 1.0)
        return _Head("max", self.norm, name="scale_factor_output")(h)
