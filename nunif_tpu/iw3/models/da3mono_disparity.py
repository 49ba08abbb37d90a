"""iw3.da3mono_disparity — learned depth->disparity conversion for DA3.

Behavioral parity target: reference iw3/models/da3mono_disparity.py:13-80 —
64 sorted-quantile features of the depth map -> MLP -> (shift, sky_shift);
sky pixels (== per-image max depth) get sky_shift added, then
disparity = 1 / (depth + shift).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model

FEAT_DIM = 64


def extract_features(x):
    """x (B,H,W,1) -> (B, FEAT_DIM) sorted quantile features
    (reference :53-72: min, 62 interior quantiles, max)."""
    B = x.shape[0]
    flat = jnp.sort(x.reshape(B, -1), axis=-1)
    n = flat.shape[-1]
    idx = jnp.linspace(1, n - 2, FEAT_DIM - 2).astype(jnp.int32)
    quantiles = flat[:, idx]
    return jnp.concatenate([flat[:, :1], quantiles, flat[:, -1:]], axis=-1)


@register_model
class DA3MonoDisparity(I2IBaseModel):
    model_name = "iw3.da3mono_disparity"
    i2i_scale = 1
    i2i_offset = 0
    i2i_blend_size = 0

    @nn.compact
    def __call__(self, depth, train: bool = False):
        # depth: (B, H, W, 1) positive distance
        feats = extract_features(depth.astype(jnp.float32))
        h = nn.Dense(128, name="mlp_0")(feats)
        h = nn.silu(h)
        h = nn.Dense(128, name="mlp_2")(h)
        h = nn.silu(h)
        h = nn.relu(nn.Dense(2, name="mlp_4")(h))
        shift = h[:, 0].reshape(-1, 1, 1, 1)
        sky_shift = h[:, 1].reshape(-1, 1, 1, 1)
        max_depth = jnp.max(depth, axis=(1, 2, 3), keepdims=True)
        sky_mask = depth == max_depth
        depth = jnp.where(sky_mask, depth + sky_shift, depth)
        return 1.0 / (depth + shift)
