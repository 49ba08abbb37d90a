"""Film-grain style RGB noise (jax, NHWC).

Behavioral parity target: reference nunif/utils/rgb_noise.py —
rgb_noise_like (level-2 adds half-res correlated noise) and
apply_rgb_noise (gamma-space luminance-correlated grain with light
decay).  Pure functions of a PRNG key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_noise_like(key, base, level=2):
    """base: (..., H, W, C) NHWC."""
    assert level in {1, 2}
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, base.shape, base.dtype)
    if level == 2:
        H, W = base.shape[-3], base.shape[-2]
        small = jax.random.normal(
            k2, base.shape[:-3] + (H // 2, W // 2, base.shape[-1]),
            base.dtype)
        up = jnp.repeat(jnp.repeat(small, 2, axis=-3), 2, axis=-2)
        up = up[..., :H, :W, :]
        noise = noise * 0.5 + up * 0.5
    return noise


def apply_rgb_noise(rgb, noise, strength=0.2, gamma=2.2,
                    light_decay=True, light_decay_strength=0.8):
    assert 0 <= light_decay_strength <= 1
    out = rgb ** gamma
    correlated = noise * out
    if light_decay:
        decay = ((1.0 - out) * light_decay_strength
                 + (1.0 - light_decay_strength)) ** gamma
    else:
        decay = 1.0
    out = out + correlated * (decay * strength)
    return jnp.clip(out, 0.0, 1.0) ** (1.0 / gamma)
