"""Color space conversion (reference: nunif/modules/color.py).

BT.601 RGB<->YCbCr on [0,1]-ranged float arrays, channel-last.
"""
import jax.numpy as jnp

# BT.601 full-range
_RGB2Y = jnp.array([0.299, 0.587, 0.114])
_RGB2CB = jnp.array([-0.168736, -0.331264, 0.5])
_RGB2CR = jnp.array([0.5, -0.418688, -0.081312])


def rgb_to_y(x):
    """(..., 3) RGB -> (..., 1) luminance."""
    return jnp.sum(x * _RGB2Y, axis=-1, keepdims=True)


def rgb_to_ycbcr(x):
    y = jnp.sum(x * _RGB2Y, axis=-1, keepdims=True)
    cb = jnp.sum(x * _RGB2CB, axis=-1, keepdims=True) + 0.5
    cr = jnp.sum(x * _RGB2CR, axis=-1, keepdims=True) + 0.5
    return jnp.concatenate([y, cb, cr], axis=-1)


def ycbcr_to_rgb(x):
    y = x[..., 0:1]
    cb = x[..., 1:2] - 0.5
    cr = x[..., 2:3] - 0.5
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.concatenate([r, g, b], axis=-1)
